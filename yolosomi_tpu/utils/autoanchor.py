"""Autoanchor: BPR check + k-means / k-means++ anchor evolution.

Counterpart of the reference utils/autoanchor.py: the best-possible-recall
check (:25-65, threshold 0.98), scipy whitened k-means + 1000-generation
genetic refinement (:73-131 kmean_anchors), and the sklearn k-means++
variant (:134-215 kmeanPlus_anchors, selected by --kmean). Host-side
numpy; runs once before training.
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np

from yolosomi_tpu.utils.general import LOGGER


def _metric(k: np.ndarray, wh: np.ndarray):
    """Per-target best anchor ratio metric (reference: autoanchor.py:79-84)."""
    r = wh[:, None] / k[None]
    x = np.minimum(r, 1 / r).min(2)  # ratio metric
    best = x.max(1)
    return x, best


def anchor_fitness(k: np.ndarray, wh: np.ndarray, thr: float) -> float:
    """Mean best-ratio above threshold (reference: autoanchor.py:86-89)."""
    _, best = _metric(k, wh)
    return float((best * (best > thr)).mean())


def check_anchor_order(anchors_px: np.ndarray, strides) -> np.ndarray:
    """Ensure anchor areas ascend with stride (reference: autoanchor.py:16-23)."""
    a = anchors_px.prod(-1).mean(-1)
    da = a[-1] - a[0]
    ds = strides[-1] - strides[0]
    if np.sign(da) != np.sign(ds):
        LOGGER.info("autoanchor: reversing anchor order")
        anchors_px = anchors_px[::-1].copy()
    return anchors_px


def dataset_wh(dataset, imgsz: int) -> np.ndarray:
    """Collect augment-jittered label wh in pixels (reference:
    autoanchor.py:29-33)."""
    shapes = imgsz * dataset.shapes / dataset.shapes.max(1, keepdims=True)
    scale = np.random.uniform(0.9, 1.1, size=(shapes.shape[0], 1))
    wh = np.concatenate(
        [l[:, 3:5] * s * sh for s, sh, l in zip(scale, shapes, dataset.labels) if len(l)]
    )
    return wh


def kmean_anchors(wh: np.ndarray, n: int = 9, thr: float = 4.0, gen: int = 1000, verbose: bool = False):
    """scipy k-means + genetic evolution (reference: autoanchor.py:73-131)."""
    from scipy.cluster.vq import kmeans

    thr = 1 / thr
    i = (wh >= 2.0).any(1)
    wh = wh[i]
    s = wh.std(0)
    try:
        k, _ = kmeans(wh / s, n, iter=30)
        assert len(k) == n
        k *= s
    except Exception:
        k = np.sort(np.random.rand(n * 2)).reshape(n, 2) * wh.max(0)
    # sort by area BEFORE the GA: the reference runs `k = print_results(k)`
    # (which sorts) ahead of evolution (autoanchor.py:116-118), so the GA
    # mutation noise applies to area-ordered rows — required for seeded
    # trajectory parity with the reference (tests/test_reference_oracle.py)
    k = k[np.argsort(k.prod(1))]

    def fit(k):
        r = wh[:, None] / k[None]
        x = np.minimum(r, 1 / r).min(2)
        best = x.max(1)
        return ((best * (best > thr)).mean(), best)

    f, _ = fit(k)
    npr = np.random
    sh, mp, sigma = k.shape, 0.9, 0.1
    for _ in range(gen):
        v = np.ones(sh)
        while (v == 1).all():
            v = ((npr.random(sh) < mp) * random.random() * npr.randn(*sh) * sigma + 1).clip(0.3, 3.0)
        kg = (k.copy() * v).clip(min=2.0)
        fg, _ = fit(kg)
        if fg > f:
            f, k = fg, kg.copy()
    k = k[np.argsort(k.prod(1))]
    if verbose:
        LOGGER.info(f"autoanchor: kmeans fitness {f:.4f}")
    return k


def kmeanplus_anchors(wh: np.ndarray, n: int = 9, thr: float = 4.0):
    """sklearn k-means++ variant (reference: autoanchor.py:134-215,
    selected by --kmean)."""
    from sklearn.cluster import KMeans

    i = (wh >= 2.0).any(1)
    wh = wh[i]
    km = KMeans(n_clusters=n, init="k-means++", n_init=10, random_state=0).fit(wh)
    k = km.cluster_centers_.clip(min=2.0)
    return k[np.argsort(k.prod(1))]


def check_anchors(dataset, meta, thr: float = 4.0, imgsz: int = 640, kmean: bool = False) -> Optional[np.ndarray]:
    """BPR check; re-cluster when recall < 0.98 (reference: autoanchor.py:25-65).

    Returns new (nl, na*2) pixel anchors array to rebuild the model with,
    or None when current anchors pass.
    """
    wh = dataset_wh(dataset, imgsz)
    if len(wh) == 0:
        return None
    anchors = meta.anchors_px.reshape(-1, 2)
    x, best = _metric(anchors, wh)
    aat = float((x > 1 / thr).sum(1).mean())  # anchors above threshold
    bpr = float((best > 1 / thr).mean())  # best possible recall
    LOGGER.info(f"autoanchor: {aat:.2f} anchors/target, {bpr:.3f} best possible recall (thr={thr})")
    if bpr > 0.98:
        LOGGER.info("autoanchor: current anchors are a good fit")
        return None
    n = meta.na * meta.nl
    LOGGER.info(f"autoanchor: recomputing {n} anchors ({'kmeans++' if kmean else 'kmeans+GA'})...")
    try:
        k = kmeanplus_anchors(wh, n=n, thr=thr) if kmean else kmean_anchors(wh, n=n, thr=thr)
    except Exception as e:
        LOGGER.warning(f"autoanchor failed: {e}")
        return None
    new_bpr = float(_metric(k, wh)[1].__gt__(1 / thr).mean())
    if new_bpr <= bpr:
        LOGGER.info("autoanchor: original anchors better, keeping them")
        return None
    new = k.reshape(meta.nl, meta.na, 2)
    new = check_anchor_order(new, meta.strides)
    LOGGER.info(f"autoanchor: new anchors (bpr {new_bpr:.3f}):\n{new.round(1).reshape(meta.nl, -1)}")
    return new.reshape(meta.nl, -1)
