"""Plotting suite (counterpart of reference utils/plots.py + the curve
plotters in metrics.py:272-339): PR/F1/P/R curves with CSV dumps (the
SOMI ablation workflow compares those CSVs, utils/F1PR.py), label
stats, train-batch mosaics, results.png, feature-map visualization."""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _dump_csv(path: Path, px: np.ndarray, ys: np.ndarray, names) -> None:
    """Curve CSV like the reference (metrics.py:292-295): one row per class."""
    import pandas as pd

    rows = {f"{n}": y for n, y in zip(names or range(len(ys)), ys)}
    pd.DataFrame({"x": px, **rows}).to_csv(path, index=False)


def plot_pr_curve(px, py, ap, save_path="PR_curve.png", names=()):
    """PR curves + CSV (reference: metrics.py:272-300)."""
    save_path = Path(save_path)
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.stack(py, 0) if len(py) else np.zeros((0, len(px)))
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            label = list(names.values())[i] if isinstance(names, dict) else names[i]
            ax.plot(px, y, linewidth=1, label=f"{label} {ap[i, 0]:.3f}")
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    if len(py):
        ax.plot(px, py.mean(0), linewidth=3, color="blue", label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(save_path, dpi=250)
    plt.close(fig)
    if len(py):
        _dump_csv(save_path.with_suffix(".csv"), px, py, list(names.values()) if isinstance(names, dict) else names)


def plot_mc_curve(px, py, save_path="mc_curve.png", names=(), xlabel="Confidence", ylabel="Metric"):
    """Metric-confidence curves + CSV (reference: metrics.py:303-339)."""
    save_path = Path(save_path)
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.asarray(py)
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            label = list(names.values())[i] if isinstance(names, dict) else names[i]
            ax.plot(px, y, linewidth=1, label=label)
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    if len(py):
        y = py.mean(0)
        ax.plot(px, y, linewidth=3, color="blue", label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(save_path, dpi=250)
    plt.close(fig)
    if len(py):
        _dump_csv(save_path.with_suffix(".csv"), px, py, list(names.values()) if isinstance(names, dict) else names)


def plot_labels(labels: np.ndarray, names=(), save_dir="."):
    """Class histogram + box-geometry correlogram (reference: plots.py:297)."""
    save_dir = Path(save_dir)
    c = labels[:, 0]
    boxes = labels[:, 1:5]
    fig, axes = plt.subplots(2, 2, figsize=(10, 10), tight_layout=True)
    nc = int(c.max()) + 1 if len(c) else 1
    axes[0, 0].hist(c, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_xlabel("classes")
    axes[0, 1].scatter(boxes[:, 0], boxes[:, 1], s=2, alpha=0.3)
    axes[0, 1].set_xlabel("x")
    axes[0, 1].set_ylabel("y")
    axes[1, 0].scatter(boxes[:, 2], boxes[:, 3], s=2, alpha=0.3)
    axes[1, 0].set_xlabel("width")
    axes[1, 0].set_ylabel("height")
    axes[1, 1].hist2d(boxes[:, 2], boxes[:, 3], bins=50, cmap="Blues")
    axes[1, 1].set_xlabel("width")
    axes[1, 1].set_ylabel("height")
    fig.savefig(save_dir / "labels.png", dpi=200)
    plt.close(fig)


def plot_images(images: np.ndarray, targets: np.ndarray, paths=None, save_path="train_batch.jpg", names=(), max_imgs=16):
    """Train-batch mosaic with boxes (reference: plots.py:151). images
    (B,H,W,3) uint8/float; targets (B,M,5) padded [cls,xywhn]."""
    import cv2

    bs = min(len(images), max_imgs)
    ns = int(np.ceil(bs**0.5))
    h, w = images.shape[1:3]
    mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
    for i in range(bs):
        r, cidx = divmod(i, ns)
        im = images[i]
        if im.dtype != np.uint8:
            im = (im * 255).clip(0, 255).astype(np.uint8)
        tile = im.copy()
        labs = targets[i]
        labs = labs[labs[:, 0] >= 0]
        for cls, xc, yc, bw, bh in labs:
            x1, y1 = int((xc - bw / 2) * w), int((yc - bh / 2) * h)
            x2, y2 = int((xc + bw / 2) * w), int((yc + bh / 2) * h)
            cv2.rectangle(tile, (x1, y1), (x2, y2), (0, 200, 0), 1)
        mosaic[r * h : (r + 1) * h, cidx * w : (cidx + 1) * w] = tile
    cv2.imwrite(str(save_path), mosaic)


def plot_results(csv_path, save_path=None):
    """Loss/metric curves from results.csv (reference: plots.py:441)."""
    import pandas as pd

    csv_path = Path(csv_path)
    df = pd.read_csv(csv_path)
    cols = [c for c in df.columns if c != "epoch"]
    n = len(cols)
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 3), tight_layout=True)
    if n == 1:
        axes = [axes]
    x = df["epoch"] if "epoch" in df else np.arange(len(df))
    for ax, c in zip(np.ravel(axes), cols):
        ax.plot(x, df[c], marker=".")
        ax.set_title(c, fontsize=9)
    fig.savefig(save_path or csv_path.with_name("results.png"), dpi=200)
    plt.close(fig)


def feature_visualization(features, module_name: str, save_dir=".", n: int = 32):
    """Feature-map grid for one layer output (B,H,W,C) (reference:
    plots.py:466, hooked by --visualize)."""
    save_dir = Path(save_dir)
    f = np.asarray(features[0])  # first image
    c = min(f.shape[-1], n)
    ns = int(np.ceil(c**0.5))
    fig, axes = plt.subplots(ns, ns, figsize=(8, 8), tight_layout=True)
    for i, ax in enumerate(np.ravel(axes)):
        ax.axis("off")
        if i < c:
            ax.imshow(f[..., i], cmap="viridis")
    fig.savefig(save_dir / f"{module_name}_features.png", dpi=150)
    plt.close(fig)


def plot_evolve(evolve_csv, save_path=None):
    """Hyperparameter-evolution scatter (reference: plots.py:415)."""
    import pandas as pd

    evolve_csv = Path(evolve_csv)
    df = pd.read_csv(evolve_csv)
    df.columns = [c.strip() for c in df.columns]
    fit = df["fitness"].values
    keys = [c for c in df.columns if c != "fitness"]
    n = len(keys)
    ns = int(np.ceil(n**0.5))
    fig, axes = plt.subplots(ns, ns, figsize=(2.5 * ns, 2.5 * ns), tight_layout=True)
    for i, ax in enumerate(np.ravel(axes)):
        ax.axis("off")
        if i < n:
            ax.axis("on")
            ax.scatter(df[keys[i]], fit, c=fit, cmap="viridis", alpha=0.7, s=10)
            ax.set_title(keys[i], fontsize=8)
    fig.savefig(save_path or evolve_csv.with_name("evolve.png"), dpi=200)
    plt.close(fig)
