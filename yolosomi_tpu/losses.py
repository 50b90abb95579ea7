"""YOLOv5-family training loss, fully vectorized and jit-compatible.

TPU-native re-design of the reference ComputeLoss/build_targets
(/root/reference/utils/loss.py:112-262): the reference builds ragged
per-level index lists in Python; here target assignment is a fixed-shape
masked computation so the whole train step compiles once:

- targets arrive as a padded (B, M, 5) array of per-image rows
  [cls, x, y, w, h] (normalized xywh), padding rows marked cls = -1 —
  replacing the ragged (n, 6) collate tensor (datasets.py:675). The
  per-image layout keeps every gather/scatter local to the image, so under
  pjit data parallelism the whole loss shards on the batch axis with zero
  communication (the vmap axis == the mesh 'data' axis).
- the 5-offset neighbor expansion and anchor-ratio filter
  (loss.py:210-262) become boolean masks over a dense (5, na, M)
  candidate lattice.
- the IoU-sorted objectness scatter (loss.py:173-178 sorts ascending so
  the highest IoU wins duplicate cells) becomes a scatter-max — same
  fixed point, no sort.

Options mirrored from the reference: label smoothing (loss.py:123),
FocalLoss (loss.py:35-60,125), SlideLoss (loss.py:378-402), NWD blending
(loss.py:162-169), per-level obj balance (loss.py:135), and the repulsion
terms (utils/RepulsionLoss.py — dead code in the reference, wired here
behind `rep=True` as BASELINE config 4 requires).

Known reference defect handled: with nwdloss>0 the reference passes
xywh boxes to NWD functions that parse xyxy (loss.py:164-166 vs
metrics.py:341); we convert to xyxy first (documented deviation).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolosomi_tpu.utils.boxes import xywh2xyxy
from yolosomi_tpu.utils.iou import bbox_iou, wasserstein, wasserstein_loss


def smooth_bce(eps: float = 0.1) -> Tuple[float, float]:
    """Positive/negative targets under label smoothing (reference: loss.py:12)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with positive-class weighting, matching
    torch.nn.BCEWithLogitsLoss(pos_weight=...) (used at loss.py:120-121)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_np)


def focal_modulation(loss, logits, targets, gamma: float = 1.5, alpha: float = 0.25):
    """FocalLoss wrapper semantics (reference: loss.py:35-60)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_factor * jnp.power(1.0 - p_t, gamma)


def slide_modulation(loss, targets, auto_iou):
    """SlideLoss re-weighting (reference: loss.py:378-402): weight 1 below
    auto_iou-0.1, exp(1-auto_iou) in the slide band, exp(-(t-1)) above."""
    auto_iou = jnp.maximum(auto_iou, 0.2)
    b1 = targets <= auto_iou - 0.1
    b2 = (targets > auto_iou - 0.1) & (targets < auto_iou)
    b3 = targets >= auto_iou
    w = 1.0 * b1 + jnp.exp(1.0 - auto_iou) * b2 + jnp.exp(-(targets - 1.0)) * b3
    return loss * w


class LevelTargets(NamedTuple):
    """Dense single-image assignment; arrays length K = 5 * na * M."""

    a: jax.Array  # anchor index
    gj: jax.Array  # cell row
    gi: jax.Array  # cell col
    tcls: jax.Array  # class id
    tbox: jax.Array  # (K, 4) [dx, dy, w, h] in grid units
    anch: jax.Array  # (K, 2) anchor wh in grid units
    mask: jax.Array  # (K,) bool


# offsets built lazily: a module-level jnp.array would initialize the jax
# backend at import time, defeating late --device selection
_OFFSETS_LIST = [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]]
_G = 0.5  # neighbor cell threshold (reference: loss.py:216)


def build_targets_level(
    targets: jax.Array,  # (M, 5) [cls, x, y, w, h] normalized; cls=-1 pads
    anchors: jax.Array,  # (na, 2) grid units
    ny: int,
    nx: int,
    anchor_t: float,
) -> LevelTargets:
    """Vectorized YOLOv5 assignment for one image and one level
    (reference: loss.py:210-262)."""
    M = targets.shape[0]
    na = anchors.shape[0]
    # zero-size rows are invalid regardless of cls: the reference's dynamic
    # ratio filter drops them entirely (loss.py:229 j = r.max(2) < anchor_t
    # on a filtered tensor); our static lattice keeps the lanes, so their
    # geometry must be benign or arctan(0/0) NaNs the whole backward
    valid = (targets[:, 0] >= 0) & (targets[:, 3] > 0) & (targets[:, 4] > 0)

    gxy = targets[:, 1:3] * jnp.array([nx, ny], jnp.float32)  # (M,2)
    gwh = targets[:, 3:5] * jnp.array([nx, ny], jnp.float32)
    # padded rows get benign geometry so CIoU/NWD math stays NaN-free
    # (their candidates are masked out regardless)
    gxy = jnp.where(valid[:, None], gxy, 0.5)
    gwh = jnp.where(valid[:, None], gwh, 1.0)

    r = gwh[None, :, :] / anchors[:, None, :]  # (na, M, 2)
    ratio_ok = jnp.maximum(r, 1.0 / r).max(-1) < anchor_t  # (na, M)

    gxi = jnp.array([nx, ny], jnp.float32) - gxy
    jmask = (gxy[:, 0] % 1 < _G) & (gxy[:, 0] > 1)
    kmask = (gxy[:, 1] % 1 < _G) & (gxy[:, 1] > 1)
    lmask = (gxi[:, 0] % 1 < _G) & (gxi[:, 0] > 1)
    mmask = (gxi[:, 1] % 1 < _G) & (gxi[:, 1] > 1)
    off_ok = jnp.stack([jnp.ones_like(jmask), jmask, kmask, lmask, mmask])  # (5, M)

    cand = off_ok[:, None, :] & ratio_ok[None, :, :] & valid[None, None, :]  # (5, na, M)

    offsets = jnp.array(_OFFSETS_LIST, jnp.float32)
    gxy_c = gxy[None, :, :] - offsets[:, None, :] * _G  # (5, M, 2)
    gij = jnp.floor(gxy_c)
    gi = jnp.clip(gij[..., 0], 0, nx - 1)
    gj = jnp.clip(gij[..., 1], 0, ny - 1)
    # tbox offset uses the clamped cell (the reference clamps in place before
    # building tbox, loss.py:255-257)
    dxy = gxy[None, :, :] - jnp.stack([gi, gj], axis=-1)  # (5, M, 2)

    cls = jnp.broadcast_to(targets[:, 0].astype(jnp.int32)[None, None, :], (5, na, M))
    a = jnp.broadcast_to(jnp.arange(na, dtype=jnp.int32)[None, :, None], (5, na, M))
    gi_f = jnp.broadcast_to(gi[:, None, :], (5, na, M)).astype(jnp.int32)
    gj_f = jnp.broadcast_to(gj[:, None, :], (5, na, M)).astype(jnp.int32)
    dxy_f = jnp.broadcast_to(dxy[:, None, :, :], (5, na, M, 2))
    gwh_f = jnp.broadcast_to(gwh[None, None, :, :], (5, na, M, 2))
    anch_f = jnp.broadcast_to(anchors[None, :, None, :], (5, na, M, 2))

    K = 5 * na * M
    return LevelTargets(
        a=a.reshape(K),
        gj=gj_f.reshape(K),
        gi=gi_f.reshape(K),
        tcls=jnp.where(cand, cls, 0).reshape(K),
        tbox=jnp.concatenate([dxy_f, gwh_f], axis=-1).reshape(K, 4),
        anch=anch_f.reshape(K, 2),
        mask=cand.reshape(K),
    )


class ComputeLoss:
    """Functional loss: call with (preds, targets) inside jit.

    preds: list of (B, ny, nx, na, no) raw head maps.
    targets: (B, M, 5) padded per-image [cls, x, y, w, h] normalized,
    padding rows cls = -1.

    Returns (total_loss, components (3,) [lbox, lobj, lcls]) — total is
    already scaled by batch size like the reference (loss.py:208); under
    pjit data parallelism the global-mean gradient reproduces the
    reference's `loss *= WORLD_SIZE` DDP-sum semantics (train.py:266-267).
    """

    def __init__(self, meta, hyp: dict, autobalance: bool = False):
        self.na = meta.na
        self.nc = meta.nc
        self.nl = meta.nl
        self.anchors = jnp.asarray(meta.anchors_grid, jnp.float32)  # (nl, na, 2)
        self.hyp = dict(hyp)
        self.cp, self.cn = smooth_bce(hyp.get("label_smoothing", 0.0))
        self.balance = {3: [4.0, 1.0, 0.4]}.get(self.nl, [4.0, 1.0, 0.25, 0.06, 0.02])
        self.gr = 1.0
        self.fl_gamma = float(hyp.get("fl_gamma", 0.0))
        self.slide_ratio = float(hyp.get("slide_ratio", 0))
        self.nwd = float(hyp.get("nwdloss", 0))
        self.shape_nwd = float(hyp.get("shapeloss", 0))
        # Fidelity switch: the reference feeds CENTER-format (xywh) boxes
        # into wasserstein/wasserstein_loss, which read them as corner
        # (xyxy) boxes (utils/loss.py:162-166 vs utils/metrics.py:341-395)
        # — a defect we correct by default. Opt in to bit-reproduce the
        # reference's NWD term (hyp key `nwd_ref_defect`).
        self.nwd_ref_defect = bool(hyp.get("nwd_ref_defect", False))
        self.rep = False  # wired by the trainer via --rep (reference: train.py:399)
        self.rep_alpha = float(hyp.get("alpha", 0.01))
        self.rep_beta = float(hyp.get("beta", 0.1))
        self.rep_deta = float(hyp.get("deta", 0.5))
        self.rep_nms = float(hyp.get("Rp_nms", 0.1))
        self.anchor_t = float(hyp.get("anchor_t", 4.0))

    def __call__(self, preds: Sequence[jax.Array], targets: jax.Array):
        if len(preds) == 2 * self.nl:
            # IAuxDetect training maps (lead + aux): aux maps take the same
            # targets at 0.25 weight (the YOLOv7 convention; the reference's
            # own ComputeLoss assumes nl maps and never wires IAuxDetect,
            # utils/loss.py:112)
            total, comps = self.__call__(preds[: self.nl], targets)
            aux_total, _ = self.__call__(preds[self.nl :], targets)
            return total + 0.25 * aux_total, comps
        lbox = jnp.zeros((), jnp.float32)
        lobj = jnp.zeros((), jnp.float32)
        lcls = jnp.zeros((), jnp.float32)
        lrep = jnp.zeros((), jnp.float32)
        bs = preds[0].shape[0]

        for i, pi in enumerate(preds):
            pi = pi.astype(jnp.float32)
            B, ny, nx, na, no = pi.shape
            anchors_i = self.anchors[i]

            def per_image(pi_b, t_b):
                lt = build_targets_level(t_b, anchors_i, ny, nx, self.anchor_t)
                ps = pi_b[lt.gj, lt.gi, lt.a]  # (K, no)
                pxy = jax.nn.sigmoid(ps[:, :2]) * 2.0 - 0.5
                pwh = jnp.square(jax.nn.sigmoid(ps[:, 2:4]) * 2.0) * lt.anch
                pbox = jnp.concatenate([pxy, pwh], axis=-1)
                iou = bbox_iou(pbox, lt.tbox, xywh=True, CIoU=True)
                if self.nwd > 0:
                    nwd_fn = wasserstein if self.shape_nwd > 0 else wasserstein_loss
                    if self.nwd_ref_defect:
                        nwd = nwd_fn(pbox, lt.tbox)
                    else:
                        nwd = nwd_fn(xywh2xyxy(pbox), xywh2xyxy(lt.tbox))
                else:
                    nwd = jnp.zeros_like(iou)
                # objectness scatter-max for this image
                tobj = jnp.zeros((ny, nx, na), jnp.float32)
                if self.nwd > 0:
                    r = 0.5
                    iou_t = jnp.clip(
                        jax.lax.stop_gradient(iou) * (1 - r) + jax.lax.stop_gradient(nwd) * r, 0.0, 1.0
                    )
                else:
                    iou_t = jnp.clip(jax.lax.stop_gradient(iou), 0.0, 1.0)
                obj_val = ((1.0 - self.gr) + self.gr * iou_t) * lt.mask
                tobj = tobj.at[lt.gj, lt.gi, lt.a].max(obj_val)
                return lt, ps, iou, nwd, iou_t, tobj

            lt, ps, iou, nwd, iou_t, tobj = jax.vmap(per_image)(pi, targets)
            mask = lt.mask  # (B, K)
            n_pos = jnp.sum(mask)
            denom = n_pos + 1e-12

            if self.nwd > 0:
                r = 0.5
                lbox += (1 - r) * jnp.sum((1.0 - iou) * mask) / denom + r * jnp.sum(
                    (1.0 - nwd) * mask
                ) / denom
            else:
                lbox += jnp.sum((1.0 - iou) * mask) / denom

            auto_iou = jnp.where(n_pos > 0, jnp.sum(iou_t * mask) / denom, 0.5)

            # classification (only when nc > 1, reference: loss.py:181)
            if self.nc > 1:
                t = jnp.full(ps.shape[:2] + (self.nc,), self.cn, jnp.float32)
                t = jnp.where(
                    jax.nn.one_hot(lt.tcls, self.nc, dtype=jnp.bool_), self.cp, t
                )
                closs = bce_with_logits(ps[..., 5:], t, self.hyp["cls_pw"])
                if self.fl_gamma > 0:
                    closs = focal_modulation(closs, ps[..., 5:], t, self.fl_gamma)
                if self.slide_ratio > 0:
                    closs = slide_modulation(closs, t, auto_iou)
                lcls += jnp.sum(closs * mask[..., None]) / (denom * self.nc)

            oloss = bce_with_logits(pi[..., 4], tobj, self.hyp["obj_pw"])
            if self.fl_gamma > 0:
                oloss = focal_modulation(oloss, pi[..., 4], tobj, self.fl_gamma)
            if self.slide_ratio > 0:
                oloss = slide_modulation(oloss, tobj, auto_iou)
            lobj += oloss.mean() * self.balance[i]

            if self.rep:
                pbox_all = jnp.concatenate(
                    [
                        jax.nn.sigmoid(ps[..., :2]) * 2.0 - 0.5,
                        jnp.square(jax.nn.sigmoid(ps[..., 2:4]) * 2.0) * lt.anch,
                    ],
                    axis=-1,
                )
                lrep += jnp.mean(jax.vmap(self._repulsion_image)(pbox_all, lt))

        lbox *= self.hyp["box"]
        lobj *= self.hyp["obj"]
        lcls *= self.hyp["cls"]
        total = lbox + lobj + lcls
        if self.rep:
            total = total + lrep
        components = jnp.stack([lbox, lobj, lcls])
        return total * bs, jax.lax.stop_gradient(components)

    # -- repulsion (reference: utils/RepulsionLoss.py:47-95, wired here) ----

    def _repulsion_image(self, pbox: jax.Array, lt: LevelTargets, cap: int = 256) -> jax.Array:
        """RepGT + RepBox for one image over a capped positive set.

        The reference loops per image on CPU with O(P^2) python; here both
        terms are one masked pairwise computation over the first `cap`
        positives (by candidate order).
        """
        K = pbox.shape[0]
        cap = min(cap, K)
        _, idx = jax.lax.top_k(lt.mask.astype(jnp.float32), cap)
        m = lt.mask[idx]
        cell = jnp.stack([lt.gi[idx], lt.gj[idx]], -1).astype(jnp.float32)
        shift = jnp.concatenate([cell, jnp.zeros((cap, 2))], -1)
        pb = xywh2xyxy(pbox[idx] + shift)
        gb = xywh2xyxy(lt.tbox[idx] + shift)
        pb = jax.lax.stop_gradient(jnp.where(m[:, None], pb, -1e4))
        gb = jax.lax.stop_gradient(jnp.where(m[:, None], gb, -1e4))

        pair_ok = m[:, None] & m[None, :]
        same_gt = jnp.all(jnp.abs(gb[:, None] - gb[None, :]) < 1e-6, axis=-1)

        def iou_mat(a, b):
            lt_ = jnp.maximum(a[:, None, :2], b[None, :, :2])
            rb_ = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
            inter = jnp.clip(rb_ - lt_, 0).prod(-1)
            aa = jnp.clip(a[:, 2:] - a[:, :2], 0).prod(-1)
            ab = jnp.clip(b[:, 2:] - b[:, :2], 0).prod(-1)
            return inter / (aa[:, None] + ab[None, :] - inter + 1e-9)

        # RepGT: push each positive away from its *second-best* ground truth
        pg = iou_mat(pb, gb) * pair_ok * (~same_gt)
        sec = jnp.argmax(pg, axis=1)
        max_iou = jnp.max(pg, axis=1)
        iog = self._iog(gb[sec], pb)
        active = (max_iou > 0.0) & m
        repgt = jnp.sum(self._smooth_ln(iog, self.rep_deta) * active) / (jnp.sum(active) + 1e-9)

        # RepBox: push apart positives assigned to different ground truths
        pp = iou_mat(pb, pb) * pair_ok * (~same_gt)
        tri = jnp.tril(jnp.ones_like(pp), k=-1)
        pair_active = (pp > self.rep_nms) * tri
        repbox = jnp.sum(self._smooth_ln(pp, 0.0) * pair_active) / (jnp.sum(pair_active) + 1e-9)
        return self.rep_alpha * repgt + self.rep_beta * repbox

    @staticmethod
    def _smooth_ln(x, sigma):
        """Repulsion smooth-ln (reference: RepulsionLoss.py:40-45)."""
        x = jnp.clip(x, 0.0, 1.0 - 1e-4)
        sig = min(max(sigma, 0.0), 1.0 - 1e-4)
        return jnp.where(x <= sig, -jnp.log1p(-x), (x - sig) / (1.0 - sig) - math.log(1.0 - sig))

    @staticmethod
    def _iog(gt, pred):
        """Intersection over GT area (reference: RepulsionLoss.py:27-37)."""
        x1 = jnp.maximum(gt[:, 0], pred[:, 0])
        y1 = jnp.maximum(gt[:, 1], pred[:, 1])
        x2 = jnp.minimum(gt[:, 2], pred[:, 2])
        y2 = jnp.minimum(gt[:, 3], pred[:, 3])
        inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
        g = jnp.clip((gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1]), 1e-6)
        return inter / g


def pad_targets(label_list, max_labels: int):
    """Host-side helper: list of per-image (n, 5) [cls,x,y,w,h] numpy arrays
    -> (B, max_labels, 5) padded with cls=-1 rows (the collate counterpart of
    reference datasets.py:675)."""
    import numpy as np

    B = len(label_list)
    out = np.full((B, max_labels, 5), -1.0, np.float32)
    out[:, :, 1:] = 0.0
    for i, lab in enumerate(label_list):
        n = min(len(lab), max_labels)
        if n:
            out[i, :n] = lab[:n, :5]
    return out


# ---------------------------------------------------------------------------
# Additional loss modulations from the reference's library (loss.py:18-110)
# ---------------------------------------------------------------------------


def bce_blur_modulation(loss, logits, targets, alpha: float = 0.05):
    """BCEBlurWithLogitsLoss: down-weight missing-label false positives
    (reference: loss.py:18-33)."""
    pred = jax.nn.sigmoid(logits)
    dx = pred - targets
    alpha_factor = 1 - jnp.exp((dx - 1) / (alpha + 1e-4))
    return loss * alpha_factor


def vf_modulation(loss, logits, targets, gamma: float = 1.5, alpha: float = 0.25):
    """Varifocal weighting (reference: loss.py:62-84)."""
    pred = jax.nn.sigmoid(logits)
    w = targets * (targets > 0.0) + alpha * jnp.power(jnp.abs(pred - targets), gamma) * (targets <= 0.0)
    return loss * w


def qfocal_modulation(loss, logits, targets, gamma: float = 1.5, alpha: float = 0.25):
    """Quality focal weighting (reference: loss.py:86-110)."""
    pred = jax.nn.sigmoid(logits)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_factor * jnp.power(jnp.abs(targets - pred), gamma)
