"""Anchor-free (v8/v11) detection loss with a task-aligned assigner.

The reference wires its DFL heads (yolo.py:725 DetectYOLOv8, :778
DetectYolov11) to the ultralytics task-aligned assigner; this is the
TPU-native counterpart: everything is static-shape and vectorized — the
assignment is a dense (B, max_labels, N_anchors) alignment computation
with masks instead of ragged per-image loops, so the whole train step
jits and shards.

Algorithm (published TAL, TOOD/ultralytics):
  1. candidate mask: anchor center inside the gt box
  2. alignment metric = cls_score^alpha * CIoU^beta  (alpha=0.5, beta=6)
  3. per-gt top-k (k=10) candidates by metric
  4. per-anchor conflict resolution: keep the gt with highest metric
  5. target score = normalized alignment * max-IoU per gt

Loss = BCE(cls, target_scores)/sum(ts) + CIoU box + DFL, with the
ultralytics gains box=7.5, cls=0.5, dfl=1.5 (overridable via hyp).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from yolosomi_tpu.utils.iou import bbox_iou

INF = 1e9


def make_anchor_points(shapes, strides, offset: float = 0.5):
    """Per-level cell centers, concatenated.

    shapes: [(ny, nx), ...]; returns (N, 2) centers in *level-grid* units
    and (N,) stride per anchor (reference counterpart: ultralytics
    make_anchors, used at yolo.py:862)."""
    pts, strs = [], []
    for (ny, nx), s in zip(shapes, strides):
        gx = jnp.arange(nx, dtype=jnp.float32) + offset
        gy = jnp.arange(ny, dtype=jnp.float32) + offset
        xv, yv = jnp.meshgrid(gx, gy)
        pts.append(jnp.stack([xv, yv], -1).reshape(-1, 2))
        strs.append(jnp.full((ny * nx,), float(s), jnp.float32))
    return jnp.concatenate(pts, 0), jnp.concatenate(strs, 0)


def dist2bbox(dist, anchor_points):
    """ltrb distances -> xyxy around anchor points (same units)."""
    x1y1 = anchor_points - dist[..., :2]
    x2y2 = anchor_points + dist[..., 2:]
    return jnp.concatenate([x1y1, x2y2], -1)


def bbox2dist(bbox, anchor_points, reg_max: int):
    """xyxy -> ltrb distances, clamped to reg_max-1-eps for DFL targets."""
    lt = anchor_points - bbox[..., :2]
    rb = bbox[..., 2:] - anchor_points
    return jnp.clip(jnp.concatenate([lt, rb], -1), 0, reg_max - 1 - 0.01)


def _df_loss(pred_dist, target):
    """Distribution focal loss (ultralytics DFLoss): cross-entropy against
    the two integer bins bracketing the continuous target.

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) in [0, reg_max-1).
    Returns (...,) mean over the 4 sides."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ll = jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, jnp.minimum(tr, pred_dist.shape[-1] - 1)[..., None], axis=-1)[..., 0]
    return -(ll * wl + lr * wr).mean(-1)


def task_aligned_assign(
    pd_scores,  # (B, N, nc) sigmoid probabilities
    pd_bboxes,  # (B, N, 4) xyxy (stride units)
    anc_points,  # (N, 2)
    gt_labels,  # (B, M) int32, -1 = pad
    gt_bboxes,  # (B, M, 4) xyxy (stride units)
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """Dense static-shape task-aligned assignment.

    Returns (target_labels (B,N), target_bboxes (B,N,4),
    target_scores (B,N,nc), fg_mask (B,N))."""
    B, N, nc = pd_scores.shape
    M = gt_labels.shape[1]
    mask_gt = gt_labels >= 0  # (B, M)

    # anchor centers inside gt boxes: (B, M, N)
    lt = anc_points[None, None, :, :] - gt_bboxes[:, :, None, :2]
    rb = gt_bboxes[:, :, None, 2:] - anc_points[None, None, :, :]
    in_gts = jnp.minimum(lt.min(-1), rb.min(-1)) > eps

    # alignment metric
    safe_labels = jnp.maximum(gt_labels, 0)
    cls_score = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1), safe_labels[:, :, None], axis=1
    )  # (B, M, N)
    iou = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True
    )  # (B, M, N)
    iou = jnp.clip(iou, 0.0)
    align = jnp.power(jnp.clip(cls_score, eps), alpha) * jnp.power(iou, beta)
    align = jnp.where(in_gts & mask_gt[:, :, None], align, 0.0)

    # per-gt top-k candidates by alignment. Gating is per-GT (a gt is
    # dropped only when its best metric is ~0 — the published TAL
    # behavior), not per-candidate: at init all metrics are tiny but the
    # top-k must still be kept or nothing ever gets assigned.
    k = min(topk, N)
    topk_vals, topk_idx = jax.lax.top_k(align, k)  # (B, M, k)
    topk_valid = (topk_vals.max(-1, keepdims=True) > eps) & (topk_vals > 0)
    mask_topk = jnp.zeros((B, M, N), jnp.bool_)
    mask_topk = jax.vmap(jax.vmap(lambda m, idx, v: m.at[idx].set(v)))(
        mask_topk, topk_idx, topk_valid
    )
    mask_pos = mask_topk & in_gts & mask_gt[:, :, None]  # (B, M, N)

    # conflict resolution: an anchor claimed by several gts keeps the one
    # with the highest IoU (ultralytics select_highest_overlaps)
    masked_iou = jnp.where(mask_pos, iou, -INF)
    best_gt = jnp.argmax(masked_iou, axis=1)  # (B, N)
    fg_mask = mask_pos.any(axis=1)  # (B, N)

    bi = jnp.arange(B)[:, None]
    target_labels = jnp.where(fg_mask, safe_labels[bi, best_gt], 0)
    target_bboxes = gt_bboxes[bi, best_gt]  # (B, N, 4)

    # normalized target scores: per gt, align/max_align * max_iou
    pos_align = jnp.where(mask_pos, align, 0.0)
    pos_iou = jnp.where(mask_pos, iou, 0.0)
    max_align = pos_align.max(axis=-1, keepdims=True)  # (B, M, 1)
    max_iou = pos_iou.max(axis=-1, keepdims=True)
    norm_align = pos_align * max_iou / (max_align + eps)  # (B, M, N)
    score_val = norm_align[bi, best_gt, jnp.arange(N)[None, :]]  # (B, N)
    target_scores = (
        jax.nn.one_hot(target_labels, nc, dtype=jnp.float32)
        * jnp.where(fg_mask, score_val, 0.0)[..., None]
    )
    return target_labels, target_bboxes, target_scores, fg_mask


class ComputeLossV8:
    """Loss for DFL anchor-free heads; same interface as ComputeLoss:
    __call__(preds, targets (B, max_labels, 5) cls=-1-padded normalized
    xywh) -> (total*bs, components [box, dfl, cls])."""

    def __init__(self, meta, hyp: dict, reg_max: int = 16, topk: int = 10):
        self.nc = meta.nc
        self.nl = meta.nl
        self.strides = tuple(float(s) for s in meta.strides)
        self.reg_max = reg_max
        self.topk = topk
        self.box_gain = hyp.get("box_v8", 7.5)
        self.cls_gain = hyp.get("cls_v8", 0.5)
        self.dfl_gain = hyp.get("dfl", 1.5)

    def __call__(self, preds: Sequence[jax.Array], targets: jax.Array):
        reg_max, nc = self.reg_max, self.nc
        B = preds[0].shape[0]
        imgsz_y = preds[0].shape[1] * self.strides[0]
        imgsz_x = preds[0].shape[2] * self.strides[0]

        shapes = [(p.shape[1], p.shape[2]) for p in preds]
        anc_points, anc_strides = make_anchor_points(shapes, self.strides)
        N = anc_points.shape[0]

        flat = jnp.concatenate(
            [p.reshape(B, -1, 4 * reg_max + nc).astype(jnp.float32) for p in preds], axis=1
        )
        pred_dist = flat[..., : 4 * reg_max].reshape(B, N, 4, reg_max)
        pred_logits = flat[..., 4 * reg_max :]
        pred_scores = jax.nn.sigmoid(pred_logits)

        bins = jnp.arange(reg_max, dtype=jnp.float32)
        dist = jnp.sum(jax.nn.softmax(pred_dist, axis=-1) * bins, axis=-1)  # (B, N, 4)
        # decode in stride units (each anchor's own grid scale)
        pd_boxes = dist2bbox(dist, anc_points[None])  # grid units per level
        pd_boxes_px = pd_boxes * anc_strides[None, :, None]

        # gt: normalized xywh -> pixel xyxy
        gt_labels = targets[..., 0].astype(jnp.int32)
        cx = targets[..., 1] * imgsz_x
        cy = targets[..., 2] * imgsz_y
        w = targets[..., 3] * imgsz_x
        h = targets[..., 4] * imgsz_y
        gt_boxes_px = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

        anc_px = anc_points * anc_strides[:, None]
        _, target_bboxes_px, target_scores, fg_mask = task_aligned_assign(
            pred_scores,
            pd_boxes_px,
            anc_px,
            gt_labels,
            gt_boxes_px,
            topk=self.topk,
        )

        ts_sum = jnp.maximum(target_scores.sum(), 1.0)

        # cls: BCE with soft target scores over ALL anchors
        cls_loss = (
            jnp.sum(
                jnp.maximum(pred_logits, 0)
                - pred_logits * target_scores
                + jnp.log1p(jnp.exp(-jnp.abs(pred_logits)))
            )
            / ts_sum
        )

        # box: CIoU weighted by target score on fg anchors
        weight = target_scores.sum(-1) * fg_mask  # (B, N)
        iou = bbox_iou(pd_boxes_px, target_bboxes_px, xywh=False, CIoU=True)  # (B, N)
        box_loss = jnp.sum((1.0 - iou) * weight) / ts_sum

        # dfl: on fg anchors, target distances in grid units
        target_ltrb = bbox2dist(
            target_bboxes_px / anc_strides[None, :, None], anc_points[None], reg_max
        )
        dfl = _df_loss(pred_dist, target_ltrb)  # (B, N)
        dfl_loss = jnp.sum(dfl * weight) / ts_sum

        lbox = box_loss * self.box_gain
        ldfl = dfl_loss * self.dfl_gain
        lcls = cls_loss * self.cls_gain
        total = (lbox + ldfl + lcls) * B
        comps = jnp.stack([lbox, ldfl, lcls])
        return total, jax.lax.stop_gradient(comps)
