"""Knowledge distillation: train a light serving variant from the flagship.

Why this exists: the flagship's 244 GFLOP/img graph has a physics ceiling
of ~807 img/s/chip at bf16 on v5e (PERF.md speed-of-light table), so the
2,000 img/s serving target requires a smaller student — e.g. the
width-0.5 flagship at ~61 GFLOP (SoL ~3,200 img/s). This module supplies
the TPU-native distillation recipe: the frozen teacher's forward runs
INSIDE the student's jitted train step (one compiled program — no
separate teacher pipeline, no host round trips), and its soft targets
are blended with the ordinary detection loss.

Objective (per level, teacher and student must share the anchor layout —
true for width/depth-scaled variants of one config):
  kd_obj  = BCE(student obj logits,  sigmoid(teacher obj logits))
  kd_cls  = BCE(student cls logits,  sigmoid(teacher cls logits)),
            weighted by teacher objectness (confident cells teach class)
  kd_box  = (1 - CIoU(student decode, teacher decode)) on cells where
            teacher objectness > obj_thr (soft positive set)
  total   = detection_loss + alpha * (kd_obj + kd_cls + kd_box)

This follows the standard hint-free output-distillation recipe for dense
detectors (Hinton soft targets + box imitation on confident anchors);
the reference repository has no distillation counterpart — this is a
beyond-parity capability.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from yolosomi_tpu.losses import bce_with_logits
from yolosomi_tpu.utils.iou import bbox_iou


def _decode_boxes_level(p: jax.Array, anchors_px: jax.Array, stride: float) -> jax.Array:
    """Raw level map (B, ny, nx, na, no) -> pixel xywh boxes (B, ny, nx, na, 4)."""
    b, ny, nx, na, no = p.shape
    y = jax.nn.sigmoid(p[..., :4].astype(jnp.float32))
    gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    mesh = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]
    xy = (y[..., 0:2] * 2.0 - 0.5 + mesh) * stride
    wh = jnp.square(y[..., 2:4] * 2.0) * anchors_px.reshape(1, 1, 1, na, 2)
    return jnp.concatenate([xy, wh], axis=-1)


def distill_loss(
    student_preds: Sequence[jax.Array],
    teacher_preds: Sequence[jax.Array],
    anchors_px,
    strides,
    obj_thr: float = 0.25,
    temp: float = 1.0,
):
    """Soft-target distillation loss across pyramid levels.

    Returns a scalar. Teacher activations are stop-gradient'd; box
    imitation is masked to teacher-confident cells so the student is not
    dragged toward background noise.
    """
    anchors_px = jnp.asarray(anchors_px, jnp.float32)
    total = jnp.zeros((), jnp.float32)
    for i, (sp, tp) in enumerate(zip(student_preds, teacher_preds)):
        sp = sp.astype(jnp.float32)
        tp = jax.lax.stop_gradient(tp.astype(jnp.float32))
        t_obj = jax.nn.sigmoid(tp[..., 4] / temp)
        # objectness: every cell learns the teacher's confidence field
        kd_obj = bce_with_logits(sp[..., 4] / temp, t_obj).mean()
        # classes: teacher-confidence-weighted soft labels
        t_cls = jax.nn.sigmoid(tp[..., 5:] / temp)
        w = t_obj[..., None]
        kd_cls = (bce_with_logits(sp[..., 5:] / temp, t_cls) * w).sum() / (
            w.sum() * max(sp.shape[-1] - 5, 1) + 1e-6
        )
        # boxes: CIoU imitation on the teacher's confident cells
        sb = _decode_boxes_level(sp, anchors_px[i], float(strides[i]))
        tb = _decode_boxes_level(tp, anchors_px[i], float(strides[i]))
        m = (t_obj > obj_thr).astype(jnp.float32)
        ciou = bbox_iou(sb, tb, xywh=True, CIoU=True)
        kd_box = ((1.0 - ciou) * m).sum() / (m.sum() + 1e-6)
        total = total + kd_obj + kd_cls + kd_box
    return total / max(len(student_preds), 1)


def wrap_loss_with_distillation(
    base_loss: Callable,
    teacher_apply: Callable,
    teacher_variables,
    meta,
    alpha: float = 1.0,
    obj_thr: float = 0.25,
):
    """Wrap a ComputeLoss-style callable so the jitted train step also
    runs the frozen teacher and adds alpha * distill_loss.

    The returned callable has the (preds, targets) -> (total, comps)
    contract that make_train_step expects, but needs the IMAGES too —
    the trainer passes them via the `images` keyword when the loss
    object advertises `needs_images = True`.
    """

    def loss_fn(preds, targets, images=None):
        total, comps = base_loss(preds, targets)
        if images is None:
            # callers without pixels (per-epoch val loss) get the plain
            # detection loss — KD is a train-step-only term
            return total, comps
        t_preds = teacher_apply(teacher_variables, images)
        kd = distill_loss(preds, t_preds, meta.anchors_px, meta.strides, obj_thr=obj_thr)
        return total + alpha * kd * preds[0].shape[0], comps

    loss_fn.needs_images = True
    return loss_fn
