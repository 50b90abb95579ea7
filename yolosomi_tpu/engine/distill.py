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


def distill_loss(
    student_preds: Sequence[jax.Array],
    teacher_preds: Sequence[jax.Array],
    anchors_px,
    strides,
    obj_thr: float = 0.25,
    temp: float = 1.0,
    teacher_anchors_px=None,
):
    """Soft-target distillation loss across pyramid levels.

    Returns a scalar. Teacher activations are stop-gradient'd; box
    imitation is masked to teacher-confident cells so the student is not
    dragged toward background noise. `teacher_anchors_px` decodes the
    teacher's boxes with ITS OWN (possibly autoanchor-refined) anchors;
    defaults to the student's."""
    from yolosomi_tpu.models.heads import decode_boxes_level

    anchors_px = jnp.asarray(anchors_px, jnp.float32)
    t_anchors = (
        jnp.asarray(teacher_anchors_px, jnp.float32)
        if teacher_anchors_px is not None else anchors_px
    )
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
        # boxes: CIoU imitation on the teacher's confident cells, each
        # model decoded with its own anchors (heads.decode_boxes_level —
        # the same geometry the eval decode uses)
        sb = decode_boxes_level(sp, anchors_px[i], float(strides[i]))
        tb = decode_boxes_level(tp, t_anchors[i], float(strides[i]))
        m = (t_obj > obj_thr).astype(jnp.float32)
        ciou = bbox_iou(sb, tb, xywh=True, CIoU=True)
        kd_box = ((1.0 - ciou) * m).sum() / (m.sum() + 1e-6)
        total = total + kd_obj + kd_cls + kd_box
    return total / max(len(student_preds), 1)


def hint_loss(
    student_feats: Sequence[jax.Array],
    teacher_feats: Sequence[jax.Array],
    adapters: Sequence[jax.Array],
    teacher_preds: Sequence[jax.Array],
    obj_thr: float = 0.25,
):
    """Feature (FitNets-style) hint term: per pyramid level, a learnable
    1x1 adapter projects the student's head-input feature map to the
    teacher's channel width, and the L2 gap is penalized ON
    TEACHER-CONFIDENT CELLS only (max-over-anchors teacher objectness >
    obj_thr) — background texture carries no signal worth imitating.
    Normalized by the teacher feature's own power so the scale is
    architecture-independent.

    adapters[i]: (Cs_i, Ct_i) matrix living in the STUDENT's params tree
    (train.py plants them as params['kd_adapter_i']['kernel']), so the
    optimizer learns them jointly — gradients flow through this function
    into both the student trunk and the adapters."""
    total = jnp.zeros((), jnp.float32)
    for i, (sf, tf, a, tp) in enumerate(zip(student_feats, teacher_feats, adapters, teacher_preds)):
        tf = jax.lax.stop_gradient(tf.astype(jnp.float32))
        tp = jax.lax.stop_gradient(tp.astype(jnp.float32))
        proj = jnp.einsum("bhwc,cd->bhwd", sf.astype(jnp.float32), a.astype(jnp.float32))
        # mask: teacher-confident cells, (B, ny, nx, 1)
        t_obj = jax.nn.sigmoid(tp[..., 4]).max(axis=-1)
        m = (t_obj > obj_thr).astype(jnp.float32)[..., None]
        num = (((proj - tf) ** 2) * m).sum()
        den = ((tf ** 2) * m).sum() + 1e-6
        total = total + num / den
    return total / max(len(student_feats), 1)


def wrap_loss_with_distillation(
    base_loss: Callable,
    teacher_apply: Callable,
    meta,
    alpha: float = 1.0,
    obj_thr: float = 0.25,
    teacher_anchors_px=None,
    level_map=None,
    hint: float = 0.0,
):
    """Wrap a ComputeLoss-style callable so the jitted train step also
    runs the frozen teacher and adds alpha * distill_loss.

    `level_map[i]` names the TEACHER pyramid level that student level i
    learns from — built by train.py by matching strides, so a P3-P5
    student (e.g. yolo-somi-t-p3) distills from the P2-P5 flagship by
    skipping the teacher's 160^2 plane. `teacher_anchors_px` must
    already be indexed to the student's levels. None = identity.

    The returned callable has the (preds, targets) -> (total, comps)
    contract that make_train_step expects, but needs the IMAGES and the
    teacher variables too — the trainer passes them when the loss object
    advertises `needs_images`/`needs_aux`. Threading the teacher tree as
    a step ARGUMENT (aux) matters on the remote-compile runtime: a
    closure-captured tree is embedded as literals in the compile request
    (a 134 MB bf16 flagship teacher breaks the HTTP relay), and under
    --multi-scale it would be re-embedded per compiled size."""

    def loss_fn(preds, targets, images=None, aux=None, feats=None, params=None):
        total, comps = base_loss(preds, targets)
        if images is None or aux is None:
            # callers without pixels (per-epoch val loss) get the plain
            # detection loss — KD is a train-step-only term
            return total, comps
        t_out = teacher_apply(aux, images)
        t_feats = None
        if isinstance(t_out, tuple) and len(t_out) == 2 and isinstance(t_out[1], (tuple, list)):
            t_preds, t_feats = t_out
        else:
            t_preds = t_out
        if level_map is not None:
            t_preds = [t_preds[j] for j in level_map]
            if t_feats is not None:
                t_feats = [t_feats[j] for j in level_map]
        kd = distill_loss(
            preds, t_preds, meta.anchors_px, meta.strides, obj_thr=obj_thr,
            teacher_anchors_px=teacher_anchors_px,
        )
        total = total + alpha * kd * preds[0].shape[0]
        if hint > 0.0 and feats is not None and t_feats is not None and params is not None:
            adapters = [params[f"kd_adapter_{i}"]["kernel"] for i in range(len(feats))]
            total = total + hint * hint_loss(feats, t_feats, adapters, t_preds, obj_thr=obj_thr) * preds[0].shape[0]
        return total, comps

    loss_fn.needs_images = True
    loss_fn.needs_aux = True
    loss_fn.needs_features = hint > 0.0
    return loss_fn
