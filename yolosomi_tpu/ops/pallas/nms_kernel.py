"""Pallas TPU kernel: greedy NMS suppression loop, fully VMEM-resident.

The XLA formulation of greedy NMS (ops/nms.py _nms_single) runs
max_det sequential steps of {argmax, gather one box, IoU row, mask};
under XLA each step's intermediates can round-trip HBM. This kernel pins
the whole candidate set (K boxes + scores, K <= ~8k) in VMEM and runs
the loop on-core: the per-step argmax and IoU row are VPU ops over a
(1, K) lane vector, the picked box is a single-sublane read, and the
(max_det,) index outputs accumulate in SMEM — no HBM traffic inside the
loop.

Grid: one program per image. Inputs are the class-offset boxes and
thresholded scores produced by ops/nms.py candidate selection.

This is the torchvision-NMS replacement slot of SURVEY.md §2.9 as a real
TPU kernel; `non_max_suppression(use_pallas=True)` routes here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, keep_idx_ref, keep_val_ref, *, iou_thres: float, max_det: int):
    """boxes (1, K, 4) VMEM; scores (1, 1, K) VMEM; outputs (1, 1, max_det) SMEM."""
    K = boxes_ref.shape[1]
    x1 = boxes_ref[0, :, 0].reshape(1, K)
    y1 = boxes_ref[0, :, 1].reshape(1, K)
    x2 = boxes_ref[0, :, 2].reshape(1, K)
    y2 = boxes_ref[0, :, 3].reshape(1, K)
    areas = (x2 - x1) * (y2 - y1)

    for i0 in range(max_det):
        keep_idx_ref[0, 0, i0] = -1
        keep_val_ref[0, 0, i0] = 0

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def body(i, scores_live):
        j = jnp.argmax(scores_live, axis=1)[0].astype(jnp.int32)
        s = jnp.max(scores_live)  # == scores_live[0, j], no dynamic value slice

        # Mosaic supports dynamic slicing on REFS, not values: read the
        # picked box back from the input ref
        bj = boxes_ref[0, pl.ds(j, 1), :]  # (1, 4)
        bx1 = bj[0, 0]
        by1 = bj[0, 1]
        bx2 = bj[0, 2]
        by2 = bj[0, 3]
        ix1 = jnp.maximum(bx1, x1)
        iy1 = jnp.maximum(by1, y1)
        ix2 = jnp.minimum(bx2, x2)
        iy2 = jnp.minimum(by2, y2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = (bx2 - bx1) * (by2 - by1) + areas - inter
        iou = inter / (union + 1e-7)

        valid = s > 0.0

        @pl.when(valid)
        def _():
            keep_idx_ref[0, 0, i] = j
            keep_val_ref[0, 0, i] = 1

        # clear overlaps and the picked lane via masking (no scatter)
        suppress = ((iou > iou_thres) | (lane == j)) & valid
        return jnp.where(suppress, 0.0, scores_live)

    jax.lax.fori_loop(0, max_det, body, scores_ref[0])


@functools.partial(jax.jit, static_argnames=("iou_thres", "max_det", "interpret"))
def pallas_nms(boxes: jax.Array, scores: jax.Array, iou_thres: float, max_det: int, interpret: bool = False):
    """Batched greedy NMS. boxes (B, K, 4) f32 (class-offset), scores
    (B, K) f32 (0 = dead). Returns (keep_idx (B, max_det) int32, -1 pads,
    keep_valid (B, max_det) bool)."""
    B, K, _ = boxes.shape
    kernel = functools.partial(_nms_kernel, iou_thres=float(iou_thres), max_det=int(max_det))
    keep_idx, keep_val = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, 4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, max_det), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, max_det), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, max_det), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, max_det), jnp.int32),
        ],
        interpret=interpret,
    )(boxes.astype(jnp.float32), scores.astype(jnp.float32)[:, None, :])
    return keep_idx[:, 0], keep_val[:, 0].astype(bool)
