"""Static-shape non-maximum suppression in pure XLA.

Replaces `torchvision.ops.nms` + the per-image Python loop of the reference
(/root/reference/utils/general.py:629-711) with a fixed-shape formulation
that jits and batches:

1. conf = obj * cls, candidate gating by conf_thres (masked, not filtered)
2. class-offset trick (+class * 4096) for per-class suppression
   (reference: general.py:683)
3. top-k candidate selection (max_nms cap, reference: general.py:665)
4. tiled exact greedy suppression (_nms_single_tiled): score-sorted
   512-box tiles, each cross-suppressed against the kept buffer and
   self-suppressed by a monotone fixed-point iteration — identical
   keep-set to torchvision's sequential greedy NMS in O(K/tile)
   sequential steps instead of O(max_det). The sequential while-loop
   form (_nms_single) is kept as the property-test oracle.

Outputs are padded to (max_det, 6) rows [x1, y1, x2, y2, conf, cls];
validity = conf > 0.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from yolosomi_tpu.utils.boxes import xywh2xyxy
from yolosomi_tpu.utils.iou import box_iou as _iou_matrix

MAX_WH = 4096.0  # class-offset multiplier (reference: general.py:641 `max_wh`)


def _iou_row(box: jax.Array, boxes: jax.Array, eps: float = 1e-7) -> jax.Array:
    """IoU of one xyxy box against (K,4) boxes."""
    x1 = jnp.maximum(box[0], boxes[:, 0])
    y1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[2], boxes[:, 2])
    y2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (a1 + a2 - inter + eps)


def _nms_single(
    boxes: jax.Array,  # (K, 4) xyxy, already class-offset
    scores: jax.Array,  # (K,)
    iou_thres: float,
    max_det: int,
):
    """Greedy NMS; returns (max_det,) indices and validity mask.

    Early-exit while_loop: iterations stop as soon as no live candidate
    remains, so sparse images pay for their detections, not for max_det
    (the fixed fori_loop costs ~2 ms/img at max_det=300 regardless of
    content)."""
    K = boxes.shape[0]
    keep_idx0 = jnp.full((max_det,), -1, jnp.int32)
    keep_valid0 = jnp.zeros((max_det,), bool)

    def cond(state):
        i, scores_live, _, _ = state
        return (i < max_det) & (jnp.max(scores_live) > 0.0)

    def body(state):
        i, scores_live, keep_idx, keep_valid = state
        j = jnp.argmax(scores_live)
        keep_idx = keep_idx.at[i].set(j)
        keep_valid = keep_valid.at[i].set(True)
        iou = _iou_row(boxes[j], boxes)
        scores_live = jnp.where(iou > iou_thres, 0.0, scores_live)
        scores_live = scores_live.at[j].set(0.0)
        return i + 1, scores_live, keep_idx, keep_valid

    _, _, keep_idx, keep_valid = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), scores, keep_idx0, keep_valid0)
    )
    return keep_idx, keep_valid


def _self_suppress(E: jax.Array, alive: jax.Array):
    """Resolve within-tile greedy suppression from the edge matrix.

    E[i, j] = True when candidate i (higher score, i < j) overlaps j above
    the threshold. Iteratively: rows with no incoming edge are final
    keepers; everything they point at is final dead and loses its outgoing
    edges. Edges only ever get removed, so "clean" is monotone and the
    fixed point equals sequential greedy NMS — in chain-depth iterations
    (2-4 on real boxes), not max_det iterations (the TPU-native
    reformulation of tf.image.non_max_suppression_padded's inner loop).
    """
    dead0 = ~alive

    def cond(state):
        _, _, changed = state
        return changed

    def body(state):
        E_cur, dead, _ = state
        clean = ~jnp.any(E_cur, axis=0)  # no incoming edge -> final keeper
        kill = jnp.any(E_cur & clean[:, None], axis=0) & ~dead
        dead = dead | kill
        E_cur = E_cur & ~dead[:, None]  # dead boxes cannot suppress
        return E_cur, dead, jnp.any(kill)

    _, dead, _ = jax.lax.while_loop(cond, body, (E & ~dead0[:, None], dead0, jnp.any(E)))
    return alive & ~dead


def _nms_single_tiled(
    boxes: jax.Array,  # (K, 4) xyxy class-offset, score-sorted descending
    scores: jax.Array,  # (K,) sorted descending
    iou_thres: float,
    max_det: int,
    tile: int = 512,
):
    """Tiled exact greedy NMS: O(K/tile) sequential steps instead of
    O(max_det).

    Walks score-sorted tiles with a while_loop (early exit once the keep
    buffer is full or candidates run out — a sparse serving image pays for
    ~1 tile). Per tile: one (tile, max_det) cross-IoU against the kept
    buffer, an iterative self-suppression (see _self_suppress), and a
    cumsum scatter into the buffer. The kept set is identical to the
    sequential greedy loop: earlier tiles strictly outrank later ones, and
    keepers past max_det can never influence the first max_det picks.
    """
    K = boxes.shape[0]
    T = min(tile, K)
    n_tiles = (K + T - 1) // T
    pad = n_tiles * T - K
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, pad),))
    rank = jnp.arange(T)
    upper = rank[:, None] < rank[None, :]  # i suppresses j only when i < j

    def cond(state):
        ti, _, count, _ = state
        more = scores[ti * T] > 0.0  # tiles are score-sorted; empty tile -> done
        return (ti < n_tiles) & (count < max_det) & more

    def body(state):
        ti, buf, count, keep_idx = state
        tb = jax.lax.dynamic_slice(boxes, (ti * T, 0), (T, 4))
        tsc = jax.lax.dynamic_slice(scores, (ti * T,), (T,))
        tvalid = tsc > 0.0
        # cross-suppression vs the kept buffer (zero rows -> IoU 0)
        sup = jnp.any(_iou_matrix(tb, buf) > iou_thres, axis=1)
        alive = tvalid & ~sup
        tbz = jnp.where(alive[:, None], tb, 0.0)
        E = (_iou_matrix(tbz, tbz) > iou_thres) & upper
        alive = _self_suppress(E, alive)
        # append keepers to the buffer in score order; non-keepers scatter
        # into a sacrificial overflow row that is sliced off
        pos = count + jnp.cumsum(alive) - 1
        ok = alive & (pos < max_det)
        pos_safe = jnp.where(ok, pos, max_det)
        buf = jnp.concatenate([buf, jnp.zeros((1, 4), buf.dtype)], axis=0)
        buf = buf.at[pos_safe].set(jnp.where(ok[:, None], tb, 0.0))[:max_det]
        keep_idx = jnp.concatenate([keep_idx, jnp.zeros((1,), keep_idx.dtype)], axis=0)
        keep_idx = keep_idx.at[pos_safe].set(jnp.where(ok, ti * T + rank, -1))[:max_det]
        count = jnp.minimum(count + jnp.sum(alive.astype(jnp.int32)), max_det)
        return ti + 1, buf, count, keep_idx

    buf0 = jnp.zeros((max_det, 4), boxes.dtype)
    keep0 = jnp.full((max_det,), -1, jnp.int32)
    _, _, count, keep_idx = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), buf0, jnp.zeros((), jnp.int32), keep0)
    )
    keep_valid = jnp.arange(max_det) < count
    return keep_idx, keep_valid


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "multi_label", "agnostic", "max_det", "max_nms", "exact"),
)
def non_max_suppression(
    prediction: jax.Array,  # (B, N, 5 + nc) decoded rows [xc,yc,w,h,obj,cls...]
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes: Optional[jax.Array] = None,  # (nc,) bool mask of allowed classes
    multi_label: bool = False,
    agnostic: bool = False,
    max_det: int = 300,
    max_nms: int = 4096,
    exact: bool = False,
) -> jax.Array:
    """Batched static-shape NMS.

    Returns (B, max_det, 6) float32 rows [x1, y1, x2, y2, conf, cls], padded
    with zeros; a row is valid iff its conf > 0.
    """
    b, n, no = prediction.shape
    nc = no - 5
    pred = prediction.astype(jnp.float32)
    boxes_xyxy = xywh2xyxy(pred[..., :4])  # (B, N, 4)
    obj = pred[..., 4]
    cls_scores = pred[..., 5:] * obj[..., None]  # (B, N, nc)
    if classes is not None:
        cls_scores = jnp.where(classes[None, None, :], cls_scores, 0.0)

    k = min(max_nms, n * nc if multi_label else n)

    # candidate selection: approx_max_k uses the TPU's partial-sort unit and
    # is exact on CPU. The eval protocol (val.py) passes exact=True +
    # max_nms=30000 so candidate selection matches the reference
    # (general.py:665) exactly; the approximate path is for deployment
    # inference, where recall loss beyond ~k in-threshold candidates has
    # negligible mAP contribution.
    def _topk(v, kk):
        if exact:
            return jax.lax.top_k(v, kk)
        return jax.lax.approx_max_k(v, kk, recall_target=0.95)

    def per_image(bx, cs):
        if multi_label:
            flat = cs.reshape(-1)  # (N*nc,)
            flat = jnp.where(flat > conf_thres, flat, 0.0)
            scores, idx = _topk(flat, k)
            box_idx = idx // nc
            cls_idx = (idx % nc).astype(jnp.float32)
            cand_boxes = bx[box_idx]
        else:
            best_cls = jnp.argmax(cs, axis=-1)
            best = jnp.max(cs, axis=-1)
            best = jnp.where(best > conf_thres, best, 0.0)
            scores, box_idx = _topk(best, k)
            cls_idx = best_cls[box_idx].astype(jnp.float32)
            cand_boxes = bx[box_idx]
        offset = jnp.zeros_like(cls_idx) if agnostic else cls_idx * MAX_WH
        return cand_boxes, scores, cls_idx, cand_boxes + offset[:, None]

    cand_boxes, scores, cls_idx, offset_boxes = jax.vmap(per_image)(boxes_xyxy, cls_scores)

    # tiled exact greedy NMS: ~K/512 sequential steps w/ early exit
    # instead of max_det argmax iterations (30 -> 7.5 ms per b32 batch,
    # PERF.md round-2; superseded the Pallas kernel, which lost 2.4x)
    keep_idx, keep_valid = jax.vmap(
        lambda bx, sc: _nms_single_tiled(bx, sc, iou_thres, max_det)
    )(offset_boxes, scores)

    safe = jnp.maximum(keep_idx, 0)
    out = jnp.concatenate(
        [
            jnp.take_along_axis(cand_boxes, safe[..., None], axis=1),
            jnp.take_along_axis(scores, safe, axis=1)[..., None],
            jnp.take_along_axis(cls_idx, safe, axis=1)[..., None],
        ],
        axis=-1,
    )
    return jnp.where(keep_valid[..., None], out, 0.0)


def soft_nms_scores(
    boxes: jax.Array,
    scores: jax.Array,
    sigma: float = 0.5,
    max_det: int = 300,
    iou_thresh: float = 0.3,
    ciou: bool = True,
):
    """Gaussian soft-NMS score decay (reference: general.py:834-862,
    available-but-unwired there; provided for parity). Returns decayed
    scores aligned with input order; the kept set at a score threshold t
    equals the reference's keep list for score-sorted inputs
    (oracle-checked in tests/test_reference_oracle2.py).

    Reference semantics reproduced exactly: overlap is CIoU
    (box_iou_for_nms(..., CIoU=True), general.py:846) and only boxes with
    overlap > `iou_thresh` are decayed (general.py:848-852)."""
    from yolosomi_tpu.utils.iou import bbox_iou

    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    K = boxes.shape[0]

    def body(i, state):
        scores_live, final = state
        j = jnp.argmax(scores_live)
        s = scores_live[j]
        final = final.at[j].set(s)
        if ciou:
            iou = bbox_iou(boxes[j][None, :], boxes, xywh=False, CIoU=True)
            iou = jnp.reshape(iou, (K,))
        else:
            iou = _iou_row(boxes[j], boxes)
        decay = jnp.exp(-(iou**2) / sigma)
        scores_live = scores_live * jnp.where(iou > iou_thresh, decay, 1.0)
        scores_live = scores_live.at[j].set(0.0)
        return scores_live, final

    final = jnp.zeros_like(scores)
    _, final = jax.lax.fori_loop(0, min(max_det, K), body, (scores, final))
    return final


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "agnostic", "max_det", "max_nms", "strides"),
)
def fused_postprocess(
    preds,  # list of raw level maps (B, ny, nx, na, 5+nc)
    anchors_px,  # (nl, na, 2) pixel anchors
    strides: tuple,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes=None,
    agnostic: bool = False,
    max_det: int = 300,
    max_nms: int = 4096,
) -> jax.Array:
    """Serving-path decode+NMS fusion: score the full grid, top-k, then
    decode boxes ONLY for the k candidates (single-label semantics, the
    detect.py default). Skips the full-grid box math and the (B, N, no)
    f32 decode buffer (~48 MB at b32/640) that `decode` +
    `non_max_suppression` materialize; keep-set is identical to that
    path (tests/test_nms.py parity test). The eval protocol (val.py,
    multi_label + exact top-k) stays on the unfused path.
    """
    b = preds[0].shape[0]
    anchors_px = jnp.asarray(anchors_px, jnp.float32)

    conf_parts, cls_parts, twh_parts = [], [], []
    mesh_parts, anc_parts, stride_parts = [], [], []
    allowed = None if classes is None else jnp.asarray(classes)
    for i, p in enumerate(preds):
        _, ny, nx, na, no = p.shape
        y = jax.nn.sigmoid(p[..., 4:].astype(jnp.float32))  # obj + cls only
        conf = y[..., 0:1] * y[..., 1:]
        if allowed is not None:
            # mask disallowed classes BEFORE the argmax so a box whose
            # best class is filtered can still surface its next class —
            # matching non_max_suppression's pre-argmax masking
            conf = jnp.where(allowed[None, None, None, None, :], conf, 0.0)
        best = jnp.max(conf, axis=-1).reshape(b, -1)
        bestc = jnp.argmax(conf, axis=-1).reshape(b, -1).astype(jnp.float32)
        conf_parts.append(best)
        cls_parts.append(bestc)
        twh_parts.append(p[..., :4].reshape(b, -1, 4))
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
        mesh = jnp.stack([gx, gy], -1)[:, :, None, :].repeat(na, axis=2).reshape(-1, 2)
        mesh_parts.append(mesh)
        anc_parts.append(jnp.broadcast_to(anchors_px[i][None], (ny * nx, na, 2)).reshape(-1, 2))
        stride_parts.append(jnp.full((ny * nx * na,), float(strides[i]), jnp.float32))

    scores = jnp.concatenate(conf_parts, axis=1)  # (B, N)
    clss = jnp.concatenate(cls_parts, axis=1)
    traw = jnp.concatenate(twh_parts, axis=1)  # (B, N, 4) raw box channels
    mesh = jnp.concatenate(mesh_parts, axis=0)  # (N, 2) constants
    anc = jnp.concatenate(anc_parts, axis=0)
    strd = jnp.concatenate(stride_parts, axis=0)

    scores = jnp.where(scores > conf_thres, scores, 0.0)
    k = min(max_nms, scores.shape[1])
    top_scores, idx = jax.lax.top_k(scores, k)  # sorted desc

    t = jnp.take_along_axis(traw, idx[..., None], axis=1).astype(jnp.float32)
    y = jax.nn.sigmoid(t)
    xy = (y[..., :2] * 2.0 - 0.5 + mesh[idx]) * strd[idx][..., None]
    wh = jnp.square(y[..., 2:4] * 2.0) * anc[idx]
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)  # xyxy
    cls_k = jnp.take_along_axis(clss, idx, axis=1)
    offset = jnp.zeros_like(cls_k) if agnostic else cls_k * MAX_WH
    keep_idx, keep_valid = jax.vmap(
        lambda bx, sc: _nms_single_tiled(bx, sc, iou_thres, max_det)
    )(boxes + offset[..., None], top_scores)

    safe = jnp.maximum(keep_idx, 0)
    out = jnp.concatenate(
        [
            jnp.take_along_axis(boxes, safe[..., None], axis=1),
            jnp.take_along_axis(top_scores, safe, axis=1)[..., None],
            jnp.take_along_axis(cls_k, safe, axis=1)[..., None],
        ],
        axis=-1,
    )
    return jnp.where(keep_valid[..., None], out, 0.0)
