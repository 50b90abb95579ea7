"""IoU family: pairwise and matrix IoU, penalty-term variants, NWD.

TPU-native counterpart of the reference IoU library
(/root/reference/utils/metrics.py:208-480 and utils/metrics_aIoU.py:192-240).
All functions are jnp-first (jit/vmap-friendly, no data-dependent shapes)
and also accept numpy inputs.

Implemented variants (selected by keyword, mirroring the reference's
`bbox_iou` mega-function, metrics.py:476-583):
  - plain IoU, GIoU, DIoU, CIoU, EIoU, SIoU
  - alpha-IoU exponent (metrics_aIoU.py:192, alpha=3)
  - NWD / normalized Wasserstein distance (metrics.py:341 `wasserstein_loss`,
    C=12.8) and shape-weighted NWD (metrics.py:373 `wasserstein`, C=2.5)
  - shape_iou (metrics.py:397)
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def bbox_iou(
    box1,
    box2,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    EIoU: bool = False,
    SIoU: bool = False,
    alpha: float = 1.0,
    eps: float = 1e-7,
):
    """Element-wise IoU of aligned box arrays (broadcastable shapes (..., 4)).

    `xywh=True` means boxes are (xc, yc, w, h) — the loss-path convention
    (reference calls with x1y1x2y2=False, utils/loss.py:161). Returns IoU (or
    the penalized variant) with the same leading shape.
    """
    if xywh:
        x1, y1, w1, h1 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        x2, y2, w2, h2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        b1x1, b1x2 = x1 - w1 / 2, x1 + w1 / 2
        b1y1, b1y2 = y1 - h1 / 2, y1 + h1 / 2
        b2x1, b2x2 = x2 - w2 / 2, x2 + w2 / 2
        b2y1, b2y2 = y2 - h2 / 2, y2 + h2 / 2
        # the reference recomputes heights with +eps in BOTH input branches
        # (metrics.py:184-185 / :497-498). Without it a sigmoid-underflowed
        # prediction gives h1 == 0 exactly, and CIoU's arctan(w1/h1)
        # backward emits 0*inf = NaN — observed poisoning every flagship
        # 640px train step through the finite-grad guard (grads zeroed,
        # steps skipped, loss flat for 200 epochs).
        h1 = h1 + eps
        h2 = h2 + eps
    else:
        b1x1, b1y1, b1x2, b1y2 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        b2x1, b2y1, b2x2, b2y2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
        w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if alpha != 1.0:
        iou = jnp.power(iou + eps, alpha)

    if not (GIoU or DIoU or CIoU or EIoU or SIoU):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # enclosing width
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)  # enclosing height

    if GIoU:
        c_area = cw * ch + eps
        return iou - jnp.power((c_area - union) / c_area + eps, alpha)

    if SIoU:  # SCYLLA-IoU (Gevorgyan 2022), as in reference metrics.py SIoU branch
        s_cw = (b2x1 + b2x2 - b1x1 - b1x2) * 0.5
        s_ch = (b2y1 + b2y2 - b1y1 - b1y2) * 0.5
        sigma = jnp.sqrt(s_cw**2 + s_ch**2) + eps
        sin_a = jnp.abs(s_cw) / sigma
        sin_b = jnp.abs(s_ch) / sigma
        threshold = math.sqrt(2.0) / 2.0
        sin_best = jnp.where(sin_a > threshold, sin_b, sin_a)
        angle_cost = jnp.cos(jnp.arcsin(sin_best) * 2 - math.pi / 2)
        rho_x = (s_cw / (cw + eps)) ** 2
        rho_y = (s_ch / (ch + eps)) ** 2
        gamma = 2 - angle_cost
        distance_cost = 2 - jnp.exp(-gamma * rho_x) - jnp.exp(-gamma * rho_y)
        omega_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omega_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = jnp.power(1 - jnp.exp(-omega_w), 4) + jnp.power(1 - jnp.exp(-omega_h), 4)
        return iou - jnp.power((distance_cost + shape_cost) * 0.5 + eps, alpha)

    c2 = cw**2 + ch**2 + eps  # enclosing diagonal squared
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4

    if DIoU:
        return iou - jnp.power(rho2 / c2, alpha)

    if EIoU:
        rho_w2 = (w2 - w1) ** 2
        rho_h2 = (h2 - h1) ** 2
        cw2 = cw**2 + eps
        ch2 = ch**2 + eps
        return iou - jnp.power(rho2 / c2 + rho_w2 / cw2 + rho_h2 / ch2, alpha)

    # CIoU
    v = (4 / math.pi**2) * jnp.square(jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1))
    # `alpha_ciou` is the CIoU trade-off coefficient, treated as a constant
    # w.r.t. gradients (torch uses no_grad; lax.stop_gradient is the analogue)
    import jax

    # denominator is mathematically v + (1 - iou) + eps >= eps, but f32
    # rounding can put iou one ULP above 1 for identical large boxes and
    # cancel (1 + eps) exactly -> 0/0 (the reference's torch code has the
    # same measure-zero flake); clamp keeps the detached coefficient finite
    alpha_ciou = jax.lax.stop_gradient(
        v / jnp.maximum(v - iou + (1 + eps), 1e-8)
    )
    return iou - (jnp.power(rho2 / c2, alpha) + jnp.power(v * alpha_ciou + eps, alpha))


def box_iou(box1, box2, eps: float = 1e-7):
    """Matrix IoU: box1 (N,4) xyxy vs box2 (M,4) xyxy -> (N,M).
    Reference: metrics.py:208-236."""
    a1 = box1[:, None, :2]  # (N,1,2)
    a2 = box1[:, None, 2:]
    b1 = box2[None, :, :2]  # (1,M,2)
    b2 = box2[None, :, 2:]
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def bbox_ioa(box1, box2, eps: float = 1e-7):
    """Intersection over box2 area: box1 (4,) vs box2 (N,4) -> (N,).
    Reference: metrics.py:238-260 (used by copy-paste augment)."""
    b1x1, b1y1, b1x2, b1y2 = box1[0], box1[1], box1[2], box1[3]
    b2x1, b2y1, b2x2, b2y2 = box2[:, 0], box2[:, 1], box2[:, 2], box2[:, 3]
    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    area2 = (b2x2 - b2x1) * (b2y2 - b2y1) + eps
    return inter / area2


def wh_iou(wh1, wh2, eps: float = 1e-7):
    """IoU assuming aligned top-left corners: wh1 (N,2) vs wh2 (M,2) -> (N,M).
    Reference: metrics.py:262-270 (anchor matching)."""
    wh1 = wh1[:, None]
    wh2 = wh2[None]
    inter = jnp.minimum(wh1, wh2).prod(2)
    return inter / (wh1.prod(2) + wh2.prod(2) - inter + eps)


def wasserstein_loss(pred, target, eps: float = 1e-7, constant: float = 12.8):
    """NWD similarity exp(-W2/C) of xyxy boxes, elementwise over (..., 4).

    Reference: metrics.py:341-356 (note the reference adds eps to heights
    only — reproduced here for numeric parity).
    """
    w1 = pred[..., 2] - pred[..., 0]
    h1 = pred[..., 3] - pred[..., 1] + eps
    w2 = target[..., 2] - target[..., 0]
    h2 = target[..., 3] - target[..., 1] + eps
    cx1 = (pred[..., 0] + pred[..., 2]) / 2
    cy1 = (pred[..., 1] + pred[..., 3]) / 2
    cx2 = (target[..., 0] + target[..., 2]) / 2
    cy2 = (target[..., 1] + target[..., 3]) / 2
    center_dist = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2 + eps
    wh_dist = ((w1 - w2) ** 2 + (h1 - h2) ** 2) / 4
    return jnp.exp(-jnp.sqrt(center_dist + wh_dist) / constant)


def wasserstein(pred, target, scale1: float = 0.0, eps: float = 1e-7, constant: float = 2.5):
    """Shape-weighted NWD (reference: metrics.py:373-395, selected by the
    `shapeloss` hyp). With scale1=0 the ww/hh weights are both 1."""
    w1 = pred[..., 2] - pred[..., 0]
    h1 = pred[..., 3] - pred[..., 1] + eps
    w2 = target[..., 2] - target[..., 0]
    h2 = target[..., 3] - target[..., 1] + eps
    cx1 = (pred[..., 0] + pred[..., 2]) / 2
    cy1 = (pred[..., 1] + pred[..., 3]) / 2
    cx2 = (target[..., 0] + target[..., 2]) / 2
    cy2 = (target[..., 1] + target[..., 3]) / 2
    w2s = jnp.power(w2, scale1)
    h2s = jnp.power(h2, scale1)
    ww = 2 * w2s / (w2s + h2s)
    hh = 2 * h2s / (w2s + h2s)
    center_dist = hh * (cx1 - cx2) ** 2 + ww * (cy1 - cy2) ** 2 + eps
    wh_dist = ((w1 - w2) ** 2 + (h1 - h2) ** 2) / 4
    return jnp.exp(-jnp.sqrt(center_dist + wh_dist) / constant)


def shape_iou(box1, box2, xywh: bool = True, scale1: float = 0.5, eps: float = 1e-7):
    """Shape-IoU: IoU minus shape-weighted distance and shape terms
    (reference: metrics.py:397-440)."""
    if xywh:
        x1, y1, w1, h1 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        x2, y2, w2, h2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        b1x1, b1x2 = x1 - w1 / 2, x1 + w1 / 2
        b1y1, b1y2 = y1 - h1 / 2, y1 + h1 / 2
        b2x1, b2x2 = x2 - w2 / 2, x2 + w2 / 2
        b2y1, b2y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        b2x1, b2y1, b2x2, b2y2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
        w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    w2s = jnp.power(w2, scale1)
    h2s = jnp.power(h2, scale1)
    ww = 2 * w2s / (w2s + h2s)
    hh = 2 * h2s / (w2s + h2s)
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw**2 + ch**2 + eps
    center_dist = hh * ((b2x1 + b2x2 - b1x1 - b1x2) ** 2) / 4 + ww * (
        (b2y1 + b2y2 - b1y1 - b1y2) ** 2
    ) / 4
    distance = center_dist / c2
    omega_w = hh * jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
    omega_h = ww * jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
    shape_cost = jnp.power(1 - jnp.exp(-omega_w), 4) + jnp.power(1 - jnp.exp(-omega_h), 4)
    return iou - distance - 0.5 * shape_cost


def bbox_inner_iou(box1, box2, xywh: bool = True, ratio: float = 0.7, eps: float = 1e-7):
    """Inner-IoU: IoU of `ratio`-scaled boxes around the same centers
    (reference: metrics.py:604-640 get_inner_iou/bbox_inner_iou) —
    sharper localization gradients for small objects."""
    if xywh:
        x1, y1, w1, h1 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        x2, y2, w2, h2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
    else:
        x1 = (box1[..., 0] + box1[..., 2]) / 2
        y1 = (box1[..., 1] + box1[..., 3]) / 2
        w1 = box1[..., 2] - box1[..., 0]
        h1 = box1[..., 3] - box1[..., 1]
        x2 = (box2[..., 0] + box2[..., 2]) / 2
        y2 = (box2[..., 1] + box2[..., 3]) / 2
        w2 = box2[..., 2] - box2[..., 0]
        h2 = box2[..., 3] - box2[..., 1]
    w1, h1, w2, h2 = w1 * ratio, h1 * ratio, w2 * ratio, h2 * ratio
    b1x1, b1x2 = x1 - w1 / 2, x1 + w1 / 2
    b1y1, b1y2 = y1 - h1 / 2, y1 + h1 / 2
    b2x1, b2x2 = x2 - w2 / 2, x2 + w2 / 2
    b2y1, b2y2 = y2 - h2 / 2, y2 + h2 / 2
    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    return inter / union


def wiou(box1, box2, xywh: bool = True, eps: float = 1e-7):
    """Wise-IoU v1 focusing term: IoU scaled by exp(center distance /
    enclosing-box diagonal) (reference: metrics.py WIoU branch, without the
    running-mean scale state which is a training-loop concern)."""
    iou = bbox_iou(box1, box2, xywh=xywh, eps=eps)
    if xywh:
        cx1, cy1 = box1[..., 0], box1[..., 1]
        cx2, cy2 = box2[..., 0], box2[..., 1]
        b1x1, b1x2 = cx1 - box1[..., 2] / 2, cx1 + box1[..., 2] / 2
        b1y1, b1y2 = cy1 - box1[..., 3] / 2, cy1 + box1[..., 3] / 2
        b2x1, b2x2 = cx2 - box2[..., 2] / 2, cx2 + box2[..., 2] / 2
        b2y1, b2y2 = cy2 - box2[..., 3] / 2, cy2 + box2[..., 3] / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        b2x1, b2y1, b2x2, b2y2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        cx1, cy1 = (b1x1 + b1x2) / 2, (b1y1 + b1y2) / 2
        cx2, cy2 = (b2x1 + b2x2) / 2, (b2y1 + b2y2) / 2
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    import jax as _jax

    dist = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2
    denom = _jax.lax.stop_gradient(cw**2 + ch**2) + eps
    return iou * jnp.exp(dist / denom)
