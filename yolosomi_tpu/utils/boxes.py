"""Box geometry: format conversions, letterbox-inverse rescaling, clipping.

TPU-native counterpart of the reference's box converters
(/root/reference/utils/general.py:532-627). Every function is functional
and works on both numpy arrays (host data pipeline) and jax arrays
(inside jit) — the array namespace is dispatched from the input type.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _xp(x):
    return jnp if isinstance(x, jax.Array) else np


def xyxy2xywh(x):
    """(x1,y1,x2,y2) -> (xc,yc,w,h). Reference: general.py:532."""
    xp = _xp(x)
    xc = (x[..., 0] + x[..., 2]) / 2
    yc = (x[..., 1] + x[..., 3]) / 2
    w = x[..., 2] - x[..., 0]
    h = x[..., 3] - x[..., 1]
    return xp.stack([xc, yc, w, h], axis=-1)


def xywh2xyxy(x):
    """(xc,yc,w,h) -> (x1,y1,x2,y2). Reference: general.py:544."""
    xp = _xp(x)
    hw = x[..., 2] / 2
    hh = x[..., 3] / 2
    return xp.stack(
        [x[..., 0] - hw, x[..., 1] - hh, x[..., 0] + hw, x[..., 1] + hh], axis=-1
    )


def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
    """Normalized (xc,yc,w,h) -> pixel (x1,y1,x2,y2) with optional pad offset.
    Reference: general.py:556."""
    xp = _xp(x)
    return xp.stack(
        [
            w * (x[..., 0] - x[..., 2] / 2) + padw,
            h * (x[..., 1] - x[..., 3] / 2) + padh,
            w * (x[..., 0] + x[..., 2] / 2) + padw,
            h * (x[..., 1] + x[..., 3] / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w=640, h=640, clip=False, eps=0.0):
    """Pixel (x1,y1,x2,y2) -> normalized (xc,yc,w,h). Reference: general.py:568."""
    xp = _xp(x)
    if clip:
        x = clip_coords(x, (h - eps, w - eps))
    return xp.stack(
        [
            ((x[..., 0] + x[..., 2]) / 2) / w,
            ((x[..., 1] + x[..., 3]) / 2) / h,
            (x[..., 2] - x[..., 0]) / w,
            (x[..., 3] - x[..., 1]) / h,
        ],
        axis=-1,
    )


def xyn2xy(x, w=640, h=640, padw=0, padh=0):
    """Normalized segment points -> pixel points. Reference: general.py:581."""
    xp = _xp(x)
    return xp.stack([w * x[..., 0] + padw, h * x[..., 1] + padh], axis=-1)


def clip_coords(boxes, shape):
    """Clip xyxy boxes to image shape (h, w). Reference: general.py:617-626."""
    xp = _xp(boxes)
    h, w = shape[0], shape[1]
    return xp.stack(
        [
            xp.clip(boxes[..., 0], 0, w),
            xp.clip(boxes[..., 1], 0, h),
            xp.clip(boxes[..., 2], 0, w),
            xp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None):
    """Rescale xyxy coords from letterboxed `img1_shape` (h,w) back to the
    native `img0_shape`. Reference: general.py:602-616."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            (img1_shape[1] - img0_shape[1] * gain) / 2,
            (img1_shape[0] - img0_shape[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    xp = _xp(coords)
    out = xp.stack(
        [
            (coords[..., 0] - pad[0]) / gain,
            (coords[..., 1] - pad[1]) / gain,
            (coords[..., 2] - pad[0]) / gain,
            (coords[..., 3] - pad[1]) / gain,
        ],
        axis=-1,
    )
    return clip_coords(out, img0_shape)


def letterbox_params(shape, new_shape=(640, 640), scaleup=True, stride=32, auto=False, scalefill=False):
    """Compute the resize ratio, unpadded size, and padding of a letterbox
    op (the geometry half of reference utils/augmentations.py:92-124).

    Returns (ratio (rw, rh), new_unpad (w, h), (dw, dh)) where dw/dh are the
    *total* padding split evenly left/right and top/bottom.
    """
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:  # minimal rectangle, pad to stride multiple
        dw, dh = dw % stride, dh % stride
    elif scalefill:  # stretch
        dw, dh = 0.0, 0.0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])
    return ratio, new_unpad, (dw / 2, dh / 2)


def segment2box(segment, width=640, height=640):
    """Polygon -> xyxy box of its inside-canvas points (reference:
    general.py:578-583)."""
    x, y = segment.T
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    return (
        np.array([x.min(), y.min(), x.max(), y.max()]) if any(x) else np.zeros((1, 4))
    )


def segments2boxes(segments):
    """Segment polygons -> (n, 4) xywh boxes (reference: general.py:586-592)."""
    boxes = []
    for s in segments:
        x, y = s.T
        boxes.append([x.min(), y.min(), x.max(), y.max()])
    return xyxy2xywh(np.array(boxes))


def resample_segments(segments, n=1000):
    """Up-sample each (m, 2) polygon to n points by linear interpolation
    (reference: general.py:595-600)."""
    for i, s in enumerate(segments):
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        segments[i] = (
            np.concatenate([np.interp(x, xp, s[:, j]) for j in range(2)])
            .reshape(2, -1)
            .T
        )
    return segments


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.1, eps=1e-16):
    """Filter augmented boxes: min size, area ratio, aspect ratio
    (reference: augmentations.py:313-318). box1 = before aug (4,n),
    box2 = after aug (4,n)."""
    xp = _xp(box2)
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = xp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (
        (w2 > wh_thr)
        & (h2 > wh_thr)
        & (w2 * h2 / (w1 * h1 + eps) > area_thr)
        & (ar < ar_thr)
    )
