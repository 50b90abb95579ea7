"""Test-time augmentation: multi-scale + flip inference with de-scaling.

Counterpart of the reference's Model._forward_augment / _descale_pred /
_clip_augmented (models/yolo.py:1253-1317): three passes at scales
(1, 0.83, 0.67) with (none, lr-flip, none), decoded boxes de-scaled and
un-flipped, then per-scale anchor-tail clipping (the full-resolution pass
keeps large boxes clipped off, the small pass drops the P3 head rows).

Each scale is its own jitted program (static shapes); results concat on
the host side of the padded detection axis.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp

TTA_SCALES = (1.0, 0.83, 0.67)
TTA_FLIPS = (None, "lr", None)


def scale_img(img: jax.Array, ratio: float, gs: int = 32, pad_value: float = 0.447) -> jax.Array:
    """Resize NHWC batch by ratio and pad to gs-multiple canvas
    (reference: torch_utils.py scale_img)."""
    if ratio == 1.0:
        return img
    b, h, w, c = img.shape
    nh, nw = int(h * ratio), int(w * ratio)
    out = jax.image.resize(img, (b, nh, nw, c), method="bilinear")
    ph = math.ceil(h * ratio / gs) * gs - nh
    pw = math.ceil(w * ratio / gs) * gs - nw
    return jnp.pad(out, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=pad_value)


def descale_pred(pred: jax.Array, flip: str | None, scale: float, img_w: int) -> jax.Array:
    """Undo scale and flip on decoded rows (B, N, no) [xc,yc,w,h,...]
    (reference: yolo.py:1292-1306)."""
    xy = pred[..., :2] / scale
    wh = pred[..., 2:4] / scale
    if flip == "lr":
        xy = jnp.stack([img_w - xy[..., 0], xy[..., 1]], axis=-1)
    elif flip == "ud":
        raise NotImplementedError
    return jnp.concatenate([xy, wh, pred[..., 4:]], axis=-1)


def clip_augmented(rows: List[jax.Array], nl: int) -> List[jax.Array]:
    """Clip anchor tails of the first/last scale (reference: yolo.py:1308-1317)."""
    g = sum(4**x for x in range(nl))
    e = 1
    i = (rows[0].shape[1] // g) * sum(4**x for x in range(e))
    rows[0] = rows[0][:, : rows[0].shape[1] - i]
    i = (rows[-1].shape[1] // g) * sum(4 ** (nl - 1 - x) for x in range(e))
    rows[-1] = rows[-1][:, i:]
    return rows


def forward_augment(apply_decode, images: jax.Array, nl: int, gs: int = 32) -> jax.Array:
    """Run TTA over `apply_decode(images) -> (B, N, no)` decoded rows.

    Returns concatenated (B, N_total, no) rows in the original image frame.
    """
    img_w = images.shape[2]
    rows = []
    for scale, flip in zip(TTA_SCALES, TTA_FLIPS):
        xi = images[:, :, ::-1, :] if flip == "lr" else images
        xi = scale_img(xi, scale, gs=gs)
        yi = apply_decode(xi)
        rows.append(descale_pred(yi, flip, scale, img_w))
    rows = clip_augmented(rows, nl)
    return jnp.concatenate(rows, axis=1)
