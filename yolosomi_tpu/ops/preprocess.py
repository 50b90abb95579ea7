"""On-device preprocessing: normalize + HSV jitter + flips + affine batch ops.

The BASELINE north star moves the reference's host-side augmentation
pipeline (utils/augmentations.py — cv2 LUTs and warps in dataloader
workers) onto the device as fused XLA programs (SURVEY.md §7.1 "input
pipeline on device"): the host only decodes JPEGs and plans the random
parameters; uint8 tensors are shipped once and all pixel math fuses into
the first conv's epilogue.

Functions take uint8 NHWC batches plus per-image parameter vectors so
one compiled program serves every randomness draw (parameters are data,
not constants).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def normalize(images_u8: jax.Array) -> jax.Array:
    """uint8 NHWC -> float32 [0,1] (the .to(device)/255 step, train.py:249).
    Float inputs are assumed already normalized and pass through."""
    if images_u8.dtype == jnp.uint8:
        return images_u8.astype(jnp.float32) / 255.0
    return images_u8.astype(jnp.float32)


def _rgb_to_hsv(rgb: jax.Array):
    """Vectorized RGB->HSV, h in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / d % 6.0, jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0)
    ) / 6.0
    s = d / (mx + 1e-12)
    return h % 1.0, s, mx


def _hsv_to_rgb(h, s, v):
    h6 = h * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter(images: jax.Array, gains: jax.Array) -> jax.Array:
    """HSV gain jitter on float [0,1] RGB images.

    gains: (B, 3) multiplicative (h, s, v) factors around 1 (the r vector
    of reference augment_hsv, augmentations.py:50). Continuous math in
    place of the reference's uint8 LUTs (sub-1% deviation).
    """
    h, s, v = _rgb_to_hsv(images)
    h = (h * gains[:, None, None, 0]) % 1.0
    s = jnp.clip(s * gains[:, None, None, 1], 0.0, 1.0)
    v = jnp.clip(v * gains[:, None, None, 2], 0.0, 1.0)
    return _hsv_to_rgb(h, s, v)


def flips(images: jax.Array, targets: jax.Array, do_lr: jax.Array, do_ud: jax.Array):
    """Per-image flip with label mirroring (reference: datasets.py:652-666).

    do_lr/do_ud: (B,) bool. targets (B, M, 5) normalized [cls,xc,yc,w,h].
    """
    lr = do_lr[:, None, None, None]
    ud = do_ud[:, None, None, None]
    images = jnp.where(lr, images[:, :, ::-1, :], images)
    images = jnp.where(ud, images[:, ::-1, :, :], images)
    valid = targets[..., 0:1] >= 0
    xc = jnp.where(do_lr[:, None] & valid[..., 0], 1.0 - targets[..., 1], targets[..., 1])
    yc = jnp.where(do_ud[:, None] & valid[..., 0], 1.0 - targets[..., 2], targets[..., 2])
    targets = jnp.concatenate([targets[..., 0:1], xc[..., None], yc[..., None], targets[..., 3:5]], -1)
    return images, targets


def affine_batch(images: jax.Array, mats: jax.Array, out_hw: Tuple[int, int], fill: float = 114 / 255) -> jax.Array:
    """Batched inverse-affine warp with bilinear sampling — the device
    analogue of cv2.warpAffine in random_perspective (augmentations.py:125).

    mats: (B, 2, 3) maps OUTPUT pixel coords -> INPUT coords (inverse
    transform). Labels ride the forward matrices on host/in jnp as usual.
    """
    B, H, W, C = images.shape
    Ho, Wo = out_hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 1)
    ones = jnp.ones_like(xs)
    coords = jnp.stack([xs, ys, ones], axis=-1)  # (Ho, Wo, 3)
    src = jnp.einsum("bij,hwj->bhwi", mats, coords)  # (B, Ho, Wo, 2) (x, y)
    px, py = src[..., 0], src[..., 1]

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    out = 0.0
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xc = x0 + dx
        yc = y0 + dy
        w = jnp.abs(1 - jnp.abs(px - xc)) * jnp.abs(1 - jnp.abs(py - yc))
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        flat = yi * W + xi  # (B, Ho, Wo)
        imgf = images.reshape(B, H * W, C)
        tap = jnp.take_along_axis(imgf, flat.reshape(B, -1, 1), axis=1).reshape(B, Ho, Wo, C)
        contrib = jnp.where(inb[..., None], tap, fill)
        out = out + contrib * w[..., None]
    return out


def preprocess_train_batch(images_u8, targets, rng_key, hyp: dict):
    """Fused device-side tail of the train pipeline: normalize + HSV +
    flips. The mosaic/perspective head stays on host for now (its crop
    plan is data-dependent); affine_batch is the building block for
    moving it on-device."""
    B = images_u8.shape[0]
    k1, k2, k3 = jax.random.split(rng_key, 3)
    images = normalize(images_u8)
    gains = 1.0 + jax.random.uniform(
        k1, (B, 3), minval=-1.0, maxval=1.0
    ) * jnp.array([hyp.get("hsv_h", 0.0), hyp.get("hsv_s", 0.0), hyp.get("hsv_v", 0.0)])
    images = hsv_jitter(images, gains)
    do_lr = jax.random.uniform(k2, (B,)) < hyp.get("fliplr", 0.0)
    do_ud = jax.random.uniform(k3, (B,)) < hyp.get("flipud", 0.0)
    return flips(images, targets, do_lr, do_ud)
