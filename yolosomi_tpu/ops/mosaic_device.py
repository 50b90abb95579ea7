"""Device-side mosaic + random_perspective + mixup from a cached dataset.

The TPU-native form of the reference's RAM cache + mosaic pipeline
(reference: utils/datasets.py:732-798 load_mosaic + --cache ram): the
whole train split is uploaded to HBM ONCE as a (N, S, S, 3) uint8 table;
thereafter each batch ships only a few-KB randomness *plan* (tile
indices, the 3x3 inverse perspective matrix, quadrant geometry, mixup
weight) and all pixel work — the 4-tile composite, the perspective warp,
the mixup blend — runs as one fused XLA program feeding the train step.

Why: through a slow host->device link the images dominate the step
(measured: a 29.5 MB b24 640px uint8 batch costs seconds on the tunnel
runtime vs a ~0.3 s train step — PERF.md round-3). On datacenter hosts
it frees the host CPU and PCIe for decode-only work. Labels are planned
on the HOST with the exact numpy geometry of the host pipeline
(data/augment.py perspective_params/warp_labels), so label semantics are
bit-identical to --cache ram training; only pixel resampling differs
(one bilinear warp straight from the source tiles instead of
nearest-paste-then-bilinear-warp through a materialized canvas — equal
away from tile seams, property-tested in tests/test_mosaic_device.py).

Layout notes (TPU): the composite is 4 bilinear taps = 4 batched gathers
from the flat (N*S*S, 3) table — gather indices select tile, row, col in
one fused index computation; per-pixel tile ownership (which quadrant of
the mosaic canvas the inverse-warped coordinate lands in) picks the
per-tile offset/extent via a one-hot (B,H,W,4)x(B,4,F) contraction
instead of per-pixel control flow.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

FILL = 114.0


def build_device_cache(dataset) -> Tuple[np.ndarray, np.ndarray]:
    """Load every train image once, long-side-resized to dataset.img_size
    and top-left anchored in an (N, S, S, 3) uint8 slab (pad = 114, the
    mosaic fill, so out-of-extent bilinear taps match the canvas border).
    Returns (slab, hw) with hw (N, 2) = the resized (h, w) per image."""
    from concurrent.futures import ThreadPoolExecutor

    n, s = len(dataset), dataset.img_size
    slab = np.full((n, s, s, 3), int(FILL), np.uint8)
    hw = np.zeros((n, 2), np.int32)

    def _load(i):
        img, _, (h, w) = dataset.load_image(i)
        slab[i, :h, :w] = img
        hw[i] = (h, w)

    # cv2 decode/resize release the GIL: threads parallelize the build
    with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as pool:
        list(pool.map(_load, range(n)))
    return slab, hw


def _pick(per_tile: jax.Array, onehot: jax.Array) -> jax.Array:
    """(B, 4, F) per-tile params -> (B, H, W, F) per-pixel via the
    ownership one-hot (B, H, W, 4)."""
    return jnp.einsum("bhwk,bkf->bhwf", onehot, per_tile)


def _composite_single(cache_flat: jax.Array, s_cache: int, idx, minv, center, offs, srect,
                      out_size: int, tiles_first: bool = False):
    """One mosaic composite per batch row. All plan tensors carry a
    leading batch dim: idx (B,4) i32, minv (B,3,3), center (B,2),
    offs (B,4,2) (padw,padh), srect (B,4,4) (x1b,y1b,x2b,y2b) source-space
    valid rects. Returns (B, out, out, 3) f32 in [0, 255].

    `tiles_first=True` gathers the 4 source tiles per sample into a
    contiguous (B, 4*S*S, 3) table first (row-sized slices stream well),
    then taps index the small per-sample table with take_along_axis —
    an A/B lowering for the gather-bound composite (probe_mosaic_kernel).
    A windowed single-gather variant (slice_sizes (1,2,2,3)) was tried
    and DROPPED: 4x slower on CPU and uncompilable at train shapes on
    TPU (the (B*S*S,2,2,3) window tensor tiles to a 20 GB allocation)."""
    B = idx.shape[0]
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_size, out_size), 1)

    # output pixel -> mosaic-canvas coords (homogeneous; w==1 for affine)
    def row(r):
        return (minv[:, r, 0, None, None] * xs + minv[:, r, 1, None, None] * ys
                + minv[:, r, 2, None, None])

    cw = row(2)
    cx = row(0) / cw
    cy = row(1) / cw

    # quadrant ownership: TL=0 TR=1 BL=2 BR=3 (load_mosaic tile order)
    k = (cx >= center[:, 0, None, None]).astype(jnp.int32) + 2 * (
        cy >= center[:, 1, None, None]
    ).astype(jnp.int32)
    onehot = jax.nn.one_hot(k, 4, dtype=jnp.float32)  # (B, H, W, 4)

    off = _pick(offs, onehot)          # (B, H, W, 2) padw, padh
    rect = _pick(srect, onehot)        # (B, H, W, 4)
    img_id = jnp.round(_pick(idx[..., None].astype(jnp.float32), onehot)[..., 0]).astype(jnp.int32)

    sx = cx - off[..., 0]
    sy = cy - off[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)

    if tiles_first:
        # (B, 4, S, S, 3) contiguous tile gather, then small-table taps.
        # The quadrant index k replaces img_id in the flat index.
        cache4 = cache_flat.reshape(-1, s_cache, s_cache, 3)
        tiles = jnp.take(cache4, idx.reshape(-1), axis=0).reshape(
            B, 4 * s_cache * s_cache, 3
        )

        def tap_from(base_k, yi, xi):
            flat = base_k * (s_cache * s_cache) + yi * s_cache + xi  # (B, H, W)
            return jnp.take_along_axis(
                tiles, flat.reshape(B, -1, 1), axis=1
            ).reshape(B, out_size, out_size, 3)

        base_sel = k
    else:
        tiles = None
        base_sel = img_id

    acc = jnp.zeros((B, out_size, out_size, 3), jnp.float32)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xt = x0 + dx
        yt = y0 + dy
        w = (1.0 - jnp.abs(sx - xt)) * (1.0 - jnp.abs(sy - yt))
        # texel valid iff inside this tile's pasted source region — texels
        # beyond it are canvas fill (114) in the host pipeline
        v = (xt >= rect[..., 0]) & (xt < rect[..., 2]) & (yt >= rect[..., 1]) & (yt < rect[..., 3])
        xi = jnp.clip(xt, 0, s_cache - 1).astype(jnp.int32)
        yi = jnp.clip(yt, 0, s_cache - 1).astype(jnp.int32)
        if tiles_first:
            tap = tap_from(base_sel, yi, xi)
        else:
            flat = (base_sel * (s_cache * s_cache) + yi * s_cache + xi).reshape(B, -1)
            tap = jnp.take(cache_flat, flat.reshape(-1), axis=0).reshape(B, out_size, out_size, 3)
        acc = acc + w[..., None] * jnp.where(v[..., None], tap.astype(jnp.float32), FILL)
    return acc


def mosaic_mixup_batch(cache: jax.Array, plan: dict, out_size: int) -> jax.Array:
    """Build the augmented batch from the device cache and a host plan.

    plan tensors carry a pair axis (the mixup second mosaic):
      idx (B,2,4) i32, minv (B,2,3,3) f32, center (B,2,2) f32,
      offs (B,2,4,2) f32, srect (B,2,4,4) f32, mixw (B,) f32.
    mixw==1 disables the second composite for that row (plain mosaic or
    letterbox sample). Returns (B, out, out, 3) float32 in [0, 1].
    """
    N, S = cache.shape[0], cache.shape[1]
    cache_flat = cache.reshape(N * S * S, 3)

    def comp(j):
        return _composite_single(
            cache_flat, S, plan["idx"][:, j], plan["minv"][:, j], plan["center"][:, j],
            plan["offs"][:, j], plan["srect"][:, j], out_size,
        )

    a = comp(0)
    w = plan["mixw"][:, None, None, None]
    # skip the second gather pass entirely when no row mixes this batch
    b = jax.lax.cond(jnp.all(plan["mixw"] >= 1.0), lambda: a, lambda: comp(1))
    return (a * w + b * (1.0 - w)) / 255.0
