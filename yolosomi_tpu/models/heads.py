"""Anchor-based detection heads + functional decode.

TPU-native counterpart of the reference's Detect-head family
(/root/reference/models/yolo.py:46-1158). Heads emit raw per-level maps
(B, ny, nx, na, no) with no = nc + 5 and [xy, wh, obj, cls] layout; the
grid decode is a separate pure function (`decode_level` / `decode`) so the
whole inference path jits with static shapes — grids are broadcasted_iota
constants folded by XLA, replacing the reference's cached grid buffers
(yolo.py:67-97).

Decode math (identical for Detect and DecoupledDetect — the reference's
DecoupledDetect folds the -0.5 into its grid, yolo.py:943-983):
    xy = (2*sigmoid(txy) - 0.5 + mesh) * stride
    wh = (2*sigmoid(twh))^2 * anchor_px
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolosomi_tpu.models.layers import Conv, ConvRaw

Dtype = Any


class Detect(nn.Module):
    """Coupled YOLOv5 head: one 1x1 conv per level (reference: yolo.py:46-111).

    `anchors` are per-level pixel-space (w, h) pairs; `strides` the per-level
    downsample factors (filled in by model calibration, yolo.py:1196-1235).
    """

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]  # nl x (na*2) flat pixel anchors
    strides: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            b, ny, nx, _ = x.shape
            y = ConvRaw(self.na * self.no, 1, 1, use_bias=True, dtype=self.dtype, name=f"m{i}")(x)
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs


class Decouple(nn.Module):
    """Decoupled branch head for one level (reference: yolo.py:1042-1074):
    a 1x1 stem, a 2-conv box+obj branch tapering toward na*5 channels, and a
    2-conv class branch at stem width."""

    nc: int
    na: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = min(c1, 256)
        na5 = self.na * 5
        # channel taper c_ -> na*5 in 4 linspace steps; b-branch uses steps 1,2
        # (reference: yolo.py:1049 `c = [int(x + na*5) for x in (c_-na*5)*linspace(1,0,4)]`)
        taper = [int(t * (c_ - na5) + na5) for t in (1.0, 2.0 / 3.0, 1.0 / 3.0, 0.0)]
        b, ny, nx, _ = x.shape

        stem = Conv(c_, 1, dtype=self.dtype, name="a")(x, train)
        # box+obj branch
        r = Conv(taper[1], 3, dtype=self.dtype, name="b1")(stem, train)
        r = Conv(taper[2], 3, dtype=self.dtype, name="b2")(r, train)
        r = ConvRaw(na5, 1, use_bias=True, dtype=self.dtype, name="b3")(r)
        # class branch
        c = Conv(c_, 1, dtype=self.dtype, name="c1")(stem, train)
        c = Conv(c_, 1, dtype=self.dtype, name="c2")(c, train)
        c = ConvRaw(self.na * self.nc, 1, use_bias=True, dtype=self.dtype, name="c3")(c)

        r = r.reshape(b, ny, nx, self.na, 5)
        c = c.reshape(b, ny, nx, self.na, self.nc)
        return jnp.concatenate([r, c], axis=-1)


class DecoupledDetect(nn.Module):
    """The SOMI head: Decouple branch per level (reference: yolo.py:925-1040)."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        return [
            Decouple(self.nc, self.na, dtype=self.dtype, name=f"m{i}")(x, train) for i, x in enumerate(xs)
        ]


def decode_level(p: jax.Array, anchors_px: jax.Array, stride: float) -> jax.Array:
    """Decode one raw level map (B, ny, nx, na, no) to pixel-space boxes.

    Returns (B, ny*nx*na, no) rows [xc, yc, w, h, obj, cls...] — matching the
    reference eval output layout (yolo.py:97), with sigmoid already applied
    to obj/cls.
    """
    b, ny, nx, na, no = p.shape
    y = jax.nn.sigmoid(p.astype(jnp.float32))
    gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    mesh = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # (1, ny, nx, 1, 2)
    xy = (y[..., 0:2] * 2.0 - 0.5 + mesh) * stride
    wh = jnp.square(y[..., 2:4] * 2.0) * anchors_px.reshape(1, 1, 1, na, 2)
    out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
    # flatten (ny, nx, na) row-major: a free reshape. The reference orders
    # rows (na, ny, nx) (yolo.py:97) — NMS and mAP are row-order invariant,
    # and the transpose would materialize a full copy of the decode output.
    return out.reshape(b, ny * nx * na, no)


def decode(preds: Sequence[jax.Array], anchors_px, strides) -> jax.Array:
    """Decode all levels and concat -> (B, sum(na*ny*nx), no)."""
    anchors_px = jnp.asarray(anchors_px, jnp.float32)
    return jnp.concatenate(
        [decode_level(p, anchors_px[i], float(strides[i])) for i, p in enumerate(preds)], axis=1
    )


HEAD_CLASSES = (Detect, DecoupledDetect)


class DFL(nn.Module):
    """Distribution focal decode: softmax over reg_max bins -> expected
    distance (reference: common.py:2449, a frozen arange conv)."""

    reg_max: int = 16

    @nn.compact
    def __call__(self, x):  # (..., 4, reg_max)
        bins = jnp.arange(self.reg_max, dtype=jnp.float32)
        return jnp.sum(jax.nn.softmax(x.astype(jnp.float32), axis=-1) * bins, axis=-1)


class DetectV8(nn.Module):
    """Anchor-free YOLOv8-style head (reference: yolo.py:725 DetectYOLOv8 /
    :187 DetectYOLO8Head): per level a box branch (2 convs -> 4*reg_max)
    and a class branch (2 convs -> nc); DFL decode against cell centers.

    Emits per-level (B, ny, nx, 4*reg_max + nc) raw maps; use
    `decode_v8` for pixel boxes. Training this head needs the
    task-aligned assigner (round-2 item); inference/conversion complete.
    """

    nc: int
    reg_max: int = 16
    strides: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        outs = []
        c2 = max(16, xs[0].shape[-1] // 4, self.reg_max * 4)
        c3 = max(xs[0].shape[-1], min(self.nc, 100))
        for i, x in enumerate(xs):
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = ConvRaw(4 * self.reg_max, 1, use_bias=True, dtype=self.dtype, name=f"cv2_{i}_2")(b)
            c = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            c = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(c, train)
            c = ConvRaw(self.nc, 1, use_bias=True, dtype=self.dtype, name=f"cv3_{i}_2")(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


def decode_v8(preds: Sequence[jax.Array], strides, nc: int, reg_max: int = 16) -> jax.Array:
    """Anchor-free decode: DFL distances from cell centers -> xywh; rows
    [xc, yc, w, h, 1.0, cls...] so the shared NMS path applies (obj == 1,
    reference folds obj into cls for v8 heads)."""
    dfl = DFL(reg_max)
    rows = []
    for i, p in enumerate(preds):
        b, ny, nx, _ = p.shape
        stride = float(strides[i])
        box, cls = p[..., : 4 * reg_max], p[..., 4 * reg_max :]
        dist = dfl.apply({}, box.reshape(b, ny, nx, 4, reg_max))  # (B,ny,nx,4) ltrb
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1) + 0.5
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0) + 0.5
        x1 = gx[None] - dist[..., 0]
        y1 = gy[None] - dist[..., 1]
        x2 = gx[None] + dist[..., 2]
        y2 = gy[None] + dist[..., 3]
        xc = (x1 + x2) / 2 * stride
        yc = (y1 + y2) / 2 * stride
        w = (x2 - x1) * stride
        h = (y2 - y1) * stride
        conf = jax.nn.sigmoid(cls.astype(jnp.float32))
        obj = jnp.ones_like(xc)
        rows.append(
            jnp.stack([xc, yc, w, h, obj], axis=-1).reshape(b, ny * nx, 5)
        )
        rows[-1] = jnp.concatenate([rows[-1], conf.reshape(b, ny * nx, nc)], axis=-1)
    return jnp.concatenate(rows, axis=1)
