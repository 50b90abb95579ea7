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
import numpy as np
from flax import linen as nn

from yolosomi_tpu.models.layers import Conv, ConvRaw


def decouple_taper(c_: int, na5: int) -> list:
    """The Decouple branch channel taper (reference: yolo.py:1049
    `[int(x + na*5) for x in (c_-na*5)*torch.linspace(1,0,4)]`).
    torch.linspace(1,0,4) is evaluated in float32 and builds interior
    points symmetrically from both ends with step = f32(1/3); the int()
    truncation is sensitive to those exact f32 values (c_=128 gives
    [128, 91, 56, 20] — NOT 92 as float64 fractions would), so replicate
    the arithmetic bit-for-bit."""
    step = np.float32(1) / np.float32(3)
    vals = (np.float32(1), np.float32(1) - step, step, np.float32(0))
    return [int(np.float32(c_ - na5) * v + np.float32(na5)) for v in vals]

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
        taper = decouple_taper(c_, na5)
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


def decode_boxes_level(p4: jax.Array, anchors_px: jax.Array, stride: float) -> jax.Array:
    """The box-decode core: sigmoided first-4 channels of a raw level map
    (B, ny, nx, na, >=4) -> pixel-space xywh (B, ny, nx, na, 4). Single
    source of truth for the decode convention (eval decode + the
    distillation box-imitation term use this same geometry)."""
    b, ny, nx, na = p4.shape[:4]
    y = jax.nn.sigmoid(p4[..., :4].astype(jnp.float32))
    gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    mesh = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # (1, ny, nx, 1, 2)
    xy = (y[..., 0:2] * 2.0 - 0.5 + mesh) * stride
    wh = jnp.square(y[..., 2:4] * 2.0) * anchors_px.reshape(1, 1, 1, na, 2)
    return jnp.concatenate([xy, wh], axis=-1)


def decode_level(p: jax.Array, anchors_px: jax.Array, stride: float) -> jax.Array:
    """Decode one raw level map (B, ny, nx, na, no) to pixel-space boxes.

    Returns (B, ny*nx*na, no) rows [xc, yc, w, h, obj, cls...] — matching the
    reference eval output layout (yolo.py:97), with sigmoid already applied
    to obj/cls.
    """
    b, ny, nx, na, no = p.shape
    boxes = decode_boxes_level(p, anchors_px, stride)
    rest = jax.nn.sigmoid(p[..., 4:].astype(jnp.float32))
    out = jnp.concatenate([boxes, rest], axis=-1)
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
    `decode_v8` for pixel boxes. Trains end-to-end through the
    task-aligned assigner (losses_v8.ComputeLossV8).
    """

    nc: int
    reg_max: int = 16
    strides: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        outs = []
        c2 = max(16, xs[0].shape[-1] // 4, self.reg_max * 4)
        # both reference v8 heads use the UNCAPPED max(ch[0], nc)
        # (yolo.py:204,741); only DetectYolov11 caps at min(nc, 100)
        c3 = max(xs[0].shape[-1], self.nc)
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


# ---------------------------------------------------------------------------
# YOLOv7 implicit heads (reference: yolo.py:382 IDetect, :506 IAuxDetect)
# ---------------------------------------------------------------------------


class ImplicitA(nn.Module):
    """Learnable additive implicit knowledge (reference: common.py:7741)."""

    mean: float = 0.0
    std: float = 0.02

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        imp = self.param(
            "implicit", lambda k: self.mean + self.std * jax.random.normal(k, (1, 1, 1, c))
        )
        return x + imp.astype(x.dtype)


class ImplicitM(nn.Module):
    """Learnable multiplicative implicit knowledge (reference: common.py:7754)."""

    mean: float = 1.0
    std: float = 0.02

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        imp = self.param(
            "implicit", lambda k: self.mean + self.std * jax.random.normal(k, (1, 1, 1, c))
        )
        return x * imp.astype(x.dtype)


class IDetect(nn.Module):
    """YOLOv7 implicit-knowledge head (reference: yolo.py:382-503):
    ImplicitA -> 1x1 pred conv -> ImplicitM per level. At inference the
    reference folds ia into the conv bias and im into weight+bias
    (`fuse`, yolo.py:475-489) — an algebraic identity, so here the
    implicit params simply stay applied and XLA fuses the adds/muls."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0]) // 2

    @property
    def no(self):
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            b, ny, nx, _ = x.shape
            y = ImplicitA(name=f"ia{i}")(x)
            y = ConvRaw(self.na * self.no, 1, 1, use_bias=True, dtype=self.dtype, name=f"m{i}")(y)
            y = ImplicitM(name=f"im{i}")(y)
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs


class IAuxDetect(nn.Module):
    """YOLOv7 auxiliary-head variant (reference: yolo.py:506-628): the
    first nl inputs get the implicit lead head, the second nl inputs a
    plain 1x1 aux head. Training emits 2*nl maps (lead + aux; the loss
    weights aux maps 0.25); eval emits only the nl lead maps."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0]) // 2

    @property
    def no(self):
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        nl = self.nl
        assert len(xs) == 2 * nl, f"IAuxDetect wants 2*nl={2 * nl} inputs, got {len(xs)}"
        lead = []
        for i in range(nl):
            x = xs[i]
            b, ny, nx, _ = x.shape
            y = ImplicitA(name=f"ia{i}")(x)
            y = ConvRaw(self.na * self.no, 1, 1, use_bias=True, dtype=self.dtype, name=f"m{i}")(y)
            y = ImplicitM(name=f"im{i}")(y)
            lead.append(y.reshape(b, ny, nx, self.na, self.no))
        # aux branch params must exist at init regardless of mode (flax
        # creates params lazily on first call); at eval the aux maps are
        # dropped from the return, so XLA dead-code-eliminates the convs.
        aux = []
        for i in range(nl):
            x = xs[nl + i]
            b, ny, nx, _ = x.shape
            y = ConvRaw(self.na * self.no, 1, 1, use_bias=True, dtype=self.dtype, name=f"m2_{i}")(x)
            aux.append(y.reshape(b, ny, nx, self.na, self.no))
        return lead + aux if train else lead


# ---------------------------------------------------------------------------
# ASFF head (reference: yolo.py:172 ASFF_Detect, common.py:5500 ASFF)
# ---------------------------------------------------------------------------


def _maxpool2(x):
    """3x3/s2 max pool, symmetric pad 1 (reference: F.max_pool2d(x,3,2,1)).
    NOT "SAME": for even inputs SAME pads (0,1) and shifts every window by
    one pixel vs torch's (1,1) — caught by the ASFF_Detect oracle."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    ).astype(x.dtype)


def _nearest_up(x, s: int):
    return jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)


def _leaky01(t):
    """LeakyReLU(0.1): the activation of the reference's add_conv blocks
    (common.py:5340) that ASFF is built from — NOT SiLU."""
    return jax.nn.leaky_relu(t, negative_slope=0.1)


class ASFF(nn.Module):
    """Adaptively spatial feature fusion at one pyramid level (reference:
    common.py:5500-5568). Level 0 is the deepest map. The reference
    hardcodes dims [512,256,128]; here the level's own channel count is
    the fusion width, so the module is width-multiple-safe. All convs are
    add_conv blocks (conv+BN+LeakyReLU(0.1), common.py:5322-5344)."""

    level: int
    compress_c: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        x0, x1, x2 = xs  # deepest -> shallowest
        c = x0.shape[-1] if self.level == 0 else (x1.shape[-1] if self.level == 1 else x2.shape[-1])
        if self.level == 0:
            r0 = x0
            r1 = Conv(c, 3, 2, act=_leaky01, dtype=self.dtype, name="stride_level_1")(x1, train)
            r2 = Conv(c, 3, 2, act=_leaky01, dtype=self.dtype, name="stride_level_2")(_maxpool2(x2), train)
        elif self.level == 1:
            r0 = _nearest_up(Conv(c, 1, 1, act=_leaky01, dtype=self.dtype, name="compress_level_0")(x0, train), 2)
            r1 = x1
            r2 = Conv(c, 3, 2, act=_leaky01, dtype=self.dtype, name="stride_level_2")(x2, train)
        else:
            r0 = _nearest_up(Conv(c, 1, 1, act=_leaky01, dtype=self.dtype, name="compress_level_0")(x0, train), 4)
            r1 = _nearest_up(Conv(c, 1, 1, act=_leaky01, dtype=self.dtype, name="compress_level_1")(x1, train), 2)
            r2 = x2
        w = jnp.concatenate(
            [
                Conv(self.compress_c, 1, 1, act=_leaky01, dtype=self.dtype, name="weight_level_0")(r0, train),
                Conv(self.compress_c, 1, 1, act=_leaky01, dtype=self.dtype, name="weight_level_1")(r1, train),
                Conv(self.compress_c, 1, 1, act=_leaky01, dtype=self.dtype, name="weight_level_2")(r2, train),
            ],
            axis=-1,
        )
        w = ConvRaw(3, 1, 1, use_bias=True, dtype=self.dtype, name="weight_levels")(w)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(r0.dtype)
        fused = r0 * w[..., 0:1] + r1 * w[..., 1:2] + r2 * w[..., 2:3]
        return Conv(c, 3, 1, act=_leaky01, dtype=self.dtype, name="expand")(fused, train)


class ASFFDetect(nn.Module):
    """Detect with per-level ASFF fusion (reference: yolo.py:172-185).
    The reference fuses sequentially in reversed order — each later ASFF
    consumes the already-fused earlier levels — reproduced here."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0]) // 2

    @property
    def no(self):
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        assert len(xs) == 3, "ASFF_Detect is a 3-level head (reference: common.py:5500)"
        rev = list(xs[::-1])  # deepest first
        for i in range(self.nl):
            rev[i] = ASFF(level=i, dtype=self.dtype, name=f"asff{i}")(rev, train)
        outs = []
        for i, x in enumerate(rev[::-1]):
            b, ny, nx, _ = x.shape
            y = ConvRaw(self.na * self.no, 1, 1, use_bias=True, dtype=self.dtype, name=f"m{i}")(x)
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs


# ---------------------------------------------------------------------------
# CLLA head (reference: yolo.py:258-380)
# ---------------------------------------------------------------------------


class CLLA(nn.Module):
    """Cross-layer local attention (reference: yolo.py:258-300): queries
    from the coarse map x2 attend over a range x range window of the
    2x-finer map x1 (strided taps = space-to-depth), with the reference's
    inverted-relevance softmax (2*mean - dots)."""

    range_: int = 2
    c: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array):
        r = self.range_
        b, h2, w2, c = x2.shape
        pad = int(r / 2 - 1)
        x1p = jnp.pad(x1, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        taps = []
        for i in range(r):
            for j in range(r):
                taps.append(x1p[:, i::2, j::2][:, :h2, :w2])
        local = jnp.stack(taps, axis=3)  # (b, h2, w2, r*r, c)

        q = nn.Dense(c, dtype=self.dtype, name="q")(x2)[:, :, :, None, :]
        k = nn.Dense(c, dtype=self.dtype, name="k")(local)
        v = nn.Dense(c, dtype=self.dtype, name="v")(local)
        dots = jnp.sum(q * k / r, axis=-1)  # (b, h2, w2, r*r)
        irr = jnp.mean(dots, axis=3, keepdims=True) * 2 - dots
        att = jax.nn.softmax(irr.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.sum(v * att[..., None], axis=3)
        return (out + x2) / 2


class CLLABlock(nn.Module):
    """1x1-project both maps to `c`, CLLA-fuse, 1x1 predict
    (reference: yolo.py:303-323)."""

    out: int
    c: int = 256
    range_: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        a = ConvRaw(self.c, 1, 1, use_bias=True, dtype=self.dtype, name="conv1")(x1)
        bmap = ConvRaw(self.c, 1, 1, use_bias=True, dtype=self.dtype, name="conv2")(x2)
        f = CLLA(range_=self.range_, c=self.c, dtype=self.dtype, name="att")(a, bmap)
        return ConvRaw(self.out, 1, 1, use_bias=True, dtype=self.dtype, name="det")(f)


class CLLADetect(nn.Module):
    """Detect head whose finest level is a CLLA fusion of the two finest
    input maps (reference: yolo.py:325-380): level 0 = CLLABlock(x0, x1)
    at x1's resolution; level i>0 = 1x1 conv of x[i+1]. Takes nl+1
    feature maps; detection strides are those of inputs 1..nl."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0]) // 2

    @property
    def no(self):
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        assert len(xs) == self.nl + 1, f"CLLADetect wants nl+1={self.nl + 1} inputs"
        outs = []
        p0 = CLLABlock(out=self.no * self.na, c=xs[0].shape[-1], dtype=self.dtype, name="det")(
            xs[0], xs[1]
        )
        b, ny, nx, _ = p0.shape
        outs.append(p0.reshape(b, ny, nx, self.na, self.no))
        for i in range(1, self.nl):
            x = xs[i + 1]
            b, ny, nx, _ = x.shape
            y = ConvRaw(self.na * self.no, 1, 1, use_bias=True, dtype=self.dtype, name=f"m{i - 1}")(x)
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs


# ---------------------------------------------------------------------------
# TSCODE head (reference: yolo.py:631-722; SCE/DPE common.py:7770-7806)
# ---------------------------------------------------------------------------


class SCE(nn.Module):
    """Semantic context encoding: downsample the level and concat with the
    next-coarser map (reference: common.py:7770)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x_p1, x_p2 = xs
        d = Conv(x_p1.shape[-1], 3, 2, dtype=self.dtype, name="down")(x_p1, train)
        return jnp.concatenate([d, x_p2], axis=-1)


class DPE(nn.Module):
    """Detail-preserving encoding over (finer, level, coarser)
    (reference: common.py:7781-7806)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        f, m, c = xs
        x_p2 = Conv(self.c2, 1, dtype=self.dtype, name="adjust_channel_forp2")(m, train)
        up2 = Conv(self.c2, 1, dtype=self.dtype, name="up_forp2")(_nearest_up(x_p2, 2), train)
        x_p1 = Conv(self.c2, 1, dtype=self.dtype, name="adjust_channel_forp1")(f, train) + up2
        x_p1 = Conv(self.c2, 3, 2, dtype=self.dtype, name="down")(x_p1, train)
        x_p3 = Conv(self.c2, 1, dtype=self.dtype, name="up_forp3")(_nearest_up(c, 2), train)
        return x_p1 + x_p2 + x_p3


class TSCODEDetect(nn.Module):
    """Task-separate context-decoupled head (reference: yolo.py:631-722).
    Takes nl+2 maps; detection level i (stride of input i+1) predicts
    cls from SCE at half resolution, pixel-shuffled back up (ph=pw=2),
    and box+obj from DPE at full resolution. Requires na == nl*... —
    the reference's rearrange implies na == nl (both 3 in its configs);
    here cls channels are na*nc*4 shuffled to (2h, 2w) per anchor."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0]) // 2

    @property
    def no(self):
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        assert len(xs) == self.nl + 2, f"TSCODE_Detect wants nl+2={self.nl + 2} inputs"
        outs = []
        for i in range(self.nl):
            idx = i + 1
            x = xs[idx]
            b, ny, nx, cch = x.shape
            x_sce = SCE(dtype=self.dtype, name=f"m_sce{i}")(xs[idx : idx + 2], train)
            x_dpe = DPE(c2=cch, dtype=self.dtype, name=f"m_dpe{i}")(xs[idx - 1 : idx + 2], train)

            # cls branch at half resolution, pixel-shuffled up 2x2
            c_ = Conv(cch, 1, dtype=self.dtype, name=f"m_cls{i}_0")(x_sce, train)
            c_ = Conv(cch, 3, dtype=self.dtype, name=f"m_cls{i}_1")(c_, train)
            c_ = ConvRaw(self.na * self.nc * 4, 1, use_bias=True, dtype=self.dtype, name=f"m_cls{i}_2")(c_)
            hh, ww = c_.shape[1:3]
            # (b, h, w, na*2*2*nc) -> (b, h*2, w*2, na, nc): reference
            # rearrange 'bs (nl ph pw nc) h w -> bs nl nc (h ph) (w pw)'
            c_ = c_.reshape(b, hh, ww, self.na, 2, 2, self.nc)
            c_ = c_.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hh * 2, ww * 2, self.na, self.nc)
            c_ = c_[:, :ny, :nx]

            r = Conv(cch, 3, dtype=self.dtype, name=f"m_reg_conf{i}_0")(x_dpe, train)
            r = Conv(cch, 3, dtype=self.dtype, name=f"m_reg_conf{i}_1")(r, train)
            reg = ConvRaw(self.na * 4, 1, use_bias=True, dtype=self.dtype, name=f"m_reg{i}")(r)
            conf = ConvRaw(self.na, 1, use_bias=True, dtype=self.dtype, name=f"m_conf{i}")(r)
            reg = reg.reshape(b, ny, nx, self.na, 4)
            conf = conf.reshape(b, ny, nx, self.na, 1)
            outs.append(jnp.concatenate([reg, conf, c_], axis=-1))
        return outs


# ---------------------------------------------------------------------------
# v11 head (reference: yolo.py:778-922) — SEAM cls branch, optional
# NMS-free end2end path
# ---------------------------------------------------------------------------


class DetectV11(nn.Module):
    """Anchor-free v11 head (reference: yolo.py:778): v8 box branch +
    SEAM-augmented class branch. With end2end=True a detached one2one
    copy is also evaluated (reference: forward_end2end, yolo.py:828-851)
    whose decoded output feeds the NMS-free `postprocess_end2end`."""

    nc: int
    reg_max: int = 16
    strides: Tuple[int, ...] = ()
    end2end: bool = False
    dtype: Dtype = jnp.float32

    def _branches(self, xs, train, prefix=""):
        from yolosomi_tpu.models.layers import SEAM

        outs = []
        c2 = max(16, xs[0].shape[-1] // 4, self.reg_max * 4)
        c3 = max(xs[0].shape[-1], min(self.nc, 100))
        for i, x in enumerate(xs):
            b = Conv(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_0")(x, train)
            b = Conv(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_1")(b, train)
            b = ConvRaw(4 * self.reg_max, 1, use_bias=True, dtype=self.dtype, name=f"{prefix}cv2_{i}_2")(b)
            c = Conv(c3, 3, dtype=self.dtype, name=f"{prefix}cv3_{i}_0")(x, train)
            c = SEAM(n=1, reduction=16, dtype=self.dtype, name=f"{prefix}cv3_{i}_1")(c, train)
            c = ConvRaw(self.nc, 1, use_bias=True, dtype=self.dtype, name=f"{prefix}cv3_{i}_2")(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        one2many = self._branches(xs, train)
        if not self.end2end:
            return one2many
        detached = [jax.lax.stop_gradient(x) for x in xs]
        one2one = self._branches(detached, train, prefix="one2one_")
        if train:
            return {"one2many": one2many, "one2one": one2one}
        return one2one


def postprocess_end2end(pred_rows: jax.Array, max_det: int, nc: int) -> jax.Array:
    """NMS-free top-k selection (reference: yolo.py:900-922 postprocess).

    pred_rows: (B, N, 4+nc) decoded [x, y, w, h, cls...] (no obj column).
    Returns (B, max_det, 6) rows [x, y, w, h, score, cls]."""
    b, n, _ = pred_rows.shape
    boxes, scores = pred_rows[..., :4], pred_rows[..., 4:]
    k = min(max_det, n)
    best = jnp.max(scores, axis=-1)
    _, idx = jax.lax.top_k(best, k)
    boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    scores = jnp.take_along_axis(scores, idx[..., None], axis=1)
    flat_scores, flat_idx = jax.lax.top_k(scores.reshape(b, -1), k)
    sel_boxes = jnp.take_along_axis(boxes, (flat_idx // nc)[..., None], axis=1)
    cls = (flat_idx % nc).astype(jnp.float32)
    return jnp.concatenate([sel_boxes, flat_scores[..., None], cls[..., None]], axis=-1)


class DetectODConvHead(nn.Module):
    """Detect with ODConv 1x1 prediction convs (reference: yolo.py:112)."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def nl(self):
        return len(self.anchors)

    @property
    def na(self):
        return len(self.anchors[0]) // 2

    @property
    def no(self):
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        from yolosomi_tpu.models.layers import ODConv2d

        outs = []
        for i, x in enumerate(xs):
            b, ny, nx, _ = x.shape
            y = ODConv2d(self.na * self.no, 1, 1, dtype=self.dtype, name=f"m{i}")(x, train)
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs


class Proto(nn.Module):
    """YOLOv5-seg mask prototype branch: conv, 2x upsample, conv, project
    to nm prototype maps (upstream yolov5 models/common.py Proto — the
    reference pulls Segment in via `from ultralytics.nn.modules import *`,
    yolo.py:29, and wires it at yolo.py:1620)."""

    npr: int = 256
    nm: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.npr, 3, dtype=self.dtype, name="cv1")(x, train)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        x = Conv(self.npr, 3, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.nm, 1, dtype=self.dtype, name="cv3")(x, train)


class Segment(nn.Module):
    """Instance-segmentation head: Detect with nm mask coefficients per
    anchor + a Proto branch on the finest level (upstream yolov5-seg
    Segment; reference registration: yolo.py:1616-1621, args
    [nc, anchors, nm, npr]).

    Returns (levels, proto): levels are (B, ny, nx, na, 5+nc+nm) raw maps
    (decode with decode_level — the trailing nm channels pass through as
    mask coefficients); proto is (B, 2*H0, 2*W0, nm). The reference ships
    no segmentation loss or dataloader (ComputeLoss is box-only), so this
    head is inference/fine-tune surface parity; crop+sigmoid mask assembly
    lives in `assemble_masks`."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]
    strides: Tuple[int, ...] = ()
    nm: int = 32
    npr: int = 256
    dtype: Dtype = jnp.float32

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5 + self.nm

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        proto = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        outs = []
        for i, x in enumerate(xs):
            b, ny, nx, _ = x.shape
            y = ConvRaw(self.na * self.no, 1, 1, use_bias=True, dtype=self.dtype, name=f"m{i}")(x)
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs, proto


def assemble_masks(proto: jax.Array, coeffs: jax.Array, boxes_xyxy: jax.Array) -> jax.Array:
    """Combine prototype maps with per-detection coefficients and crop to
    boxes (upstream yolov5 utils/segment/general.py process_mask).

    proto: (Hm, Wm, nm); coeffs: (N, nm); boxes_xyxy: (N, 4) in mask-map
    pixel coords. Returns (N, Hm, Wm) sigmoid masks zeroed outside boxes.
    """
    hm, wm, nm = proto.shape
    masks = jax.nn.sigmoid(jnp.einsum("hwc,nc->nhw", proto, coeffs))
    ys = jnp.arange(hm, dtype=boxes_xyxy.dtype)[None, :, None]
    xs = jnp.arange(wm, dtype=boxes_xyxy.dtype)[None, None, :]
    x1, y1, x2, y2 = (boxes_xyxy[:, i][:, None, None] for i in range(4))
    inside = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    return masks * inside
