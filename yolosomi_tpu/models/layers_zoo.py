"""Tier-3 module zoo, TPU-native (flax.linen, NHWC).

Completes the reference's YAML-addressable module inventory (the ~50
classes reachable from parse_model, /root/reference/models/yolo.py:1472-1650,
that were not yet in layers.py). Same conventions as layers.py: NHWC,
lazy input channels, `__call__(x, train)`, BatchNorm via `batch_stats`.

Reference channel-tracking defects reproduced *behaviorally* (the module
computes what the torch code computes) but with honest channel metadata —
where the reference's parse_model records a c2 that the module does not
actually produce, the registry kind in yolo.py tracks the real output
channels and the docstring records the deviation:
- ConvMix (common.py:7149): `dim1` arg is unused; output channels == input.
- Conv2Former (common.py:2428): ConvBlock's MLP projects back to c1, so
  output channels == input channels regardless of the declared c2.
- CShortcut (yolo.py:1592): reference records c2 = sum(ch) for an
  elementwise add; real output channels == ch of the first input.
- C3CBAM (common.py:494): despite the name it is a plain CBAM attention
  (channel-preserving), not a C3; the (c1, c2) args are ignored.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolosomi_tpu.models.layers import (
    BN_EPS,
    BN_MOMENTUM,
    KERNEL_INIT,
    BAM,
    CBAMBottleneck,
    ChannelAttentionModule,
    Conv,
    ConvRaw,
    GSConv,
    SimAM,
    SpatialAttentionModule,
    autopad,
    _pair,
)

Dtype = Any


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _bn(dtype, name, train):
    return nn.BatchNorm(
        use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=dtype, name=name
    )


def max_pool_same(x, k: int, s: int = 1):
    """torch MaxPool2d(k, s, padding=k//2) equivalent."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(s, s), padding=((p, p), (p, p)))


def avg_pool_same(x, k: int, s: int = 1):
    p = k // 2
    return nn.avg_pool(x, (k, k), strides=(s, s), padding=((p, p), (p, p)), count_include_pad=False)


def bilinear_align_corners(x, out_hw: Tuple[int, int]):
    """F.interpolate(mode='bilinear', align_corners=True) equivalent.

    jax.image.resize uses half-pixel centers (align_corners=False), so SDI/
    BiFPNSDI (reference common.py:8658/3707) need this explicit separable
    gather-lerp with scale = (in-1)/(out-1).
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def lerp_axis(v, size_in, size_out, axis):
        if size_out == 1 or size_in == 1:
            idx = jnp.zeros((size_out,), jnp.int32)
            return jnp.take(v, idx, axis=axis)
        pos = jnp.arange(size_out, dtype=jnp.float32) * (size_in - 1) / (size_out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size_in - 1)
        t = (pos - lo.astype(jnp.float32)).astype(v.dtype)
        shape = [1] * v.ndim
        shape[axis] = size_out
        t = t.reshape(shape)
        return jnp.take(v, lo, axis=axis) * (1 - t) + jnp.take(v, hi, axis=axis) * t

    x = lerp_axis(x, h, oh, 1)
    x = lerp_axis(x, w, ow, 2)
    return x


def adaptive_avg_pool(x, out_hw: Tuple[int, int]):
    """F.adaptive_avg_pool2d for integer-ratio shrinks (the FPN case)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        return nn.avg_pool(x, (kh, kw), strides=(kh, kw))
    # general fallback: area-style via bilinear on the averaged grid
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


def resize_to(x, out_hw: Tuple[int, int], align_corners: bool = True):
    """Shrink via adaptive avg pool, grow via bilinear — the SDI recipe."""
    h, w = x.shape[1:3]
    if h > out_hw[0]:
        return adaptive_avg_pool(x, out_hw)
    if h < out_hw[0]:
        if align_corners:
            return bilinear_align_corners(x, out_hw)
        b, _, _, c = x.shape
        return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="linear")
    return x


# ---------------------------------------------------------------------------
# simple conv variants
# ---------------------------------------------------------------------------


class SimConv(nn.Module):
    """Conv + BN + ReLU (reference: common.py:1864)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvRaw(self.c2, self.k, self.s, g=self.g, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = _bn(self.dtype, "bn", train)(x)
        return nn.relu(x)


class BasicConvB(nn.Module):
    """Conv (+BN) (+ReLU), torch-BasicConv semantics (reference: common.py:3108)."""

    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: int = 1
    p: Union[int, Tuple[int, int]] = 0
    d: int = 1
    g: int = 1
    relu: bool = True
    bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvRaw(
            self.c2, self.k, self.s, p=self.p, g=self.g, d=self.d,
            use_bias=not self.bn, dtype=self.dtype, name="conv",
        )(x)
        if self.bn:
            x = _bn(self.dtype, "bn", train)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class CoordConv(nn.Module):
    """Concat normalized (h, w) coordinate channels, then Conv
    (reference: common.py:7411 + AddCoords :7370)."""

    c2: int
    k: int = 1
    s: int = 1
    with_r: bool = False
    d: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        hh = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)[None, :, None, None]
        ww = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)[None, None, :, None]
        coords = [jnp.broadcast_to(hh, (b, h, w, 1)), jnp.broadcast_to(ww, (b, h, w, 1))]
        if self.with_r:
            rr = jnp.sqrt((coords[0] - 0.5) ** 2 + (coords[1] - 0.5) ** 2)
            coords.append(rr)
        x = jnp.concatenate([x] + coords, axis=-1)
        return Conv(self.c2, self.k, self.s, d=self.d, dtype=self.dtype, name="conv")(x, train)


class CoordConvd(CoordConv):
    """CoordConv with dilation 2 (reference: common.py:9139)."""

    d: int = 2


class ADown(nn.Module):
    """YOLOv9 downsample: 2x2 avgpool(s1) then split-channel conv/maxpool
    branches (reference: common.py:99)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        # torch avg_pool2d(x, 2, 1, 0): valid window, spatial H-1
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        c1h = x.shape[-1] // 2
        x1, x2 = x[..., :c1h], x[..., c1h:]
        x1 = Conv(c, 3, 2, dtype=self.dtype, name="cv1")(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x2 = Conv(c, 1, 1, p=0, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class DownSimper(nn.Module):
    """Conv + pooled-split downsample, output c2 = c2//2 + 2*(c2//4)
    (reference: common.py:4427)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        x1 = Conv(c, 3, 2, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c, 1, 1, p=0, dtype=self.dtype, name="cv2")(x, train)
        half = y.shape[-1] // 2
        x2 = nn.max_pool(y[..., :half], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x3 = nn.avg_pool(y[..., half:], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return jnp.concatenate([x1, x2, x3], axis=-1)


class ConvTransposeLayer(nn.Module):
    """ConvTranspose2d + BN + SiLU (reference: common.py:2600)."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d(k, s, p) output: (H-1)*s - 2p + k
        pad = ((self.k - 1 - self.p, self.k - 1 - self.p),) * 2
        x = nn.ConvTranspose(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=pad,
            use_bias=not self.bn,
            dtype=self.dtype,
            kernel_init=KERNEL_INIT,
            name="conv",
        )(x)
        if self.bn:
            x = _bn(self.dtype, "bn", train)(x)
        if self.act is True:
            x = nn.silu(x)
        elif callable(self.act):
            x = self.act(x)
        return x


class DWConvTranspose2d(nn.Module):
    """Depthwise ConvTranspose2d (reference: common.py's DWConvTranspose2d,
    groups == gcd(c1, c2); raw, bias, no BN/act)."""

    c2: int
    k: int = 1
    s: int = 1
    p1: int = 0
    p2: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _m

        c1 = x.shape[-1]
        g = _m.gcd(c1, self.c2)
        # flax ConvTranspose has no feature groups; use the fractionally-
        # strided-conv identity: lhs_dilation=s, pad k-1-p, flipped kernel
        w = self.param("kernel", KERNEL_INIT, (self.k, self.k, c1 // g, self.c2), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32)
        pad_lo = self.k - 1 - self.p1
        pad_hi = self.k - 1 - self.p1 + self.p2
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(w.astype(x.dtype), (0, 1)),
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(self.s, self.s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g,
        )
        return y + b.astype(y.dtype)


class BatchNorm2d(nn.Module):
    """Standalone BatchNorm row (reference parse_model yolo.py:1493)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _bn(self.dtype, "bn", train)(x)


# ---------------------------------------------------------------------------
# SPP family
# ---------------------------------------------------------------------------


class ASPP(nn.Module):
    """Atrous SPP: 1x1 reduce, parallel dilated 3x3s + maxpool, 1x1 merge
    (reference: common.py:1829)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [x, max_pool_same(x, 3, 1)]
        for i, kk in enumerate(self.k):
            d = (kk - 1) // 2
            ys.append(
                ConvRaw(c_, 3, 1, p=d, d=d, use_bias=False, dtype=self.dtype, name=f"m{i}")(x)
            )
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class SPPELAN(nn.Module):
    """YOLOv9 SPP-ELAN: 1x1 to c3, three chained 5x5 maxpools, concat
    (reference: common.py:2521)."""

    c2: int
    c3: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3 = self.c3 or self.c2 // 2
        y = [Conv(c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)]
        for _ in range(3):
            y.append(max_pool_same(y[-1], 5, 1))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv5")(jnp.concatenate(y, axis=-1), train)


class SPPCSPCS(nn.Module):
    """SPPCSPC variant with a SimAM gate in the main branch
    (reference: common.py:1929)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    k: Tuple[int, ...] = (3, 5, 9)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        x1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        x1 = SimAM(dtype=self.dtype, name="cv3")(x1, train)
        ys = [x1] + [max_pool_same(x1, kk, 1) for kk in self.k]
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv5")(jnp.concatenate(ys, axis=-1), train)
        y1 = Conv(c_, 3, 1, dtype=self.dtype, name="cv6")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv7")(jnp.concatenate([y1, y2], axis=-1), train)


class SPPF_improve(nn.Module):
    """SPPF + global max/avg context channels (reference: common.py:8872;
    its BaseConv = conv+BN+SiLU, same as Conv)."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool_same(x, self.k, 1)
        y2 = max_pool_same(y1, self.k, 1)
        y3 = max_pool_same(y2, self.k, 1)
        gmax = jnp.broadcast_to(jnp.max(x, axis=(1, 2), keepdims=True), x.shape)
        gavg = jnp.broadcast_to(jnp.mean(x, axis=(1, 2), keepdims=True), x.shape)
        y = jnp.concatenate([x, y1, y2, y3, gmax, gavg], axis=-1)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(y, train)


# ---------------------------------------------------------------------------
# RFB
# ---------------------------------------------------------------------------


class BasicRFB(nn.Module):
    """Receptive-field block, 3 dilated branches + scaled residual
    (reference: common.py:3134)."""

    c2: int
    s: int = 1
    scale: float = 0.1
    visual: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        ip = c1 // 8
        v = self.visual
        b0 = BasicConvB(2 * ip, 1, self.s, dtype=self.dtype, name="b0_0")(x, train)
        b0 = BasicConvB(2 * ip, 3, 1, p=v, d=v, relu=False, dtype=self.dtype, name="b0_1")(b0, train)
        b1 = BasicConvB(ip, 1, 1, dtype=self.dtype, name="b1_0")(x, train)
        b1 = BasicConvB(2 * ip, 3, self.s, p=1, dtype=self.dtype, name="b1_1")(b1, train)
        b1 = BasicConvB(2 * ip, 3, 1, p=v + 1, d=v + 1, relu=False, dtype=self.dtype, name="b1_2")(b1, train)
        b2 = BasicConvB(ip, 1, 1, dtype=self.dtype, name="b2_0")(x, train)
        b2 = BasicConvB((ip // 2) * 3, 3, 1, p=1, dtype=self.dtype, name="b2_1")(b2, train)
        b2 = BasicConvB(2 * ip, 3, self.s, p=1, dtype=self.dtype, name="b2_2")(b2, train)
        b2 = BasicConvB(2 * ip, 3, 1, p=2 * v + 1, d=2 * v + 1, relu=False, dtype=self.dtype, name="b2_3")(b2, train)
        out = BasicConvB(self.c2, 1, 1, relu=False, dtype=self.dtype, name="linear")(
            jnp.concatenate([b0, b1, b2], axis=-1), train
        )
        short = BasicConvB(self.c2, 1, self.s, relu=False, dtype=self.dtype, name="shortcut")(x, train)
        return nn.relu(out * self.scale + short)


class BasicRFB_a(nn.Module):
    """RFB-a: 4 asymmetric-kernel dilated branches (reference: common.py:3178)."""

    c2: int
    s: int = 1
    scale: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        ip = c1 // 4
        b0 = BasicConvB(ip, 1, 1, dtype=self.dtype, name="b0_0")(x, train)
        b0 = BasicConvB(ip, 3, 1, p=1, relu=False, dtype=self.dtype, name="b0_1")(b0, train)
        b1 = BasicConvB(ip, 1, 1, dtype=self.dtype, name="b1_0")(x, train)
        b1 = BasicConvB(ip, (3, 1), 1, p=(1, 0), dtype=self.dtype, name="b1_1")(b1, train)
        b1 = BasicConvB(ip, 3, 1, p=3, d=3, relu=False, dtype=self.dtype, name="b1_2")(b1, train)
        b2 = BasicConvB(ip, 1, 1, dtype=self.dtype, name="b2_0")(x, train)
        b2 = BasicConvB(ip, (1, 3), self.s, p=(0, 1), dtype=self.dtype, name="b2_1")(b2, train)
        b2 = BasicConvB(ip, 3, 1, p=3, d=3, relu=False, dtype=self.dtype, name="b2_2")(b2, train)
        b3 = BasicConvB(ip // 2, 1, 1, dtype=self.dtype, name="b3_0")(x, train)
        b3 = BasicConvB((ip // 4) * 3, (1, 3), 1, p=(0, 1), dtype=self.dtype, name="b3_1")(b3, train)
        b3 = BasicConvB(ip, (3, 1), self.s, p=(1, 0), dtype=self.dtype, name="b3_2")(b3, train)
        b3 = BasicConvB(ip, 3, 1, p=5, d=5, relu=False, dtype=self.dtype, name="b3_3")(b3, train)
        out = BasicConvB(self.c2, 1, 1, relu=False, dtype=self.dtype, name="linear")(
            jnp.concatenate([b0, b1, b2, b3], axis=-1), train
        )
        short = BasicConvB(self.c2, 1, self.s, relu=False, dtype=self.dtype, name="shortcut")(x, train)
        return nn.relu(out * self.scale + short)


# ---------------------------------------------------------------------------
# RepVGG / ConvNeXt / Conv2Former / ConvMixer-style
# ---------------------------------------------------------------------------


class RepVGGBlock(nn.Module):
    """RepVGG block in train form: 3x3 + 1x1 + identity-BN branches, SiLU
    (reference: common.py:236; padding defaults to 1 here because the
    reference's default p=0 makes padding_11 negative — a crash as shipped).
    XLA folds the three branches' BN scales at inference; the explicit
    reparam merge lives in engine/checkpoint strip (same math as
    get_equivalent_kernel_bias, common.py:292-318)."""

    c2: int
    k: int = 3
    s: int = 1
    p: int = 1
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        dense = ConvRaw(self.c2, self.k, self.s, p=self.p, g=self.g, use_bias=False, dtype=self.dtype, name="dense")(x)
        dense = _bn(self.dtype, "dense_bn", train)(dense)
        one = ConvRaw(self.c2, 1, self.s, p=self.p - self.k // 2, use_bias=False, g=self.g, dtype=self.dtype, name="one")(x)
        one = _bn(self.dtype, "one_bn", train)(one)
        y = dense + one
        if c1 == self.c2 and self.s == 1:
            y = y + _bn(self.dtype, "id_bn", train)(x)
        return nn.silu(y)


class ConvNextBlock(nn.Module):
    """ConvNeXt block: dw7x7, LN, 4x MLP, layer scale, residual
    (reference: common.py:6751). NHWC makes the LayerNorm native."""

    dim: int = 0
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = ConvRaw(c, 7, 1, p=3, g=c, use_bias=True, dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * c, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init_value), (c,))
        return x + gamma.astype(y.dtype) * y


class CNeB(nn.Module):
    """CSP ConvNeXt block (reference: common.py:6780)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = ConvNextBlock(c_, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class ConvMod(nn.Module):
    """Conv2Former modulation: LN, (1x1+GELU+dw11x11) * v, project
    (reference: common.py:2363)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        a = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="a0")(x)
        a = nn.gelu(a, approximate=False)
        a = ConvRaw(c, 3, p=1, g=c, use_bias=True, dtype=self.dtype, name="a1")(a)
        v = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="v")(x)
        return ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="proj")(a * v)


class ConvBlock2F(nn.Module):
    """Conv2Former block: ConvMod attention + ConvMLP, layer-scaled
    residuals; output channels == input (the MLP projects back to c1,
    reference: common.py:2344-2426)."""

    mid: int = 0  # MLP hidden width (the reference's c2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        mid = self.mid or c
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-6), (c,))
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-6), (c,))
        x = x + ls1.astype(x.dtype) * ConvMod(dtype=self.dtype, name="attn")(x, train)
        # ConvMLP: LN, 1x1 -> mid, GELU, +GELU(dw3x3), 1x1 -> c
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="mlp_norm")(x)
        y = ConvRaw(mid, 1, use_bias=True, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = y + nn.gelu(ConvRaw(mid, 3, p=1, g=mid, use_bias=True, dtype=self.dtype, name="mlp_pos")(y), approximate=False)
        y = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="mlp_fc2")(y)
        return x + ls2.astype(y.dtype) * y


class Conv2Former(nn.Module):
    """Stack of ConvBlock2F; channel-preserving (see module docstring)
    (reference: common.py:2428)."""

    c2: int = 0  # recorded, not produced (reference channel-tracking quirk)
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n):
            x = ConvBlock2F(self.c2, dtype=self.dtype, name=f"blk{i}")(x, train)
        return x


class C3CR(nn.Module):
    """C3 whose stack is a single Conv2Former block (reference: common.py:2440)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = ConvBlock2F(c_, dtype=self.dtype, name="m")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class ConvMix(nn.Module):
    """ConvMixer-style residual dw-k9 + pointwise; channel-preserving (the
    reference's dim1 arg is unused, common.py:7149)."""

    c2: int = 0  # unused (reference parity)
    kernel_size: int = 9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = ConvRaw(c, self.kernel_size, 1, p=self.kernel_size // 2, g=c, use_bias=True, dtype=self.dtype, name="dw")(x)
        y = nn.gelu(y, approximate=False)
        y = _bn(self.dtype, "dw_bn", train)(y)
        x = x + y
        x = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="pw")(x)
        x = nn.gelu(x, approximate=False)
        return _bn(self.dtype, "pw_bn", train)(x)


class CSPCM(nn.Module):
    """CSP over ConvMix blocks (reference: common.py:7169)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = ConvMix(dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


# ---------------------------------------------------------------------------
# attention modules
# ---------------------------------------------------------------------------


class C3CBAM(nn.Module):
    """Despite the name: plain CBAM attention, channel-preserving
    (reference: common.py:494 — (c1, c2) args ignored, kernel 7)."""

    c2: int = 0  # ignored (reference parity)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttentionModule(16, dtype=self.dtype, name="channel_attention")(x) * x
        return SpatialAttentionModule(7, dtype=self.dtype, name="spatial_attention")(x) * x


class CPCAChannelAttention(nn.Module):
    """Dual-pool shared-MLP channel gate (reference: common.py:5753)."""

    internal: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = ConvRaw(self.internal, 1, use_bias=True, dtype=self.dtype, name="fc1")
        fc2 = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="fc2")
        a = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.sigmoid(fc2(nn.relu(fc1(a))))
        m = jnp.max(x, axis=(1, 2), keepdims=True)
        m = nn.sigmoid(fc2(nn.relu(fc1(m))))
        return x * (a + m)


class CPCA(nn.Module):
    """Channel-prior convolutional attention: channel gate + multi-scale
    depthwise strip-conv spatial gate. The reference reuses ONE 1x1 conv's
    weights at three points (common.py:5782 self.conv called 3x) — kept.
    Channel-preserving."""

    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        shared = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="conv")
        x = nn.gelu(shared(x), approximate=False)
        x = CPCAChannelAttention(max(c // self.reduction, 1), dtype=self.dtype, name="ca")(x)
        x0 = ConvRaw(c, 5, p=2, g=c, use_bias=True, dtype=self.dtype, name="d55")(x)
        x1 = ConvRaw(c, (1, 7), p=(0, 3), g=c, use_bias=True, dtype=self.dtype, name="d17")(x0)
        x1 = ConvRaw(c, (7, 1), p=(3, 0), g=c, use_bias=True, dtype=self.dtype, name="d71")(x1)
        x2 = ConvRaw(c, (1, 11), p=(0, 5), g=c, use_bias=True, dtype=self.dtype, name="d111")(x0)
        x2 = ConvRaw(c, (11, 1), p=(5, 0), g=c, use_bias=True, dtype=self.dtype, name="d111b")(x2)
        x3 = ConvRaw(c, (1, 21), p=(0, 10), g=c, use_bias=True, dtype=self.dtype, name="d121")(x0)
        x3 = ConvRaw(c, (21, 1), p=(10, 0), g=c, use_bias=True, dtype=self.dtype, name="d121b")(x3)
        att = shared(x0 + x1 + x2 + x3)
        return shared(att * x)


class ContextAggregation(nn.Module):
    """Global context aggregation (reference: common.py:7892): softmax-key
    global pooling of values, zero-init projection, sigmoid gate, residual."""

    reduction: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ic = max(c // self.reduction, 1)
        a = nn.sigmoid(ConvRaw(1, 1, use_bias=True, dtype=self.dtype, name="a")(x))
        k = ConvRaw(1, 1, use_bias=True, dtype=self.dtype, name="k")(x).reshape(b, h * w, 1)
        k = jax.nn.softmax(k, axis=1)
        v = ConvRaw(ic, 1, use_bias=True, dtype=self.dtype, name="v")(x).reshape(b, h * w, ic)
        y = jnp.einsum("bnc,bn->bc", v, k[..., 0])[:, None, None, :]
        m = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="m")
        return x + m(y) * a


class PSContextAggregation(nn.Module):
    """PSA-style split with ContextAggregation attention (reference:
    common.py:7944; requires c1 == c2)."""

    c2: int = 0
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c = int(c1 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = b + ContextAggregation(dtype=self.dtype, name="attn")(b, train)
        f = Conv(c * 2, 1, dtype=self.dtype, name="ffn0")(b, train)
        f = Conv(c, 1, act=False, dtype=self.dtype, name="ffn1")(f, train)
        b = b + f
        return Conv(c1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class ChannelAttentionHSFPN(nn.Module):
    """HS-FPN channel attention (reference: common.py:8257). flag=True
    gates the input; flag=False returns the sigmoid mask."""

    ratio: int = 4
    flag: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        fc1 = ConvRaw(max(c // self.ratio, 1), 1, use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = ConvRaw(c, 1, use_bias=False, dtype=self.dtype, name="fc2")
        avg = fc2(nn.relu(fc1(jnp.mean(x, axis=(1, 2), keepdims=True))))
        mx = fc2(nn.relu(fc1(jnp.max(x, axis=(1, 2), keepdims=True))))
        gate = nn.sigmoid(avg + mx)
        return gate * x if self.flag else gate


class CAM(nn.Module):
    """Context augmentation module with three dilation rates and weight/
    adaptive/concat fusion (reference: common.py:5229). c2 = 3*c1 for
    'concat', else c1."""

    fusion: str = "weight"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x1 = Conv(c, 3, 1, d=1, dtype=self.dtype, name="conv1")(x, train)
        x2 = Conv(c, 3, 1, d=3, dtype=self.dtype, name="conv2")(x, train)
        x3 = Conv(c, 3, 1, d=5, dtype=self.dtype, name="conv3")(x, train)
        f1 = Conv(c, 1, dtype=self.dtype, name="fusion_1")(x1, train)
        f2 = Conv(c, 1, dtype=self.dtype, name="fusion_2")(x2, train)
        f3 = Conv(c, 1, dtype=self.dtype, name="fusion_3")(x3, train)
        if self.fusion == "weight":
            return f1 + f2 + f3
        if self.fusion == "adaptive":
            w = Conv(3, 1, dtype=self.dtype, name="fusion_4")(
                jnp.concatenate([f1, f2, f3], axis=-1), train
            )
            w = jax.nn.softmax(w, axis=-1)
            return x1 * w[..., :1] + x2 * w[..., 1:2] + x3 * w[..., 2:3]
        return jnp.concatenate([f1, f2, f3], axis=-1)


class SimAMWithSlicing(nn.Module):
    """SimAM applied per 2x2 spatial block (reference: common.py:9374)."""

    c2: int = 0  # ignored (reference parity)
    e_lambda: float = 1e-4
    dtype: Dtype = jnp.float32

    def _enhance(self, blk):
        n = blk.shape[1] * blk.shape[2] - 1
        d = (blk - blk.mean(axis=(1, 2), keepdims=True)) ** 2
        y = d / (4 * (d.sum(axis=(1, 2), keepdims=True) / n + self.e_lambda)) + 0.5
        return blk * nn.sigmoid(y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        bh, bw = h // 2, w // 2
        rows = []
        for hs, he in ((0, bh), (bh, h)):
            cols = [self._enhance(x[:, hs:he, ws:we]) for ws, we in ((0, bw), (bw, w))]
            rows.append(jnp.concatenate(cols, axis=2))
        return jnp.concatenate(rows, axis=1)


class SimAMWithFlexibleSlicing(nn.Module):
    """SimAM on a sliding grid of target_size tiles with coverage-weighted
    accumulation (reference: common.py:9411). Tile geometry is static, so
    the loop unrolls at trace time; the coverage divisors replicate the
    reference's sequential coverage-count-at-add-time semantics."""

    c2: int = 0  # ignored (reference parity)
    target_size: int = 8
    overlap_ratio: float = 0.0
    e_lambda: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        t = self.target_size
        stride = t if self.overlap_ratio == 0.0 else max(int(t * (1 - self.overlap_ratio)), 1)
        out = jnp.zeros_like(x)
        coverage = np.zeros((h, w), np.int64)
        enh = SimAMWithSlicing(e_lambda=self.e_lambda)._enhance
        for i in range(0, h - t + 1, stride):
            for j in range(0, w - t + 1, stride):
                tile = enh(x[:, i : i + t, j : j + t])
                coverage[i : i + t, j : j + t] += 1
                divisor = jnp.asarray(coverage[i : i + t, j : j + t], x.dtype)[None, :, :, None]
                out = out.at[:, i : i + t, j : j + t].add(tile / divisor)
        return out


class Conv_SWS(nn.Module):
    """Sliced-SimAM attention followed by conv+BN+SiLU (reference:
    common.py:9483)."""

    c2: int
    target_size: int = 8
    overlap_ratio: float = 0.0
    e_lambda: float = 1e-4
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SimAMWithFlexibleSlicing(
            target_size=self.target_size, overlap_ratio=self.overlap_ratio,
            e_lambda=self.e_lambda, dtype=self.dtype, name="att",
        )(x, train)
        x = ConvRaw(self.c2, self.k, self.s, g=self.g, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = _bn(self.dtype, "bn", train)(x)
        return nn.silu(x)


class ACmix(nn.Module):
    """Mixed self-attention + convolution with shared qkv projections
    (reference: common.py:7281). The window attention unfolds k_att x k_att
    key/value patches (static strided slices -> MXU-friendly stacked
    einsums); the conv path routes the 3*head qkv maps through a 1x1 to
    k_conv^2 shift maps consumed by a shift-initialized grouped conv."""

    c2: int
    kernel_att: int = 7
    head: int = 4
    kernel_conv: int = 3
    s: int = 1
    d: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        co, nh = self.c2, self.head
        hd = co // nh
        ka, kc = self.kernel_att, self.kernel_conv
        q = ConvRaw(co, 1, use_bias=True, dtype=self.dtype, name="conv1")(x)
        k = ConvRaw(co, 1, use_bias=True, dtype=self.dtype, name="conv2")(x)
        v = ConvRaw(co, 1, use_bias=True, dtype=self.dtype, name="conv3")(x)
        # positional encoding: normalized coords -> head_dim channels
        hh = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)[None, :, None, None]
        ww = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)[None, None, :, None]
        coords = jnp.concatenate(
            [jnp.broadcast_to(hh, (1, h, w, 1)), jnp.broadcast_to(ww, (1, h, w, 1))], axis=-1
        )
        pe = ConvRaw(hd, 1, use_bias=True, dtype=self.dtype, name="conv_p")(coords)  # (1,H,W,hd)

        pad = (self.d * (ka - 1) + 1) // 2
        s = self.s
        oh, ow = h // s, w // s

        def heads(t):  # (B,H,W,co) -> (B,H,W,nh,hd)
            return t.reshape(b, h, w, nh, hd)

        q_att = heads(q) * (float(hd) ** -0.5)
        if s > 1:
            q_att = q_att[:, ::s, ::s]
            q_pe = pe[:, ::s, ::s]
        else:
            q_pe = pe

        def unfold(t, ch):
            # reflect-pad then ka*ka static strided slices (torch Unfold)
            tp = jnp.pad(t, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
            tiles = []
            for dy in range(ka):
                for dx in range(ka):
                    tiles.append(
                        jax.lax.slice(
                            tp,
                            (0, dy, dx, 0),
                            (tp.shape[0], dy + (oh - 1) * s + 1, dx + (ow - 1) * s + 1, ch),
                            (1, s, s, 1),
                        )
                    )
            return jnp.stack(tiles, axis=3)  # (B,oh,ow,ka*ka,ch)

        k_un = unfold(k, co).reshape(b, oh, ow, ka * ka, nh, hd)
        pe_un = unfold(pe, hd)  # (1,oh,ow,ka*ka,hd)
        att = jnp.einsum("bhwnd,bhwknd->bhwkn", q_att, k_un + (q_pe[:, :, :, None, None] - pe_un[..., None, :]).astype(x.dtype))
        att = jax.nn.softmax(att, axis=3)
        v_un = unfold(v, co).reshape(b, oh, ow, ka * ka, nh, hd)
        out_att = jnp.einsum("bhwkn,bhwknd->bhwnd", att, v_un).reshape(b, oh, ow, co)

        # conv path: fc over stacked per-head qkv -> kc*kc maps * hd, then
        # shift-init grouped conv
        f_all = jnp.concatenate(
            [q.reshape(b, h, w, nh, hd), k.reshape(b, h, w, nh, hd), v.reshape(b, h, w, nh, hd)], axis=3
        )  # (B,H,W,3nh,hd)
        fc = self.param("fc", KERNEL_INIT, (1, 1, 3 * nh, kc * kc), jnp.float32)
        f_conv = jnp.einsum("bhwnd,xynm->bhwmd", f_all, fc.astype(x.dtype))  # (B,H,W,kc*kc,hd)
        f_conv = f_conv.reshape(b, h, w, kc * kc * hd)

        def shift_init(key, shape, dtype=jnp.float32):
            # identity-shift init: output map o reads kernel position o%kc^2
            # (reference reset_parameters one-hot kernels, common.py:7313)
            wgt = np.zeros(shape, np.float32)  # (kc, kc, cin/g, cout)
            cin_g = shape[2]
            for o in range(shape[3]):
                i = o % (kc * kc)
                wgt[i // kc, i % kc, min(i, cin_g - 1), o] = 1.0
            return jnp.asarray(wgt, dtype)

        dep = nn.Conv(
            features=co,
            kernel_size=(kc, kc),
            strides=(s, s),
            padding=((1, 1), (1, 1)),
            feature_group_count=hd,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=shift_init,
            name="dep_conv",
        )
        out_conv = dep(f_conv)
        r1 = self.param("rate1", nn.initializers.constant(0.5), ())
        r2 = self.param("rate2", nn.initializers.constant(0.5), ())
        return r1.astype(x.dtype) * out_att + r2.astype(x.dtype) * out_conv


# ---------------------------------------------------------------------------
# attention bottlenecks + their C3 wrappers
# ---------------------------------------------------------------------------


class _C3With(nn.Module):
    """C3 skeleton parameterized by a bottleneck factory — shared by the
    C3_<attention> family (reference: common.py:1640-1716, each overrides
    C3.m with its attention bottleneck at e=1.0)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    def make_bottleneck(self, c: int, i: int):
        raise NotImplementedError

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = self.make_bottleneck(c_, i)(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class CBAMBottleneckDWC(nn.Module):
    """Bottleneck + CBAM with a depthwise spatial gate (reference:
    common.py:953; SpatialAttentionModuleDWC :425 is a depthwise-separable
    conv on the 2-channel avg/max map)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Tuple[Any, Any] = (3, 3)
    ratio: int = 16
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        y = ChannelAttentionModule(self.ratio, dtype=self.dtype, name="channel_attention")(y) * y
        # DWC spatial gate: depthwise 2->2 then pointwise 2->1
        pool = jnp.concatenate(
            [jnp.mean(y, axis=-1, keepdims=True), jnp.max(y, axis=-1, keepdims=True)], axis=-1
        )
        s = ConvRaw(2, self.kernel_size, g=2, use_bias=True, dtype=self.dtype, name="sa_dw")(pool)
        s = ConvRaw(1, 1, use_bias=True, dtype=self.dtype, name="sa_pw")(s)
        y = nn.sigmoid(s) * y
        return x + y if self.shortcut and c1 == self.c2 else y


class SCBAMBottleneck(nn.Module):
    """Summed-CBAM bottleneck: sigmoid(channel-gated + spatial-gated)
    (reference: common.py:975)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    ratio: int = 16
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        yc = ChannelAttentionModule(self.ratio, dtype=self.dtype, name="channel_attention")(y) * y
        ys = SpatialAttentionModule(self.kernel_size, dtype=self.dtype, name="spatial_attention")(yc) * y
        out = nn.sigmoid(yc + ys)
        return x + out if self.shortcut and c1 == self.c2 else out


class CABottleneck(nn.Module):
    """Bottleneck with coordinate attention on the conv output
    (reference: common.py:4884)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    ratio: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        b, h, w, c = y.shape
        mip = max(8, c1 // self.ratio)
        # pooled strips: (B,H,1,C) and (B,1,W,C) -> concat along the strip
        xh = jnp.mean(y, axis=2, keepdims=True)  # (B,H,1,C)
        xw = jnp.mean(y, axis=1, keepdims=True).transpose(0, 2, 1, 3)  # (B,W,1,C)
        t = jnp.concatenate([xh, xw], axis=1)  # (B,H+W,1,C)
        t = ConvRaw(mip, 1, use_bias=True, dtype=self.dtype, name="conv1")(t)
        t = _bn(self.dtype, "bn1", train)(t)
        t = t * nn.relu6(t + 3.0) / 6.0  # h_swish
        th, tw = t[:, :h], t[:, h:].transpose(0, 2, 1, 3)
        ah = nn.sigmoid(ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="conv_h")(th))
        aw = nn.sigmoid(ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="conv_w")(tw))
        out = y * ah * aw
        return x + out if self.shortcut and c1 == self.c2 else out


class GSCBAMBottleneck(nn.Module):
    """GSConv bottleneck with CBAM on the mid features (reference:
    common.py:737)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Tuple[int, int] = (1, 3)
    ratio: int = 8
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = GSConv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = ChannelAttentionModule(self.ratio, dtype=self.dtype, name="channel_attention")(y) * y
        y = SpatialAttentionModule(self.kernel_size, dtype=self.dtype, name="spatial_attention")(y) * y
        y = GSConv(self.c2, self.k[1], 1, act=False, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class CPCABottleneck(nn.Module):
    """Bottleneck whose output runs the CPCA attention stack (reference:
    common.py:5818; the residual adds the RAW input x, not the conv out)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Tuple[Any, Any] = (3, 3)
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        out = CPCA(self.reduction, dtype=self.dtype, name="cpca")(y, train)
        return x + out if self.shortcut and c1 == self.c2 else out


class C3_CBAM(_C3With):
    """C3 with CBAMBottleneck(k7) (reference: common.py:1640)."""

    kernel_size: int = 7

    def make_bottleneck(self, c, i):
        return CBAMBottleneck(c, self.shortcut, self.g, e=1.0, k=(1, 3), ratio=8,
                              kernel_size=self.kernel_size, dtype=self.dtype, name=f"m{i}")


class C3_CBAMS(C3_CBAM):
    """C3_CBAM with kernel_size 3 (reference: common.py:1662)."""

    kernel_size: int = 3


class C3_CBAM_DWC(_C3With):
    """C3 with depthwise-spatial-gate CBAM bottlenecks (reference: common.py:1651)."""

    kernel_size: int = 7

    def make_bottleneck(self, c, i):
        return CBAMBottleneckDWC(c, self.shortcut, self.g, e=1.0, k=(1, 3),
                                 kernel_size=self.kernel_size, dtype=self.dtype, name=f"m{i}")


class C3_CBAMS_DWC(C3_CBAM_DWC):
    """kernel_size 3 variant (reference: common.py:1673)."""

    kernel_size: int = 3


class C3CPCA(_C3With):
    """C3 with CPCA bottlenecks (reference: common.py:1684)."""

    def make_bottleneck(self, c, i):
        return CPCABottleneck(c, self.shortcut, self.g, e=1.0, k=(1, 3), dtype=self.dtype, name=f"m{i}")


class C3GAM(_C3With):
    """C3 with GAM bottlenecks. The reference bottleneck (common.py:539)
    computes cv2(cv1(x)) but never uses it — behaviorally it is GAM
    attention on the input with an optional extra residual; reproduced
    without the dead convs."""

    def make_bottleneck(self, c, i):
        from yolosomi_tpu.models.layers import GAMAttention

        class _GB(nn.Module):
            shortcut: bool
            dtype: Dtype = jnp.float32

            @nn.compact
            def __call__(self, x, train: bool = False):
                out = GAMAttention(x.shape[-1], dtype=self.dtype, name="gam")(x, train)
                return x + out if self.shortcut else out

        return _GB(self.shortcut, dtype=self.dtype, name=f"m{i}")


class C3_SCBAM(_C3With):
    """C3 with summed-CBAM bottlenecks (reference: common.py:1700)."""

    def make_bottleneck(self, c, i):
        return SCBAMBottleneck(c, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m{i}")


class C3_BAM(_C3With):
    """C3 with BAM bottlenecks. The reference bottleneck (common.py:998)
    discards its convs and gates the input with BAM: out = x*(1+att),
    plus an optional extra residual."""

    def make_bottleneck(self, c, i):
        class _BB(nn.Module):
            shortcut: bool
            dtype: Dtype = jnp.float32

            @nn.compact
            def __call__(self, x, train: bool = False):
                out = BAM(dtype=self.dtype, name="bam")(x, train)
                return x + out if self.shortcut else out

        return _BB(self.shortcut, dtype=self.dtype, name=f"m{i}")


class C3_CA(_C3With):
    """C3 with coordinate-attention bottlenecks (reference: common.py:4925)."""

    def make_bottleneck(self, c, i):
        return CABottleneck(c, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m{i}")


class C2fBAM(nn.Module):
    """C2f with a BAM gate on the output (reference: common.py:3626)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolosomi_tpu.models.layers import Bottleneck

        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, self.g, k=((3, 3), (3, 3)), e=1.0,
                                 dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)
        return BAM(dtype=self.dtype, name="bam")(out, train)


class DWR(nn.Module):
    """Dilation-wise residual block (reference: common.py:7431)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        y = Conv(dim // 2, 3, dtype=self.dtype, name="conv_3x3")(x, train)
        x1 = Conv(dim, 3, d=1, dtype=self.dtype, name="d1")(y, train)
        x2 = Conv(dim // 2, 3, d=3, dtype=self.dtype, name="d3")(y, train)
        x3 = Conv(dim // 2, 3, d=5, dtype=self.dtype, name="d5")(y, train)
        out = Conv(dim, 1, dtype=self.dtype, name="conv_1x1")(
            jnp.concatenate([x1, x2, x3], axis=-1), train
        )
        return out + x


class DWRSegConv(nn.Module):
    """Conv -> DWR -> BN+GELU (reference: common.py:7450)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 1, dtype=self.dtype, name="conv")(x, train)
        x = DWR(dtype=self.dtype, name="dwr")(x, train)
        x = _bn(self.dtype, "bn", train)(x)
        return nn.gelu(x, approximate=False)


class C2f_DWR(nn.Module):
    """C2f whose bottlenecks end in DWRSeg convs (reference: common.py:7487)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            z = Conv(c, 3, dtype=self.dtype, name=f"m{i}_cv1")(ys[-1], train)
            z = DWRSegConv(c, dtype=self.dtype, name=f"m{i}_cv2")(z, train)
            ys.append(ys[-1] + z if self.shortcut else z)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class VoVGSCSPCBAM(nn.Module):
    """VoV-GSCSP with CBAM'd GS bottlenecks (reference: common.py:2697)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        x1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            x1 = GSCBAMBottleneck(c_, e=1.0, dtype=self.dtype, name=f"gsb{i}")(x1, train)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y, x1], axis=-1), train)


# ---------------------------------------------------------------------------
# multi-input fusion
# ---------------------------------------------------------------------------


class Add(nn.Module):
    """Elementwise sum of all inputs (reference: common.py:8287)."""

    dtype: Dtype = jnp.float32

    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        out = xs[0]
        for x in xs[1:]:
            out = out + x
        return out


class Multiply(nn.Module):
    """Elementwise product of two inputs (reference: common.py:8279)."""

    dtype: Dtype = jnp.float32

    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        return xs[0] * xs[1]


class CShortcut(nn.Module):
    """x[0] + x[1] (reference: common.py:2100; yolo.py:1592 records
    c2 = sum(ch) — the real output is ch of the first input, tracked
    honestly by our compiler)."""

    dtype: Dtype = jnp.float32

    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        return xs[0] + xs[1]


class SDI(nn.Module):
    """Scale-wise decoupled interaction: conv each input to the first
    input's channels, resize to its spatial size, multiply together
    (reference: common.py:8658; downsizes via adaptive avg pool, upsizes
    via bilinear align_corners=True)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        target_hw = xs[0].shape[1:3]
        ans = jnp.ones_like(xs[0][..., :1]) * jnp.ones((1, 1, 1, self.c2), xs[0].dtype)
        for i, x in enumerate(xs):
            x = resize_to(x, target_hw, align_corners=True)
            x = ConvRaw(self.c2, 3, p=1, use_bias=True, dtype=self.dtype, name=f"conv{i}")(x)
            ans = ans * x
        return ans


class BiFPNSDI(nn.Module):
    """Weighted multi-scale fusion at the smallest input resolution
    (reference: common.py:3707; the weight normalizer divides the RAW
    weights by sum(swish(weights)) — reproduced faithfully)."""

    c2: int
    length: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        w = self.param("w", nn.initializers.ones, (self.length,))
        target_hw = min((x.shape[1:3] for x in xs), key=lambda s: s[0])
        norm = w / (jnp.sum(nn.silu(w)) + 1e-4)
        out = None
        for i, x in enumerate(xs):
            x = resize_to(x, target_hw, align_corners=True)
            x = ConvRaw(self.c2, 3, p=1, use_bias=True, dtype=self.dtype, name=f"conv{i}")(x)
            term = norm[i].astype(x.dtype) * x
            out = term if out is None else out + term
        return out


class BiFPNs(nn.Module):
    """Swish-normalized weighted sum of 1x1-projected inputs
    (reference: common.py:3737)."""

    c2: int
    length: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        w = self.param("w", nn.initializers.normal(1.0), (self.length,))
        sw = nn.silu(w)
        norm = sw / (jnp.sum(sw) + 1e-4)
        out = None
        for i, x in enumerate(xs):
            x = ConvRaw(self.c2, 1, use_bias=False, dtype=self.dtype, name=f"conv{i}")(x)
            term = norm[i].astype(x.dtype) * x
            out = term if out is None else out + term
        return out


class BiFusion(nn.Module):
    """YOLOv6 BiFusion: upsample the coarse input (ConvTranspose),
    downsample the fine one, 1x1-project all three, concat + merge
    (reference: common.py:3448). Output at x[1]'s resolution."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        x0 = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(xs[0], train)
        x0 = ConvTransposeLayer(self.c2, 2, 2, dtype=self.dtype, name="upsample")(x0, train)
        x1 = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(xs[1], train)
        x2 = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(xs[2], train)
        x2 = Conv(self.c2, 3, 2, dtype=self.dtype, name="downsample")(x2, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv_out")(
            jnp.concatenate([x0, x1, x2], axis=-1), train
        )


class SF(nn.Module):
    """Simplified fusion: transpose-up x[0], depthwise-project + down x[2],
    concat with x[1] (reference: common.py:3477). c2 = sum of input chans."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        c0 = xs[0].shape[-1]
        c2in = xs[2].shape[-1]
        x0 = ConvTransposeLayer(c0, 2, 2, dtype=self.dtype, name="upsample")(xs[0], train)
        x0 = Conv(c0, 3, 1, dtype=self.dtype, name="cv1")(x0, train)
        x2 = Conv(c2in, 1, 1, g=c2in, dtype=self.dtype, name="cv3")(xs[2], train)
        x2 = Conv(c2in, 3, 2, dtype=self.dtype, name="downsample")(x2, train)
        return jnp.concatenate([x0, xs[1], x2], axis=-1)


class ScalSeq(nn.Module):
    """Scale-sequence fusion: project P4/P5 to `channel`, upsample to P3,
    1x1x1 conv3d across the scale axis, max over scales (reference:
    common.py:4330; the conv3d kernel is (1,1,1) so it reduces to a
    pointwise dense, and MaxPool3d((3,1,1)) is a max over the 3 scales)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        p3, p4, p5 = xs
        hw = p3.shape[1:3]
        p4 = Conv(self.c2, 1, dtype=self.dtype, name="conv1")(p4, train)
        p4 = jax.image.resize(p4, (p4.shape[0], hw[0], hw[1], p4.shape[-1]), method="nearest")
        p5 = Conv(self.c2, 1, dtype=self.dtype, name="conv2")(p5, train)
        p5 = jax.image.resize(p5, (p5.shape[0], hw[0], hw[1], p5.shape[-1]), method="nearest")
        stack = jnp.stack([p3, p4, p5], axis=1)  # (B,3,H,W,C)
        stack = nn.Dense(self.c2, dtype=self.dtype, name="conv3d")(stack)
        stack = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn",
        )(stack)
        stack = nn.leaky_relu(stack, 0.1)
        return jnp.max(stack, axis=1)


class AttentionModel(nn.Module):
    """Two-input fusion: ECA-style channel attention on x[0], add x[1],
    coordinate-style local attention (reference: common.py:4412
    attention_model = channel_att + local_att)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        import math as _m

        x0, x1 = xs[0], xs[1]
        c = x0.shape[-1]
        # channel_att (common.py:4358): ECA conv1d over channels
        t = int(abs((_m.log2(c) + 1) / 2))
        ksz = t if t % 2 else t + 1
        v = jnp.mean(x0, axis=(1, 2))[:, :, None]
        v = nn.Conv(1, (ksz,), padding="SAME", use_bias=False, dtype=self.dtype, name="ca_conv")(v)
        x0 = x0 * nn.sigmoid(v[..., 0])[:, None, None, :]
        x = x0 + x1
        # local_att (common.py:4378): mean-pooled h/w strips, shared 1x1
        b, h, w, _ = x.shape
        mid = max(c // self.reduction, 1)
        xh = jnp.mean(x, axis=2, keepdims=True)  # (B,H,1,C)
        xw = jnp.mean(x, axis=1, keepdims=True).transpose(0, 2, 1, 3)  # (B,W,1,C)
        t2 = jnp.concatenate([xh, xw], axis=1)
        t2 = ConvRaw(mid, 1, use_bias=False, dtype=self.dtype, name="la_conv1")(t2)
        t2 = _bn(self.dtype, "la_bn", train)(t2)
        t2 = nn.relu(t2)
        sh = nn.sigmoid(ConvRaw(c, 1, use_bias=False, dtype=self.dtype, name="la_fh")(t2[:, :h]))
        sw = nn.sigmoid(ConvRaw(c, 1, use_bias=False, dtype=self.dtype, name="la_fw")(t2[:, h:]))
        return x * sh * sw.transpose(0, 2, 1, 3)


class ConvTranspose2dRaw(ConvTransposeLayer):
    """Bare torch nn.ConvTranspose2d row (bias, no BN/act; yolo.py conv list)."""

    k: int = 1
    s: int = 1
    bn: bool = False
    act: Any = False
