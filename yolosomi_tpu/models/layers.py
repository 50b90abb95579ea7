"""Tier-1 module zoo, TPU-native (flax.linen, NHWC, bf16-capable).

Re-designs of the blocks reachable from the flagship YOLO-SOMI graph and
the yolov5 hub configs (reference: /root/reference/models/common.py; the
bolded Tier-1 set of SURVEY.md §2.3). Behavioral spec comes from the
reference's math; the implementation is idiomatic JAX:

- NHWC everywhere (TPU conv-friendly), channels on the 128-lane axis.
- Pure functional apply; BatchNorm uses a `batch_stats` collection and is
  *globally* batch-averaged under pjit sharding (== the reference's
  opt-in SyncBN, train.py:165-167, but always-on and free).
- No in-place anything; XLA fuses the elementwise tails into the convs.

Known reference defects handled here (see SURVEY.md §0):
- `C2fEACBAM` (YOLO-SOMI.yaml:40) does not exist in the reference; it is
  registered as an alias of C2fEMACBAM.
- Reference `EMACBAMBottleneck.conv_spatial` (common.py:924) declares 2
  input channels but receives c2//factor — a crash as shipped. Our
  EMACBAMBottleneck keeps the documented design (CBAM channel gate +
  EMA-style grouped h/w-pooled spatial gate + per-group norm) with the
  channel count fixed (conv_spatial takes c2//factor channels).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch BatchNorm2d(momentum=0.03) == flax BatchNorm(momentum=0.97)
# (reference sets momentum 0.03 / eps 1e-3 in torch_utils.py:170-172).
BN_MOMENTUM = 0.97
BN_EPS = 1e-3

KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def autopad(k, p=None, d: int = 1):
    """'same'-style padding for odd kernels (reference: common.py:43-50)."""
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def _pair(x) -> Tuple[int, int]:
    return (x, x) if isinstance(x, int) else tuple(x)


class ConvRaw(nn.Module):
    """Bare conv2d, torch-Conv2d-equivalent padding semantics (NHWC)."""

    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: Union[int, Tuple[int, int]] = 1
    p: Union[int, Tuple[int, int], None] = None
    g: int = 1
    d: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _pair(self.k)
        p = autopad(self.k, self.p, self.d)
        ph, pw = _pair(p)
        return nn.Conv(
            features=self.c2,
            kernel_size=k,
            strides=_pair(self.s),
            padding=((ph, ph), (pw, pw)),
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=KERNEL_INIT,
            name="conv",
        )(x)


class Conv(nn.Module):
    """Conv + BN + SiLU (reference: common.py:53-71). `act` may be True
    (SiLU), False/None (identity), or a callable."""

    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: Union[int, Tuple[int, int]] = 1
    p: Union[int, None] = None
    g: int = 1
    d: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvRaw(self.c2, self.k, self.s, self.p, self.g, self.d, use_bias=False, dtype=self.dtype, name="cv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn"
        )(x)
        if self.act is True:
            x = nn.silu(x)
        elif callable(self.act):
            x = self.act(x)
        return x


class DWConv(Conv):
    """Depthwise conv: g == gcd(c1, c2) (reference: common.py:9580). The
    group count is supplied by the YAML compiler."""


class Focus(nn.Module):
    """Space-to-depth 2x then Conv (reference: common.py:1973)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Union[int, None] = None
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (B,H,W,C) -> (B,H/2,W/2,4C): same interleave as the reference's
        # x[..., ::2, ::2], x[..., 1::2, ::2], x[..., ::2, 1::2], x[..., 1::2, 1::2]
        patches = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1
        )
        return Conv(self.c2, self.k, self.s, self.p, self.g, act=self.act, dtype=self.dtype, name="conv")(
            patches, train
        )


class Bottleneck(nn.Module):
    """Standard residual bottleneck (reference: common.py:1494)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[Any, Any] = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class BottleneckCSP(nn.Module):
    """CSP bottleneck (reference: common.py:1512)."""

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
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m{i}")(y1, train)
        y1 = ConvRaw(c_, 1, 1, use_bias=False, dtype=self.dtype, name="cv3")(y1)
        y2 = ConvRaw(c_, 1, 1, use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn")(y)
        y = nn.silu(y)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(y, train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference: common.py:1541)."""

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
            y1 = Bottleneck(c_, self.shortcut, self.g, k=((1, 1), (3, 3)), e=1.0, dtype=self.dtype, name=f"m{i}")(
                y1, train
            )
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class C2f(nn.Module):
    """YOLOv8-style split CSP block (reference: common.py:2638)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    def bottleneck(self, i: int, c: int):
        return Bottleneck(c, self.shortcut, self.g, k=((3, 3), (3, 3)), e=1.0, dtype=self.dtype, name=f"m{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(self.bottleneck(i, c)(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


# ---------------------------------------------------------------------------
# Attention family
# ---------------------------------------------------------------------------


class ChannelAttentionModule(nn.Module):
    """CBAM channel gate: shared MLP over avg+max pooled stats, sigmoid
    (reference: common.py:339-360). Returns the (B,1,1,C) gate."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c1 = x.shape[-1]
        mid = max(c1 // self.reduction, 1)
        avg = jnp.mean(x, axis=(1, 2))  # (B,C)
        mx = jnp.max(x, axis=(1, 2))

        fc1 = nn.Dense(mid, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(c1, dtype=self.dtype, name="fc2")

        def mlp(v):
            return fc2(nn.relu(fc1(v)))

        gate = nn.sigmoid(mlp(avg) + mlp(mx))
        return gate[:, None, None, :]


class SpatialAttentionModule(nn.Module):
    """CBAM spatial gate: 7x7 conv over [mean_c, max_c] maps, sigmoid
    (reference: common.py:392-405). Returns the (B,H,W,1) gate."""

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        stats = jnp.concatenate(
            [jnp.mean(x, axis=-1, keepdims=True), jnp.max(x, axis=-1, keepdims=True)], axis=-1
        )
        gate = ConvRaw(1, self.kernel_size, 1, use_bias=True, dtype=self.dtype, name="cv1")(stats)
        return nn.sigmoid(gate)


class CBAM(nn.Module):
    """Standalone CBAM block (reference: common.py:660-669)."""

    c2: int = 0  # unused; kept for YAML arg-compatibility
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttentionModule(self.reduction, dtype=self.dtype, name="channel_attention")(x) * x
        x = SpatialAttentionModule(dtype=self.dtype, name="spatial_attention")(x) * x
        return x


class CBAMBottleneck(nn.Module):
    """Bottleneck with CBAM on the mid features (reference: common.py:671-695)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 1.0
    k: Tuple[int, int] = (3, 3)
    ratio: int = 8
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = ChannelAttentionModule(self.ratio, dtype=self.dtype, name="channel_attention")(y) * y
        y = SpatialAttentionModule(self.kernel_size, dtype=self.dtype, name="spatial_attention")(y) * y
        y = Conv(self.c2, self.k[1], 1, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCBAM(nn.Module):
    """C2f whose bottlenecks carry CBAM (reference: common.py:2671; calls
    CBAMBottleneck with e=1.0, ratio=16, kernel_size=7)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                CBAMBottleneck(
                    c, self.shortcut, self.g, e=1.0, k=(3, 3), ratio=16,
                    kernel_size=self.kernel_size, dtype=self.dtype, name=f"m{i}",
                )(ys[-1], train)
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class EMACBAMBottleneck(nn.Module):
    """EMA-style grouped attention bottleneck (reference: common.py:895-957,
    repaired — see module docstring). Two plain convs, CBAM-style channel
    gate, EMA-style per-group spatial gate from h/w pooled profiles, then
    per-group GroupNorm. No residual (the reference computes `add` but never
    uses it)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Tuple[int, int] = (3, 3)
    factor: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvRaw(c_, self.k[0], 1, use_bias=True, dtype=self.dtype, name="cv1")(x)
        y = ConvRaw(self.c2, self.k[1], 1, g=self.g, use_bias=True, dtype=self.dtype, name="cv2")(y)
        b, h, w, c = y.shape
        gch = max(c // self.factor, 1)

        # channel gate: shared 1x1-conv MLP over avg & max pooled stats
        fc1 = nn.Dense(gch, use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")
        avg = jnp.mean(y, axis=(1, 2))
        mx = jnp.max(y, axis=(1, 2))
        gate_c = nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))
        y = y * gate_c[:, None, None, :]

        # grouped spatial gate: pool over W and H, concat profiles along the
        # pooled axis, 7-tap conv -> one gate per group position
        gy = y.reshape(b, h, w, self.factor, gch)
        ph = jnp.mean(gy, axis=2)  # (B,H,G,gch)
        pw = jnp.mean(gy, axis=1)  # (B,W,G,gch)
        profile = jnp.concatenate([ph, pw], axis=1)  # (B,H+W,G,gch)
        # conv over the pooled axis, per group (batched via the group dim)
        profile = profile.transpose(0, 2, 1, 3).reshape(b * self.factor, h + w, 1, gch)
        gate_s = ConvRaw(1, (7, 1), 1, p=(3, 0), use_bias=False, dtype=self.dtype, name="conv_spatial")(profile)
        gate_s = nn.sigmoid(gate_s.reshape(b, self.factor, h + w, 1))
        gate_h = gate_s[:, :, :h].reshape(b, self.factor, h, 1, 1).transpose(0, 2, 3, 1, 4)  # (B,H,1,G,1)
        gate_w = gate_s[:, :, h:].reshape(b, self.factor, w, 1, 1).transpose(0, 3, 2, 1, 4)  # (B,1,W,G,1)
        gy = gy * gate_h * gate_w
        # per-group normalization (reference: GroupNorm(c2//factor, c2//factor)
        # on the grouped view == one group per channel == instance norm)
        gy = gy.reshape(b, h, w, c)
        # use_fast_variance=False: the E[x^2]-E[x]^2 shortcut cancels
        # catastrophically on near-constant channels (this GN is per-channel
        # instance norm over unnormalized conv outputs) and yields negative
        # variances -> NaN a few steps into training
        gy = nn.GroupNorm(num_groups=c, epsilon=1e-5, dtype=self.dtype, use_fast_variance=False, name="gn")(gy)
        return gy


class C2fEMACBAM(nn.Module):
    """C2f with EMACBAM bottlenecks (reference: common.py:3594; the flagship
    YAML's `C2fEACBAM` rows alias to this class)."""

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
            ys.append(
                EMACBAMBottleneck(c, self.shortcut, self.g, e=0.5, factor=8, dtype=self.dtype, name=f"m{i}")(
                    ys[-1], train
                )
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class SE(nn.Module):
    """Squeeze-excitation gate (reference: common.py:474)."""

    c2: int = 0
    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        v = jnp.mean(x, axis=(1, 2))
        v = nn.Dense(max(c1 // self.ratio, 1), use_bias=False, dtype=self.dtype, name="l1")(v)
        v = nn.relu(v)
        v = nn.Dense(c1, use_bias=False, dtype=self.dtype, name="l2")(v)
        return x * nn.sigmoid(v)[:, None, None, :]


class SEAM(nn.Module):
    """Spatially-enhanced attention module (reference: common.py:8448-8505):
    a depthwise-residual conv stack, global pool, SE-style MLP, and an
    exp-activated channel gate (the exp gate is SEAM's signature)."""

    c2: int = 0  # forced to c1 by the reference when c1 != c2
    n: int = 1
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]

        def norm(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name=name
            )

        # patch-embed depthwise conv + GELU + BN
        y = ConvRaw(c, 3, 1, g=c, use_bias=True, dtype=self.dtype, name="dcov_patch")(x)
        y = norm("bn_patch")(nn.gelu(y))
        for i in range(self.n):
            r = ConvRaw(c, 3, 1, g=c, use_bias=True, dtype=self.dtype, name=f"dw{i}")(y)
            r = norm(f"bn_dw{i}")(nn.gelu(r))
            y = y + r  # residual depthwise mixer
            y = ConvRaw(c, 1, 1, use_bias=True, dtype=self.dtype, name=f"pw{i}")(y)
            y = norm(f"bn_pw{i}")(nn.gelu(y))
        v = jnp.mean(y, axis=(1, 2))
        v = nn.Dense(max(c // self.reduction, 1), use_bias=False, dtype=self.dtype, name="fc1")(v)
        v = nn.relu(v)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(v)
        gate = jnp.exp(nn.sigmoid(v))  # exp of sigmoid, as the reference
        return x * gate[:, None, None, :]


# ---------------------------------------------------------------------------
# SPP family
# ---------------------------------------------------------------------------


def _maxpool(x, k: int, s: int = 1):
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(s, s), padding=((p, p), (p, p)))


class SPP(nn.Module):
    """Spatial pyramid pooling (reference: common.py:1806)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = Conv(c1 // 2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        pools = [y] + [_maxpool(y, k) for k in self.k]
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(pools, axis=-1), train)


class SPPF(nn.Module):
    """Fast SPP: 3 chained k-pools == SPP(k, 2k-1, 3k-2) (reference:
    common.py:1846)."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = Conv(c1 // 2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = _maxpool(y, self.k)
        y2 = _maxpool(y1, self.k)
        y3 = _maxpool(y2, self.k)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([y, y1, y2, y3], axis=-1), train)


# ---------------------------------------------------------------------------
# Fusion / neck
# ---------------------------------------------------------------------------


class Concat(nn.Module):
    """Concatenate along channels (reference: common.py:2085)."""

    dim: int = 1  # torch channel dim; always maps to -1 in NHWC

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        return jnp.concatenate(list(xs), axis=-1)


class Upsample(nn.Module):
    """nn.Upsample(None, scale, 'nearest') equivalent (exact for integer
    scale via repeat)."""

    size: Any = None
    scale_factor: int = 2
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = int(self.scale_factor)
        return jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)


class Swish(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * nn.sigmoid(x)


class BiFPN(nn.Module):
    """Learned-weight feature fusion over N equal-shaped inputs
    (reference: common.py:3688-3705): w_i = weight_i / (sum(swish(weight)) + eps),
    output = sum_i w_i * x_i."""

    length: int
    epsilon: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        w = self.param("weight", nn.initializers.ones, (self.length,), jnp.float32)
        norm = jnp.sum(w * nn.sigmoid(w)) + self.epsilon  # sum of swish(w)
        wn = (w / norm).astype(xs[0].dtype)
        out = wn[0] * xs[0]
        for i in range(1, len(xs)):
            out = out + wn[i] * xs[i]
        return out


class BiFPN_Add2(nn.Module):
    """2-input weighted add + 1x1 conv (reference: common.py:3655)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        w = self.param("w", nn.initializers.ones, (2,), jnp.float32)
        w = nn.relu(w)
        wn = (w / (jnp.sum(w) + 1e-4)).astype(xs[0].dtype)
        y = wn[0] * xs[0] + wn[1] * xs[1]
        return ConvRaw(self.c2, 1, 1, use_bias=True, dtype=self.dtype, name="conv")(nn.silu(y))


class BiFPN_Add3(nn.Module):
    """3-input weighted add + 1x1 conv (reference: common.py:3673)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        w = self.param("w", nn.initializers.ones, (3,), jnp.float32)
        w = nn.relu(w)
        wn = (w / (jnp.sum(w) + 1e-4)).astype(xs[0].dtype)
        y = wn[0] * xs[0] + wn[1] * xs[1] + wn[2] * xs[2]
        return ConvRaw(self.c2, 1, 1, use_bias=True, dtype=self.dtype, name="conv")(nn.silu(y))


# ---------------------------------------------------------------------------
# Dynamic convolution (ODConv)
# ---------------------------------------------------------------------------


class ODConv2d(nn.Module):
    """Omni-dimensional dynamic convolution (reference: common.py:4495-4610,
    ODConv2d_3rd): K candidate kernels mixed per-sample by four attention
    factors (kernel-wise softmax, spatial, in-channel, out-channel sigmoids).

    TPU design: the four factors factor out of the sum over K, so the mixed
    weight is one einsum over K followed by elementwise scaling; the
    per-sample conv runs as vmap(conv) which XLA lowers to a batch-grouped
    convolution — the same trick as the reference's view(1, B*C, H, W)
    grouped conv (common.py:4602) without the layout gymnastics.
    """

    c2: int
    k: int = 3
    s: int = 1
    p: Union[int, None] = None
    g: int = 1
    d: int = 1
    K: int = 4
    r: float = 1.0 / 16.0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c1 = x.shape
        kh = kw = self.k
        cin_g = c1 // self.g
        hidden = max(int(c1 * self.r), 16)

        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.K, kh, kw, cin_g, self.c2),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.K, self.c2), jnp.float32) if self.use_bias else None

        # attention trunk: GAP -> 1x1 conv -> BN -> ReLU (reference:
        # get_weight_bias, common.py:4552-4567)
        v = jnp.mean(x, axis=(1, 2))  # (B, C1)
        v = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="fc")(v)
        v = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(
            v
        )
        v = nn.relu(v)

        attn_f = nn.sigmoid(nn.Dense(self.c2, dtype=self.dtype, name="fc_f")(v))  # (B, C2)
        attn_s = nn.sigmoid(nn.Dense(kh * kw, dtype=self.dtype, name="fc_s")(v)).reshape(b, kh, kw)
        attn_c = nn.sigmoid(nn.Dense(cin_g, dtype=self.dtype, name="fc_c")(v))  # (B, Cin/g)
        attn_w = nn.softmax(nn.Dense(self.K, dtype=self.dtype, name="fc_w")(v), axis=-1)  # (B, K)

        # mix over K once, then apply the separable factors
        wmix = jnp.einsum("bk,khwio->bhwio", attn_w.astype(jnp.float32), weight)
        wmix = (
            wmix
            * attn_s[:, :, :, None, None].astype(jnp.float32)
            * attn_c[:, None, None, :, None].astype(jnp.float32)
            * attn_f[:, None, None, None, :].astype(jnp.float32)
        ).astype(x.dtype)

        p = autopad(self.k, self.p, self.d)

        def one(xi, wi):
            # no preferred_element_type: output dtype == operand dtype keeps
            # the vjp's transpose-conv dtypes consistent under bf16 (XLA
            # still accumulates bf16 convs in fp32 on the MXU)
            return jax.lax.conv_general_dilated(
                xi[None],
                wi,
                window_strides=(self.s, self.s),
                padding=((p, p), (p, p)),
                rhs_dilation=(self.d, self.d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.g,
            )[0]

        out = jax.vmap(one)(x, wmix)
        if bias is not None:
            bmix = (attn_w.astype(jnp.float32) @ bias).astype(x.dtype)  # (B, C2)
            out = out + bmix[:, None, None, :]
        return out


class ODConv(nn.Module):
    """ODConv + BN + SiLU wrapper, the YAML-visible module (reference:
    common.py:4640-4655, ODConv_3rd)."""

    c2: int
    k: int = 1
    s: int = 1
    kerNums: int = 4
    g: int = 1
    p: Union[int, None] = None
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ODConv2d(self.c2, self.k, self.s, self.p, self.g, K=self.kerNums, dtype=self.dtype, name="conv")(
            x, train
        )
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn"
        )(y)
        if self.act is True:
            y = nn.silu(y)
        elif callable(self.act):
            y = self.act(y)
        return y


# aliases matching reference YAML spellings
ODConv_3rd = ODConv


class GhostConv(nn.Module):
    """Ghost convolution (reference: common.py:2001)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, None, c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference: common.py:2014)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="conv1")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, g=c_, act=False, dtype=self.dtype, name="dw")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="conv2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, g=x.shape[-1], act=False, dtype=self.dtype, name="sc_dw")(
                x, train
            )
            sc = Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(
                x, train
            )
        return y + sc


class Contract(nn.Module):
    """Space-to-depth: (B,H,W,C) -> (B,H/g,W/g,C*g^2) (reference: common.py:2029)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.gain
        x = x.reshape(b, h // g, g, w // g, g, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // g, w // g, c * g * g)


class Expand(nn.Module):
    """Depth-to-space: (B,H,W,C) -> (B,H*g,W*g,C/g^2) (reference: common.py:2067)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.gain
        x = x.reshape(b, h, w, g, g, c // (g * g))
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * g, w * g, c // (g * g))


# ---------------------------------------------------------------------------
# Tier-2: transformers, extra attention, CSP variants
# ---------------------------------------------------------------------------


class TransformerLayer(nn.Module):
    """LayerNorm-free transformer layer (reference: common.py:1023-1049:
    q/k/v linears + MHA + two linears, residual adds)."""

    c: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, C)
        q = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h

        def split(t):
            return t.reshape(B, N, h, hd).transpose(0, 2, 1, 3)

        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", split(q), split(k)) / jnp.sqrt(hd).astype(x.dtype), axis=-1
        )
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, split(v)).transpose(0, 2, 1, 3).reshape(B, N, C)
        x = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="ma_out")(out) + x
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc2")(y) + x


class TransformerBlock(nn.Module):
    """Vision-transformer block over flattened spatial positions with a
    learned position embedding (reference: common.py:1052-1078)."""

    c2: int
    num_heads: int = 4
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = Conv(self.c2, dtype=self.dtype, name="conv")(x, train)
        B, H, W, C = x.shape
        p = x.reshape(B, H * W, C)
        p = p + nn.Dense(C, dtype=self.dtype, name="linear")(p)  # learned pos encoding
        for i in range(self.n):
            p = TransformerLayer(C, self.num_heads, dtype=self.dtype, name=f"tr{i}")(p)
        return p.reshape(B, H, W, C)


class C3TR(C3):
    """C3 whose bottleneck stack is a TransformerBlock (reference:
    common.py:1623-1630)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = TransformerBlock(c_, 4, self.n, dtype=self.dtype, name="m")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class C3Ghost(C3):
    """C3 with Ghost bottlenecks (reference: common.py:1798)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = GhostBottleneck(c_, 3, 1, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class SimAM(nn.Module):
    """Parameter-free SimAM attention (reference: common.py:2915-2960):
    energy-based per-neuron weighting, sigmoid gate."""

    e_lambda: float = 1e-4
    dtype: Dtype = jnp.float32  # unused; registry uniformity

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w - 1
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        d = jnp.square(x - mu)
        v = jnp.sum(d, axis=(1, 2), keepdims=True) / n
        e_inv = d / (4 * (v + self.e_lambda)) + 0.5
        return x * jax.nn.sigmoid(e_inv)


class CoorAttention(nn.Module):
    """Coordinate attention (reference: common.py:1399-1460): pooled h/w
    profiles -> shared 1x1 conv -> split h/w sigmoid gates."""

    c2: int
    reduction: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        ph = jnp.mean(x, axis=2)  # (B, H, C)
        pw = jnp.mean(x, axis=1)  # (B, W, C)
        y = jnp.concatenate([ph, pw], axis=1)[:, :, None, :]  # (B, H+W, 1, C)
        y = ConvRaw(mip, 1, use_bias=True, dtype=self.dtype, name="conv1")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.activation.hard_swish(y)
        yh, yw = y[:, :h], y[:, h:]
        gh = jax.nn.sigmoid(ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="conv_h")(yh))  # (B,H,1,C)
        gw = jax.nn.sigmoid(ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="conv_w")(yw))  # (B,W,1,C)
        return x * gh[:, :, 0, :][:, :, None, :] * gw[:, :, 0, :][:, None, :, :]


class SPPCSPC(nn.Module):
    """CSP-style SPP (YOLOv7; reference: common.py:1908-1927)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(2 * self.c2 * self.e)
        x1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        x1 = Conv(c_, 3, 1, dtype=self.dtype, name="cv3")(x1, train)
        x1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv4")(x1, train)
        pools = [x1] + [_maxpool(x1, k) for k in self.k]
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv5")(jnp.concatenate(pools, axis=-1), train)
        y1 = Conv(c_, 3, 1, dtype=self.dtype, name="cv6")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv7")(jnp.concatenate([y1, y2], axis=-1), train)


class Classify(nn.Module):
    """Classification head: GAP + conv + flatten (reference: common.py:2321)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate([jnp.mean(xi, axis=(1, 2)) for xi in x], axis=-1)
        else:
            x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.c2, dtype=self.dtype, name="linear")(x)


# ---------------------------------------------------------------------------
# Tier-2 attention family, continued (reference: common.py attention zoo)
# ---------------------------------------------------------------------------


class ECA(nn.Module):
    """Efficient channel attention (reference: common.py:3062 eca_block):
    GAP -> 1D conv over the channel axis -> sigmoid gate."""

    b: int = 1
    gamma: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        import math as _m

        t = int(abs((_m.log2(c) + self.b) / self.gamma))
        k = t if t % 2 else t + 1
        v = jnp.mean(x, axis=(1, 2))[:, :, None]  # (B, C, 1)
        v = nn.Conv(1, (k,), padding="SAME", use_bias=False, dtype=self.dtype, name="conv")(v)
        return x * nn.sigmoid(v[..., 0])[:, None, None, :]


class BAM(nn.Module):
    """Bottleneck attention module (reference: common.py:3574): parallel
    channel MLP + dilated-conv spatial branch, sigmoid((c + s)), residual
    gate x * (1 + att)."""

    c2: int = 0
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        mid = max(c // self.reduction, 1)
        # channel branch
        v = jnp.mean(x, axis=(1, 2))
        v = nn.Dense(mid, dtype=self.dtype, name="fc1")(v)
        v = nn.relu(v)
        v = nn.Dense(c, dtype=self.dtype, name="fc2")(v)
        ch = v[:, None, None, :]
        # spatial branch: 1x1 reduce, two dilated 3x3, 1x1 to 1 channel
        s = ConvRaw(mid, 1, use_bias=True, dtype=self.dtype, name="sp1")(x)
        s = nn.relu(s)
        s = ConvRaw(mid, 3, d=4, use_bias=True, dtype=self.dtype, name="sp2")(s)
        s = nn.relu(s)
        s = ConvRaw(mid, 3, d=4, use_bias=True, dtype=self.dtype, name="sp3")(s)
        s = nn.relu(s)
        s = ConvRaw(1, 1, use_bias=True, dtype=self.dtype, name="sp4")(s)
        att = nn.sigmoid(ch + s)
        return x * (1.0 + att)


class GAMAttention(nn.Module):
    """Global attention module (reference: common.py:506): channel MLP over
    permuted features + 7x7 conv spatial gate."""

    c2: int = 0
    rate: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        mid = max(c // self.rate, 1)
        v = nn.Dense(mid, dtype=self.dtype, name="fc1")(x)
        v = nn.relu(v)
        v = nn.Dense(c, dtype=self.dtype, name="fc2")(v)
        x = x * nn.sigmoid(v)
        s = ConvRaw(mid, 7, use_bias=True, dtype=self.dtype, name="sp1")(x)
        s = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         dtype=self.dtype, name="bn1")(s)
        s = nn.relu(s)
        s = ConvRaw(c, 7, use_bias=True, dtype=self.dtype, name="sp2")(s)
        s = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         dtype=self.dtype, name="bn2")(s)
        return x * nn.sigmoid(s)


class SKAttention(nn.Module):
    """Selective-kernel attention (reference: common.py:576): multi-kernel
    branches, fused channel descriptor, softmax branch selection."""

    c2: int = 0
    kernels: Tuple[int, ...] = (1, 3, 5, 7)
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        branches = [
            Conv(c, k, 1, g=1, dtype=self.dtype, name=f"k{k}")(x, train) for k in self.kernels
        ]
        u = sum(branches)
        mid = max(c // self.reduction, 32)
        z = nn.Dense(mid, dtype=self.dtype, name="fc")(jnp.mean(u, axis=(1, 2)))
        weights = [nn.Dense(c, dtype=self.dtype, name=f"fc_{k}")(z) for k in self.kernels]
        attn = nn.softmax(jnp.stack(weights, 0), axis=0)  # (nk, B, C)
        out = sum(a[:, None, None, :] * b for a, b in zip(attn, branches))
        return out


class ShuffleAttention(nn.Module):
    """Shuffle attention (reference: common.py:6608): grouped channel +
    spatial gates with channel shuffle."""

    c2: int = 0
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.groups
        cg = c // (2 * g)
        xg = x.reshape(b, h, w, g, 2 * cg)
        x0, x1 = xg[..., :cg], xg[..., cg:]
        # channel gate on x0
        s = jnp.mean(x0, axis=(1, 2), keepdims=True)
        cw = self.param("cweight", nn.initializers.zeros, (1, 1, 1, g, cg), jnp.float32)
        cb = self.param("cbias", nn.initializers.ones, (1, 1, 1, g, cg), jnp.float32)
        x0 = x0 * nn.sigmoid(s * cw + cb)
        # spatial gate on x1 (per-group groupnorm + affine)
        gn = nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=self.dtype, use_fast_variance=False, name="gn")(
            x1.reshape(b, h, w, g * cg)
        ).reshape(b, h, w, g, cg)
        sw = self.param("sweight", nn.initializers.zeros, (1, 1, 1, g, cg), jnp.float32)
        sb = self.param("sbias", nn.initializers.ones, (1, 1, 1, g, cg), jnp.float32)
        x1 = x1 * nn.sigmoid(gn * sw + sb)
        out = jnp.concatenate([x0, x1], axis=-1).reshape(b, h, w, g, 2, cg)
        # channel shuffle
        out = out.transpose(0, 1, 2, 4, 3, 5).reshape(b, h, w, c)
        return out


class NAMAttention(nn.Module):
    """Normalization-based attention (reference: common.py:3050,
    Channel_Att): batch-normalize, weight channels by their normalized
    |gamma| importance, sigmoid-gate the input."""

    c2: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            use_scale=False, use_bias=False, dtype=self.dtype, name="bn",
        )(x)
        y = y * gamma + beta
        g = jnp.abs(gamma)
        wn = g / (jnp.sum(g) + 1e-12) * c
        return x * nn.sigmoid(y * wn)


# ---------------------------------------------------------------------------
# Experimental blocks (reference: models/experimental.py) + more CSP variants
# ---------------------------------------------------------------------------


class CrossConv(nn.Module):
    """Cross convolution downsample: 1xk then kx1 (reference:
    experimental.py:15-27)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, (1, self.k), (1, self.s), dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, (self.k, 1), (self.s, 1), g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class Sum(nn.Module):
    """Weighted sum of N inputs (reference: experimental.py:29-47)."""

    n: int
    weight: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        if self.weight:
            w = self.param("w", lambda k, s: -jnp.arange(1.0, s[0] + 1.0) / 2.0, (self.n - 1,))
            gains = nn.sigmoid(w) * 2.0
            y = xs[0]
            for i in range(1, len(xs)):
                y = y + xs[i] * gains[i - 1].astype(xs[0].dtype)
            return y
        y = xs[0]
        for x in xs[1:]:
            y = y + x
        return y


class MixConv2d(nn.Module):
    """Mixed-kernel conv: channel groups with different kernel sizes
    (reference: experimental.py:50-71)."""

    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.k)
        splits = [self.c2 // n + (1 if i < self.c2 % n else 0) for i in range(n)]
        outs = [
            ConvRaw(c, k, self.s, use_bias=False, dtype=self.dtype, name=f"m{i}")(x)
            for i, (c, k) in enumerate(zip(splits, self.k))
        ]
        y = jnp.concatenate(outs, axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                         dtype=self.dtype, name="bn")(y)
        return nn.silu(y)


class C3SE(C3):
    """C3 with SE-gated bottlenecks (reference: common.py:1746)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, k=((1, 1), (3, 3)), e=1.0, dtype=self.dtype, name=f"m{i}")(
                y1, train
            )
            y1 = SE(c_, dtype=self.dtype, name=f"se{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class C3ECA(C3):
    """C3 with ECA-gated bottlenecks (reference: common.py:1781)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, k=((1, 1), (3, 3)), e=1.0, dtype=self.dtype, name=f"m{i}")(
                y1, train
            )
            y1 = ECA(dtype=self.dtype, name=f"eca{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class C3SPP(C3):
    """C3 whose stack is an SPP block (reference: common.py:1790)."""

    k: Tuple[int, ...] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = SPP(c_, (5, 9, 13), dtype=self.dtype, name="m")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class C3x(C3):
    """C3 with cross-convolutions (reference: common.py:1568)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = CrossConv(c_, 3, 1, self.g, 1.0, self.shortcut, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class RepC3(nn.Module):
    """RT-DETR style RepC3 (reference: common.py:1578): plain 3x3 stack +
    parallel 1x1, summed."""

    c2: int
    n: int = 3
    e: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Conv(c_, 3, 1, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = y1 + y2
        if c_ != self.c2:
            y = Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="cv3")(y, train)
        return y


class GSConv(nn.Module):
    """Slim-neck GSConv: half standard conv + half depthwise, shuffled
    (reference: imported via common.py)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y1 = Conv(c_, self.k, self.s, g=self.g, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, g=c_, act=self.act, dtype=self.dtype, name="cv2")(y1, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        # channel shuffle between the two halves
        b, h, w, c = y.shape
        return y.reshape(b, h, w, 2, c // 2).transpose(0, 1, 2, 4, 3).reshape(b, h, w, c)


class SPD(nn.Module):
    """Space-to-depth layer (SPD-Conv; reference: common.py:2750-2772)."""

    scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.scale
        parts = [x[:, i::s, j::s, :] for i in range(s) for j in range(s)]
        return jnp.concatenate(parts, axis=-1)
