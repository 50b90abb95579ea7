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

import math
from typing import Any, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch BatchNorm2d(momentum=0.03) == flax BatchNorm(momentum=0.97)
# (reference sets momentum 0.03 / eps 1e-3 in torch_utils.py:170-172).
BN_MOMENTUM = 0.97
BN_EPS = 1e-3

KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# int8 serving mode (yolosomi_tpu/ops/quant.py drives this):
#   None   — normal bf16/f32 path
#   "calib"— sow per-conv input absmax into the 'quant_stats' collection
#   "int8" — symmetric per-tensor activation / per-channel weight int8
#            conv with int32 MXU accumulation, when the 'quant' collection
#            provides this conv's activation scale
# Trace-time flag: set it BEFORE jitting the apply; each mode is its own
# compiled program.
QUANT_MODE: list = [None]

# int8 exclusion: regex patterns matched against the module's slash-joined
# flax path (e.g. "layers_35/m0/cv/conv"). A ConvRaw whose path matches any
# pattern stays in the float dtype even under quant_mode("int8") — the
# per-layer sensitivity lever (detect-head convs are the usual exclusion;
# PERF.md round-3 int8 accuracy bound names this as the next lever).
QUANT_EXCLUDE: list = [()]

# Per-CHANNEL activation scales (calib-time flag): sow a (Cin,) absmax
# instead of a scalar. The int8 forward picks its dequant math from the
# stored scale's shape, so inference needs no flag. This is the measured
# answer to the -p3s int8 neck collapse hypothesis (PARETO.md r4): on
# mixed-scale concat consumers a single per-tensor scale saturates the
# low-magnitude branch; per-channel scales fold into the weights
# (w~[c,o] = s_a[c] * w[c,o]) so the MXU path stays int8 x int8 -> int32.
QUANT_ACT_PER_CHANNEL: list = [False]


# W-parity fold serving mode (ops/foldconv.py; PERF.md round-3 lever 2,
# "L2 half-lane C2fCBAM"): rewrite eligible half-lane 3x3 s1 convs as
# full-lane convs in width-folded space — (B,H,W,C)->(B,H,W/2,2C) is a
# free reshape in NHWC, the folded block-structured kernel is exactly
# equivalent (probe parity 0.0), and the MXU stops idling on half its
# lanes. Value = max channel count to fold (64 folds only true
# half-lane convs); falsy = off. Trace-time flag like QUANT_MODE.
FOLD_W_MODE: list = [0]


def _quant_excluded(path: Tuple[str, ...]) -> bool:
    pats = QUANT_EXCLUDE[0]
    if not pats:
        return False
    joined = "/".join(path)
    import re

    return any(re.search(p, joined) for p in pats)


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
        conv = nn.Conv(
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
        )
        mode = QUANT_MODE[0]
        if mode == "calib" and not self.is_initializing():
            if QUANT_ACT_PER_CHANNEL[0]:
                c_in = x.shape[-1]
                self.sow(
                    "quant_stats",
                    "absmax",
                    jnp.max(jnp.abs(x.astype(jnp.float32)), axis=tuple(range(x.ndim - 1))),
                    init_fn=lambda: jnp.zeros((c_in,)),
                    reduce_fn=jnp.maximum,
                )
            else:
                self.sow(
                    "quant_stats",
                    "absmax",
                    jnp.max(jnp.abs(x.astype(jnp.float32))),
                    init_fn=lambda: jnp.zeros(()),
                    reduce_fn=jnp.maximum,
                )
        elif (
            mode == "int8"
            and self.has_variable("quant", "a_scale")
            and not _quant_excluded(self.scope.path)
        ):
            return self._int8_forward(x, conv)
        if self._fold_ok(x) and not self.is_initializing():
            return self._folded_forward(x)
        return conv(x)

    def _fold_ok(self, x) -> bool:
        """Static eligibility for the W-parity folded path: 3x3 s1 d1 g1
        SAME conv whose channels fit under the FOLD_W_MODE threshold and
        whose width is even (all trace-time constants)."""
        max_c = FOLD_W_MODE[0]
        return bool(
            max_c
            and _pair(self.k) == (3, 3)
            and _pair(self.s) == (1, 1)
            and self.d == 1
            and self.g == 1
            and _pair(autopad(self.k, self.p, self.d)) == (1, 1)
            and x.shape[-1] <= max_c
            and self.c2 <= max_c
            and x.shape[2] % 2 == 0
        )

    def _folded_forward(self, x):
        """Full-lane rewrite of a half-lane conv (ops/foldconv.py)."""
        from yolosomi_tpu.ops.foldconv import (
            conv_folded, fold_bn_channel_params, fold_kernel, fold_w, unfold_w,
        )

        p = self.get_variable("params", "conv")
        w = fold_kernel(p["kernel"].astype(self.dtype))
        y = conv_folded(fold_w(x.astype(self.dtype)), w)
        if self.use_bias:
            y = y + fold_bn_channel_params(p["bias"].astype(self.dtype))
        return unfold_w(y)

    def _int8_forward(self, x, conv):
        """Symmetric int8 conv: per-tensor OR per-channel activation scale
        (shape of the calibrated `a_scale` decides), per-out-channel
        weight scale, int32 MXU accumulation — the serving path that
        clears the bf16 compute ceiling (PERF.md)."""
        a_scale = self.get_variable("quant", "a_scale")  # activation absmax
        p = self.get_variable("params", "conv")
        w = p["kernel"].astype(jnp.float32)  # (kh, kw, cin/g, cout)
        per_channel = getattr(a_scale, "ndim", 0) == 1
        if per_channel:
            # fold the (cin,) activation scales into the kernel's input-
            # channel axis (group-aware), THEN take per-out-channel weight
            # scales of the folded kernel — the int8 x int8 -> int32 MXU
            # contraction is unchanged, dequant stays one per-out-channel
            # multiply (QUANT_ACT_PER_CHANNEL rationale above)
            s_a_c = jnp.maximum(a_scale.astype(jnp.float32), 1e-8) / 127.0
            x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_a_c), -127, 127).astype(jnp.int8)
            cin_g = w.shape[2]
            if self.g == 1:
                w_eff = w * s_a_c[None, None, :, None]
            else:
                cout_g = w.shape[3] // self.g
                w5 = w.reshape(w.shape[0], w.shape[1], cin_g, self.g, cout_g)
                w5 = w5 * s_a_c.reshape(self.g, cin_g).T[None, None, :, :, None]
                w_eff = w5.reshape(w.shape)
            w_scale = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)), 1e-8) / 127.0
            w_q = jnp.clip(jnp.round(w_eff / w_scale), -127, 127).astype(jnp.int8)
            s_a = 1.0  # already folded into w_scale's kernel
        else:
            w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
            w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
            s_a = jnp.maximum(a_scale, 1e-8) / 127.0
            x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_a), -127, 127).astype(jnp.int8)
        k = _pair(self.k)
        ph, pw = _pair(autopad(self.k, self.p, self.d))
        if self._fold_ok(x) and not per_channel:
            # int8 x W-parity fold compose: fold the already-quantized
            # kernel (its zeros stay zero), duplicate the per-out-channel
            # scales into folded layout, conv full-lane, unfold.
            from yolosomi_tpu.ops.foldconv import (
                fold_bn_channel_params, fold_kernel, fold_w, unfold_w,
            )

            y = jax.lax.conv_general_dilated(
                fold_w(x_q), fold_kernel(w_q), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = unfold_w(y.astype(jnp.float32) * (s_a * fold_bn_channel_params(w_scale)))
        else:
            y = jax.lax.conv_general_dilated(
                x_q,
                w_q,
                window_strides=_pair(self.s),
                padding=((ph, ph), (pw, pw)),
                rhs_dilation=(self.d, self.d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.g,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (s_a * w_scale)
        if self.use_bias:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(self.dtype)


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

        # GELU flavor: the reference uses torch nn.GELU's default (exact
        # erf), which we match in f32 (training / parity oracles / ONNX
        # mirror). Under bf16 serving the erf-vs-tanh difference (~1e-4
        # relative) is below bf16 rounding (~4e-3 relative) but erf's
        # lowering costs 9% of the flagship's e2e wall (measured: 130.3 vs
        # 119.5 ms/b32, PERF.md round 3) — so bf16 takes the tanh form.
        approx = self.dtype == jnp.bfloat16
        gelu = lambda t: nn.gelu(t, approximate=approx)  # noqa: E731

        # patch-embed depthwise conv + GELU + BN
        y = ConvRaw(c, 3, 1, g=c, use_bias=True, dtype=self.dtype, name="dcov_patch")(x)
        y = norm("bn_patch")(gelu(y))
        for i in range(self.n):
            r = ConvRaw(c, 3, 1, g=c, use_bias=True, dtype=self.dtype, name=f"dw{i}")(y)
            r = norm(f"bn_dw{i}")(gelu(r))
            y = y + r  # residual depthwise mixer
            y = ConvRaw(c, 1, 1, use_bias=True, dtype=self.dtype, name=f"pw{i}")(y)
            y = norm(f"bn_pw{i}")(gelu(y))
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
        # single broadcast+reshape instead of repeat-of-repeat: the chained
        # repeats materialize an intermediate (B,sH,W,C) tensor; one
        # broadcast is a no-copy view XLA can fuse into the consumer
        # (13 upsample/BiFPN sites are pure-bandwidth, PERF.md SoL table)
        b, h, w, c = x.shape
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c))
        return y.reshape(b, h * s, w * s, c)


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
    # Lowering choice, measured round 3 (tools/bench_odconv.py +
    # tools/bench_forward_ab.py, PERF.md): ISOLATED, im2col (patches + one
    # batched matmul) wins 23% at the 320^2 site and loses below; IN-GRAPH
    # the difference vanishes entirely (107.6 vs 108.2 ms/b32 full
    # forward) — XLA amortizes the batch-grouped conv against neighbors.
    # vmap stays the default; "auto" selects im2col for >160^2 inputs;
    # "pos_matmul" is a numerical cross-check (tests/test_odconv_parity.py);
    # "pallas" fuses the 9 taps in VMEM (ops/odconv_pallas.py) — inference
    # only (no VJP) and TPU only; it falls back to vmap otherwise.
    impl: str = "vmap"  # vmap | auto | im2col | pos_matmul | pallas
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

        # mix over K once, then apply the separable factors. The mix runs
        # in the module compute dtype: under bf16 serving this halves the
        # HBM traffic of the (B,kh,kw,cin,cout) mixed-weight tensor (the
        # conv reads it right back), measured fp32 mix cost ~0.13 ms/site
        # (PERF.md round-2 ODConv dissection); fp32 training is unchanged.
        mix_dt = self.dtype
        wmix = jnp.einsum("bk,khwio->bhwio", attn_w.astype(mix_dt), weight.astype(mix_dt))
        wmix = (
            wmix
            * attn_s[:, :, :, None, None].astype(mix_dt)
            * attn_c[:, None, None, :, None].astype(mix_dt)
            * attn_f[:, None, None, None, :].astype(mix_dt)
        ).astype(x.dtype)

        p = autopad(self.k, self.p, self.d)

        impl = self.impl
        if impl == "auto":
            impl = "im2col" if (self.g == 1 and self.d == 1 and h * w > 160 * 160) else "vmap"
        if impl == "pallas":
            from yolosomi_tpu.ops import odconv_pallas

            if train or not odconv_pallas.supported(self.k, self.s, self.g, self.d, h, w, self.c2):
                impl = "vmap"  # kernel has no VJP; training takes the batch-grouped conv

        if impl == "pallas":
            from yolosomi_tpu.ops.odconv_pallas import odconv_s2_pallas

            out = odconv_s2_pallas(x, wmix)
        elif impl == "im2col" and self.g == 1 and self.d == 1:
            # ONE batched matmul: patch-extract the input once, then
            # einsum against the per-sample mixed kernel. XLA lowers
            # batch-grouped convs at ~8x a dense conv's cost (PERF.md);
            # a (B, H'W', kh*kw*cin) x (B, kh*kw*cin, cout) contraction
            # rides the MXU at full batched-matmul rate instead, paying
            # only the patch materialization in HBM.
            patches = jax.lax.conv_general_dilated_patches(
                x,
                filter_shape=(kh, kw),
                window_strides=(self.s, self.s),
                padding=((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (B, oh, ow, cin*kh*kw) with features ordered (cin, kh, kw)
            oh, ow = patches.shape[1], patches.shape[2]
            # match the patch feature order: (kh, kw, cin, cout) -> (cin, kh, kw, cout)
            wflat = wmix.transpose(0, 3, 1, 2, 4).reshape(b, cin_g * kh * kw, self.c2)
            out = jnp.einsum(
                "bpk,bko->bpo",
                patches.reshape(b, oh * ow, cin_g * kh * kw),
                wflat,
            ).reshape(b, oh, ow, self.c2)
        elif impl == "pos_matmul" and self.g == 1 and self.d == 1:
            # decompose the per-sample conv over the k*k kernel positions:
            # each position is a strided slice of the (padded) input times a
            # per-sample (cin, cout) matrix -> k*k batched matmuls, which XLA
            # maps straight onto the MXU (batch-grouped convs often don't).
            xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            oh = (h + 2 * p - kh) // self.s + 1
            ow = (w + 2 * p - kw) // self.s + 1
            out = None
            for dy in range(kh):
                for dx in range(kw):
                    xs_ = jax.lax.slice(
                        xp,
                        (0, dy, dx, 0),
                        (b, dy + (oh - 1) * self.s + 1, dx + (ow - 1) * self.s + 1, c1),
                        (1, self.s, self.s, 1),
                    )  # (B, oh, ow, cin)
                    wpos = wmix[:, dy, dx]  # (B, cin, cout)
                    term = jnp.einsum(
                        "bhwc,bco->bhwo", xs_, wpos, preferred_element_type=jnp.float32
                    )
                    out = term if out is None else out + term
            out = out.astype(x.dtype)
        else:

            def one(xi, wi):
                # no preferred_element_type: output dtype == operand dtype
                # keeps the vjp's transpose-conv dtypes consistent under bf16
                # (XLA still accumulates bf16 convs in fp32 on the MXU)
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


class _TorchMHA(nn.Module):
    """nn.MultiheadAttention body with torch's parameter layout: packed
    in_proj_weight/bias rows [W_q; W_k; W_v], q scaled by head_dim**-0.5
    after projection, out_proj Linear. Kept layout-compatible so a
    reference checkpoint's ma.* keys convert unchanged."""

    c: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):  # each (B, N, C)
        C, h = self.c, self.num_heads
        hd = C // h
        w_in = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * C, C), jnp.float32)
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,), jnp.float32)
        wq, wk, wv = (w_in[:C], w_in[C : 2 * C], w_in[2 * C :])
        bq, bk, bv = (b_in[:C], b_in[C : 2 * C], b_in[2 * C :])
        dt = q.dtype
        q = (q @ wq.T.astype(dt) + bq.astype(dt)) * (hd ** -0.5)
        k = k @ wk.T.astype(dt) + bk.astype(dt)
        v = v @ wv.T.astype(dt) + bv.astype(dt)
        B, N, _ = q.shape

        def split(t):
            return t.reshape(B, N, h, hd).transpose(0, 2, 1, 3)

        attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", split(q), split(k)), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, split(v)).transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class TransformerLayer(nn.Module):
    """Faithful port of the reference TransformerLayer (common.py:1023-1049):
    pre-LN -> q/k/v linears feeding a FULL nn.MultiheadAttention (which
    applies its own packed in_proj on top — the reference double-projects)
    -> residual; pre-LN -> 4x-wide ReLU MLP (bias-free fc1/fc2) ->
    residual. The Dropout(0.1) sites are active only when training with a
    'dropout' rng; eval is deterministic like torch eval()."""

    c: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, N, C)
        drop = train and self.has_rng("dropout")

        def dropout(t, name):
            return nn.Dropout(0.1, deterministic=not drop, name=name)(t)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        q = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="q")(y)
        k = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="k")(y)
        v = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="v")(y)
        x = dropout(_TorchMHA(self.c, self.num_heads, dtype=self.dtype, name="ma")(q, k, v), "drop1") + x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(4 * self.c, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = dropout(nn.relu(y), "drop2")
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return x + dropout(y, "drop3")


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
            p = TransformerLayer(C, self.num_heads, dtype=self.dtype, name=f"tr{i}")(p, train)
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
        c1 = x.shape[-1]
        # equal_ch split: linspace-floor bucket counts (experimental.py:54-55)
        idx = np.floor(np.linspace(0, n - 1e-6, self.c2))
        splits = [int((idx == g).sum()) for g in range(n)]
        # per-branch grouped conv with groups=gcd(c1, c_) (experimental.py:64)
        outs = [
            ConvRaw(c, k, self.s, g=math.gcd(c1, c), use_bias=False, dtype=self.dtype, name=f"m{i}")(x)
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


# ---------------------------------------------------------------------------
# YOLOv10 pieces (reference: common.py:7192 SCDown, :7203 AttentionPSA,
# :7233 PSA, :8945 RepVGGDW, :8981 CIB, :9005 C2fCIB)
# ---------------------------------------------------------------------------


class RepVGGDW(nn.Module):
    """Parallel 7x7 + 3x3 depthwise convs, summed (reference:
    common.py:8945). The fuse() weight-fold is an inference identity XLA
    performs via constant folding; not re-implemented."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2
        a = Conv(c, 7, 1, g=c, act=False, dtype=self.dtype, name="conv")(x, train)
        b = Conv(c, 3, 1, g=c, act=False, dtype=self.dtype, name="conv1")(x, train)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Compact inverted block (reference: common.py:8981)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c1, 3, g=c1, dtype=self.dtype, name="cv1_0")(x, train)
        y = Conv(2 * c_, 1, dtype=self.dtype, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        else:
            y = Conv(2 * c_, 3, g=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = Conv(self.c2, 1, dtype=self.dtype, name="cv1_3")(y, train)
        y = Conv(self.c2, 3, g=self.c2, dtype=self.dtype, name="cv1_4")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCIB(C2f):
    """C2f with CIB bottlenecks (reference: common.py:9005)."""

    lk: bool = False

    def bottleneck(self, i: int, c: int):
        return CIB(c, self.shortcut, e=1.0, lk=self.lk, dtype=self.dtype, name=f"m{i}")


class SCDown(nn.Module):
    """Separable compression downsample (reference: common.py:7192)."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        return Conv(self.c2, self.k, self.s, g=self.c2, act=False, dtype=self.dtype, name="cv2")(y, train)


class AttentionPSA(nn.Module):
    """Single-scale MHSA with positional depthwise conv (reference:
    common.py:7203-7231)."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        qkv = Conv(self.dim + nh_kd * 2, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, self.num_heads, key_dim * 2 + head_dim).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, [key_dim, key_dim * 2], axis=-1)
        attn = jnp.einsum("bhnk,bhmk->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        y = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        pe = Conv(self.dim, 3, 1, g=self.dim, act=False, dtype=self.dtype, name="pe")(
            v.transpose(0, 2, 1, 3).reshape(b, h, w, c), train
        )
        return Conv(self.dim, 1, act=False, dtype=self.dtype, name="proj")(y + pe, train)


class PSA(nn.Module):
    """Partial self-attention block (reference: common.py:7233-7260)."""

    c2: int
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c = int(c1 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, bpart = y[..., :c], y[..., c:]
        bpart = bpart + AttentionPSA(c, num_heads=max(c // 64, 1), dtype=self.dtype, name="attn")(bpart, train)
        f = Conv(c * 2, 1, dtype=self.dtype, name="ffn_0")(bpart, train)
        f = Conv(c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        bpart = bpart + f
        return Conv(c1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, bpart], axis=-1), train)


class MaxPool2d(nn.Module):
    """YAML-visible nn.MaxPool2d with torch [k, s, p] semantics
    (yolov3-tiny rows: k2/s2/p0 halving pools + a k2/s1/p0 tail paired
    with ZeroPad2d)."""

    k: int = 2
    s: int = 2
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.p:
            x = jnp.pad(
                x,
                ((0, 0), (self.p, self.p), (self.p, self.p), (0, 0)),
                constant_values=-jnp.inf,
            )
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, self.k, self.k, 1), (1, self.s, self.s, 1), "VALID"
        ).astype(x.dtype)


class ZeroPad2d(nn.Module):
    """YAML-visible nn.ZeroPad2d (yolov3-tiny row 14: pad (0,1,0,1))."""

    pads: Tuple[int, int, int, int] = (0, 1, 0, 1)  # (left, right, top, bottom)

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, r, t, b = self.pads
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


# ---------------------------------------------------------------------------
# Tier-2 zoo, round 2 (reference: common.py:5570 LSKA, :5682 SPPF_LSKA,
# :4450 CARAFE, :4246 DySample, :6954 Involution, :1171-1660 Swin/C3STR,
# :6797 gnconv/HorBlock, :4312 Zoom_cat)
# ---------------------------------------------------------------------------


class LSKA(nn.Module):
    """Large separable kernel attention (reference: common.py:5570):
    decomposed (1,k)+(k,1) depthwise convs, a dilated pair, a 1x1
    transition, then a multiplicative gate."""

    k_size: int = 11
    dtype: Dtype = jnp.float32

    # (base_k, dilated_k, dilation) per k_size, matching the reference table
    _CFG = {7: (3, 3, 2), 11: (3, 5, 2), 23: (5, 7, 3), 35: (5, 11, 3), 41: (5, 13, 3), 53: (5, 17, 3)}

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        bk, dk, dil = self._CFG[self.k_size]
        a = ConvRaw(c, (1, bk), g=c, use_bias=True, dtype=self.dtype, name="dw_h")(x)
        a = ConvRaw(c, (bk, 1), g=c, use_bias=True, dtype=self.dtype, name="dw_v")(a)
        a = ConvRaw(c, (1, dk), g=c, d=dil, use_bias=True, dtype=self.dtype, name="dwd_h")(a)
        a = ConvRaw(c, (dk, 1), g=c, d=dil, use_bias=True, dtype=self.dtype, name="dwd_v")(a)
        a = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="conv1")(a)
        return x * a


class SPPF_LSKA(nn.Module):
    """SPPF with LSKA attention on the pooled concat (reference:
    common.py:5682)."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = _maxpool(x, self.k)
        y2 = _maxpool(y1, self.k)
        y3 = _maxpool(y2, self.k)
        cat = jnp.concatenate([x, y1, y2, y3], axis=-1)
        cat = LSKA(k_size=11, dtype=self.dtype, name="lska")(cat, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(cat, train)


def _patches(x, k: int, dilation: int = 1, stride: int = 1):
    """NHWC sliding patches -> (B, H', W', C*k*k), channel-slowest order
    (torch nn.Unfold ordering)."""
    pad = (k - 1) // 2 * dilation
    return jax.lax.conv_general_dilated_patches(
        x,
        (k, k),
        (stride, stride),
        ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class CARAFE(nn.Module):
    """Content-aware upsample (reference: common.py:4450): predict a
    (scale*k_up)^2 reassembly kernel per source pixel, pixel-shuffle to the
    upsampled grid, softmax, and reassemble k_up x k_up (dilated by scale)
    neighborhoods of the nearest-upsampled input."""

    k_enc: int = 3
    k_up: int = 5
    c_mid: int = 64
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, k = self.scale, self.k_up
        W = Conv(self.c_mid, 1, dtype=self.dtype, name="comp")(x, train)
        W = Conv((s * k) ** 2, self.k_enc, act=False, dtype=self.dtype, name="enc")(W, train)
        # pixel shuffle: (b,h,w,(s*s)*k2) -> (b,h*s,w*s,k2); torch
        # PixelShuffle splits channels as (k2, s, s) channel-major
        k2 = k * k
        W = W.reshape(b, h, w, k2, s, s).transpose(0, 1, 4, 2, 5, 3).reshape(b, h * s, w * s, k2)
        W = jax.nn.softmax(W.astype(jnp.float32), axis=-1).astype(x.dtype)
        up = _nearest_up2(x, s)
        patches = _patches(up, k, dilation=s)  # (b, hs, ws, c*k2) c-slowest
        patches = patches.reshape(b, h * s, w * s, c, k2)
        return jnp.einsum("bhwk,bhwck->bhwc", W, patches)


def _nearest_up2(x, s: int):
    return jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)


def _bilinear_sample(img, px, py):
    """img (H, W, C); px/py (...,) pixel coords (x right, y down), border
    clamped. Returns (..., C)."""
    H, W = img.shape[0], img.shape[1]
    px = jnp.clip(px, 0.0, W - 1.0)
    py = jnp.clip(py, 0.0, H - 1.0)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) + v10 * (1 - wx) * wy + v11 * wx * wy
    )


class DySample(nn.Module):
    """Dynamic-offset upsample, 'lp' style (reference: common.py:4246):
    predict 2*groups*scale^2 offsets per pixel, add the sub-pixel init
    grid, and bilinearly sample each channel group at its own shifted
    coordinates."""

    scale: int = 2
    groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, g = self.scale, self.groups
        assert c % g == 0
        off = ConvRaw(2 * g * s * s, 1, use_bias=True, dtype=self.dtype, name="offset")(x)
        off = off.astype(jnp.float32) * 0.25
        # init positions: sub-pixel centers of the s x s upsample cells
        grid = (jnp.arange(s, dtype=jnp.float32) - (s - 1) / 2) / s
        iy, ix = jnp.meshgrid(grid, grid, indexing="ij")
        init = jnp.stack([ix, iy], 0).reshape(2, s * s)  # (2, s2) x-then-y
        # offsets laid out (2, g, s2) channel-major in the reference buffer
        off = off.reshape(b, h, w, 2, g, s * s) + init[None, None, None, :, None, :]
        # absolute source coords per (pixel, group, subcell)
        cx = jnp.arange(w, dtype=jnp.float32) + 0.5
        cy = jnp.arange(h, dtype=jnp.float32) + 0.5
        px = off[..., 0, :, :] + cx[None, None, :, None, None] - 0.5
        py = off[..., 1, :, :] + cy[None, :, None, None, None] - 0.5
        # (b, h, w, g, s2) -> upsampled grid (b, h*s, w*s, g)
        def shuffle(o):
            return (
                o.reshape(b, h, w, g, s, s).transpose(0, 1, 4, 2, 5, 3).reshape(b, h * s, w * s, g)
            )
        px, py = shuffle(px), shuffle(py)
        xg = x.reshape(b, h, w, g, c // g)

        def per_image(img, gx, gy):
            def per_group(gi):
                return _bilinear_sample(img[:, :, gi], gx[:, :, gi], gy[:, :, gi])
            return jnp.stack([per_group(gi) for gi in range(g)], axis=2)

        out = jax.vmap(per_image)(xg, px, py)  # (b, hs, ws, g, c/g)
        return out.reshape(b, h * s, w * s, c)


class Involution(nn.Module):
    """Involution: per-pixel, per-group spatial kernels (reference:
    common.py:6954)."""

    c2: int  # unused; involution preserves channels (kept for YAML args)
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        gc = 16
        groups = c // gc
        red = Conv(c // 4, 1, dtype=self.dtype, name="conv1")(
            x if self.stride == 1 else nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride)),
            train,
        )
        k2 = self.kernel_size**2
        weight = Conv(k2 * groups, 1, dtype=self.dtype, name="conv2")(red, train)
        ho, wo = weight.shape[1:3]
        patches = _patches(x, self.kernel_size, stride=self.stride)  # (b,ho,wo,c*k2)
        patches = patches.reshape(b, ho, wo, groups, gc, k2)
        weight = weight.reshape(b, ho, wo, groups, 1, k2)
        return jnp.sum(weight * patches, axis=-1).reshape(b, ho, wo, c)


# -- Swin (reference: common.py:1171-1367) ----------------------------------


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(wins, ws: int, h: int, w: int):
    b = wins.shape[0] // (h * w // ws // ws)
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference: common.py:1171)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):  # x: (B_, N, C)
        ws = self.window_size
        B_, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh),
        )
        coords = jnp.stack(jnp.meshgrid(jnp.arange(ws), jnp.arange(ws), indexing="ij"), 0).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        # index orientation: the reference runs Swin on TRANSPOSED spatial
        # (yolo Swin permutes (B,C,H,W)->(B,W,H,C), common.py:1321), so its
        # bias-table major axis is the natural W delta. We operate on NHWC
        # directly; the W delta (rel[1]) must be the major term for a
        # converted reference checkpoint to read the same table entries
        # (pinned by the C3STR reference oracle).
        idx = (rel[1] + ws - 1) * (2 * ws - 1) + (rel[0] + ws - 1)  # (N, N)
        bias = table[idx.reshape(-1)].reshape(N, N, nh).transpose(2, 0, 1)

        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd**-0.5, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) + bias[None].astype(q.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(B_, nh, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinTransformerLayer(nn.Module):
    """One (shifted-)window transformer layer on NHWC maps (reference:
    common.py:1267-1361; DropPath omitted — inference-identity train
    regularizer)."""

    c: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, C)
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        mask = None
        if ss > 0:
            y = jnp.roll(y, (-ss, -ss), axis=(1, 2))
            # static attention mask for the shifted windows
            img = np.zeros((1, hp, wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                    img[:, hs, wsl] = cnt
                    cnt += 1
            mw = np.reshape(
                np.transpose(
                    img.reshape(1, hp // ws, ws, wp // ws, ws, 1), (0, 1, 3, 2, 4, 5)
                ),
                (-1, ws * ws),
            )
            am = mw[:, None, :] - mw[:, :, None]
            mask = jnp.asarray(np.where(am != 0, -100.0, 0.0), jnp.float32)

        wins = window_partition(y, ws).reshape(-1, ws * ws, c)
        # the reference layer passes qkv_bias=False (common.py:1270-1283)
        wins = WindowAttention(c, ws, self.num_heads, qkv_bias=False, dtype=self.dtype, name="attn")(wins, mask)
        y = window_reverse(wins.reshape(-1, ws, ws, c), ws, hp, wp)
        if ss > 0:
            y = jnp.roll(y, (ss, ss), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(c * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(z)
        # torch nn.GELU default is exact erf; tanh under bf16 (sub-rounding
        # there, and erf lowers expensively — same policy as SEAM above)
        z = nn.gelu(z, approximate=self.dtype == jnp.bfloat16)
        z = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(z)
        return x + z


class SwinTransformerBlock(nn.Module):
    """Stack of alternating plain/shifted Swin layers (reference:
    common.py:1361)."""

    c2: int
    num_heads: int
    num_layers: int
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = Conv(self.c2, 1, dtype=self.dtype, name="conv")(x, train)
        for i in range(self.num_layers):
            x = SwinTransformerLayer(
                self.c2,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                dtype=self.dtype,
                name=f"tr{i}",
            )(x, train)
        return x


class C3STR(nn.Module):
    """C3 with a Swin transformer inner branch (reference: common.py:1632)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a = SwinTransformerBlock(c_, max(c_ // 32, 1), self.n, dtype=self.dtype, name="m")(a, train)
        bshort = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, bshort], axis=-1), train
        )


# -- HorNet (reference: common.py:6797-6952) --------------------------------


class GnConv(nn.Module):
    """Recursive gated convolution g^n-conv (reference: common.py:6797)."""

    dim: int
    order: int = 5
    s: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = [self.dim // 2**i for i in range(self.order)][::-1]
        fused = ConvRaw(2 * self.dim, 1, use_bias=True, dtype=self.dtype, name="proj_in")(x)
        pwa, abc = fused[..., : dims[0]], fused[..., dims[0] :]
        dw = ConvRaw(sum(dims), 7, g=sum(dims), use_bias=True, dtype=self.dtype, name="dwconv")(abc)
        dw = dw * self.s
        splits = np.cumsum(dims)[:-1].tolist()
        dw_list = jnp.split(dw, splits, axis=-1)
        y = pwa * dw_list[0]
        for i in range(self.order - 1):
            y = ConvRaw(dims[i + 1], 1, use_bias=True, dtype=self.dtype, name=f"pw{i}")(y) * dw_list[i + 1]
        return ConvRaw(self.dim, 1, use_bias=True, dtype=self.dtype, name="proj_out")(y)


class HorBlock(nn.Module):
    """HorNet block: gnconv token mixer + MLP, layer-scaled (reference:
    common.py:6869-6894)."""

    c2: int
    order: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        g1 = self.param("gamma1", nn.initializers.constant(1e-6), (c,))
        g2 = self.param("gamma2", nn.initializers.constant(1e-6), (c,))
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = GnConv(c, order=self.order, dtype=self.dtype, name="gnconv")(y, train)
        x = x + g1 * y
        z = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        z = nn.Dense(4 * c, dtype=self.dtype, name="pwconv1")(z)
        z = nn.gelu(z)
        z = nn.Dense(c, dtype=self.dtype, name="pwconv2")(z)
        return x + g2 * z


class ZoomCat(nn.Module):
    """Zoom_cat 3-scale fusion: pool large, upsample small, concat at the
    middle scale (reference: common.py:4312)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        l, m, s = xs
        th, tw = m.shape[1:3]
        kh, kw = l.shape[1] // th, l.shape[2] // tw
        lm = nn.max_pool(l, (kh, kw), (kh, kw)) + nn.avg_pool(l, (kh, kw), (kh, kw))
        sm = jnp.repeat(jnp.repeat(s, th // s.shape[1], 1), tw // s.shape[2], 2)
        return jnp.concatenate([lm, m, sm], axis=-1)


# ---------------------------------------------------------------------------
# RFEM / EVC families (reference: common.py:8298 TridentBlock, :8389 RFEM,
# :8638 C3RFEM, :7978 Encoding, :8034 EVCConvBlock, :8180 LVCBlock,
# :8410 ConvMixer)
# ---------------------------------------------------------------------------


class TridentBlock(nn.Module):
    """Weight-shared 3-branch dilated residual block: the SAME 1x1 + 3x3
    kernels applied at dilation 1/2/3 (reference: common.py:8298). Returns
    the 3 branch maps."""

    c2: int
    stride: int = 1
    e: float = 0.5
    dilate: Tuple[int, int, int] = (1, 2, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        w1 = self.param("share_weightconv1", KERNEL_INIT, (1, 1, c1, c_))
        w2 = self.param("share_weightconv2", KERNEL_INIT, (3, 3, c_, self.c2))

        def norm(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name=name
            )

        bn1, bn2 = norm("bn1"), norm("bn2")

        def branch(inp, d):
            y = jax.lax.conv_general_dilated(
                inp.astype(jnp.float32), w1.astype(jnp.float32), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(self.dtype)
            y = nn.silu(bn1(y))
            y = jax.lax.conv_general_dilated(
                y.astype(jnp.float32), w2.astype(jnp.float32), (self.stride, self.stride),
                ((d, d), (d, d)), rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(self.dtype)
            return nn.silu(bn2(y) + inp)

        xs = [x, x, x] if not isinstance(x, (list, tuple)) else list(x)
        return [branch(xs[i], self.dilate[i]) for i in range(3)]


class RFEM(nn.Module):
    """Receptive-field enhancement: sum of the trident branches + input
    (reference: common.py:8389)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = TridentBlock(self.c2, e=self.e, dtype=self.dtype, name="t0")(x, train)
        for i in range(1, self.n):
            out = TridentBlock(self.c2, e=self.e, dtype=self.dtype, name=f"t{i}")(out, train)
        y = out[0] + out[1] + out[2] + x
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn"
        )(y)
        return nn.silu(y)


class C3RFEM(nn.Module):
    """C3 with an RFEM inner branch (reference: common.py:8638)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = RFEM(c_, n=1, e=self.e, dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class Encoding(nn.Module):
    """Learned codebook soft-assignment encoder (reference: common.py:7978)."""

    num_codes: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, num_codes, C)
        b, h, w, c = x.shape
        k = self.num_codes
        std = 1.0 / ((k * c) ** 0.5)
        codes = self.param("codewords", nn.initializers.uniform(2 * std), (k, c))
        codes = codes - std  # uniform(-std, std)
        scale = self.param("scale", nn.initializers.uniform(1.0), (k,))
        scale = -scale  # uniform(-1, 0)
        flat = x.reshape(b, h * w, 1, c).astype(jnp.float32)
        d2 = jnp.sum(jnp.square(flat - codes[None, None]), axis=-1)  # (b, n, k)
        w_asn = jax.nn.softmax(scale[None, None] * d2, axis=2)
        enc = jnp.sum(w_asn[..., None] * (flat - codes[None, None]), axis=1)  # (b, k, c)
        return enc.astype(self.dtype)


class EVCConvBlock(nn.Module):
    """Bottleneck conv block of the EVC neck (reference: common.py:8034)."""

    c2: int
    res_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 4

        def norm(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=1e-6, dtype=self.dtype, name=name
            )

        y = ConvRaw(c, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = ConvRaw(c, 3, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = ConvRaw(self.c2, 1, use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        res = x
        if self.res_conv:
            res = ConvRaw(self.c2, 1, use_bias=False, dtype=self.dtype, name="residual_conv")(x)
            res = norm("residual_bn")(res)
        return nn.relu(y + res)


class LVCBlock(nn.Module):
    """Learned-vector-codebook channel gating (reference: common.py:8180)."""

    c2: int
    num_codes: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        x = EVCConvBlock(c1, res_conv=True, dtype=self.dtype, name="conv_1")(x, train)
        y = ConvRaw(c1, 1, use_bias=False, dtype=self.dtype, name="lvc_conv")(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="lvc_bn"
        )(y)
        y = nn.relu(y)
        en = Encoding(self.num_codes, dtype=self.dtype, name="encoding")(y)  # (b, k, c)
        en = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="en_bn"
        )(en)
        en = nn.relu(en).mean(axis=1)  # (b, c)
        gam = nn.sigmoid(nn.Dense(c1, dtype=self.dtype, name="fc")(en))
        return nn.relu(x + x * gam[:, None, None, :])


class ConvMixer(nn.Module):
    """Patch-embed + depthwise-mixer stack with an exp SE gate (reference:
    common.py:8410)."""

    c2: int
    depth: int = 1
    kernel_size: int = 3
    patch_size: int = 4
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c2 = c1  # reference forces c2 = c1 (common.py:8412)

        def norm(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name=name
            )

        y = ConvRaw(c2, self.patch_size, self.patch_size, p=0, use_bias=True, dtype=self.dtype, name="patch")(x)
        y = norm("bn_p")(nn.gelu(y))
        for i in range(self.depth):
            r = ConvRaw(c2, self.kernel_size, g=c2, p=1, use_bias=True, dtype=self.dtype, name=f"dw{i}")(y)
            r = norm(f"bn_dw{i}")(nn.gelu(r))
            y = y + r
            y = ConvRaw(c1, 1, use_bias=True, dtype=self.dtype, name=f"pw{i}")(y)
            y = norm(f"bn_pw{i}")(nn.gelu(y))
        v = jnp.mean(y, axis=(1, 2))
        v = nn.relu(nn.Dense(c2 // self.reduction, use_bias=False, dtype=self.dtype, name="fc1")(v))
        v = nn.sigmoid(nn.Dense(c2, use_bias=False, dtype=self.dtype, name="fc2")(v))
        return x * jnp.exp(v)[:, None, None, :]


# ---------------------------------------------------------------------------
# Attention set, round 2 (reference: common.py:5263 EMA, :5295 LSKblock,
# :6353 MLCA, :7124 TripletAttention, :6985 GlobalContextBlock, :7068
# NonLocalBlock, :5961 CoTAttention, :5702 DoubleAttention, :6480
# ParallelPolarizedSelfAttention, :6565 SpatialGroupEnhance, :6312 MHSA,
# :6543 S2Attention, :5876 EfficientAttention, :6228 ELA, :9306
# MSCAAttention, :8527 MultiSEAM)
# All NHWC; each is a drop-in channel-preserving block.
# ---------------------------------------------------------------------------


class EMAAttention(nn.Module):
    """Efficient multi-scale attention (reference: common.py:5263): grouped
    coordinate gating + cross-branch spatial weighting."""

    factor: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.factor
        cg = c // g
        xg = x.reshape(b * g, h, w, cg)
        x_h = jnp.mean(xg, axis=2)  # (bg, h, cg)
        x_w = jnp.mean(xg, axis=1)  # (bg, w, cg)
        hw = jnp.concatenate([x_h, x_w], axis=1)[:, :, None, :]  # (bg, h+w, 1, cg)
        hw = ConvRaw(cg, 1, use_bias=True, dtype=self.dtype, name="conv1x1")(hw)[:, :, 0]
        xh, xw = hw[:, :h], hw[:, h:]
        gated = xg * nn.sigmoid(xh)[:, :, None, :] * nn.sigmoid(xw)[:, None, :, :]
        x1 = nn.GroupNorm(num_groups=cg, dtype=self.dtype, name="gn")(gated)
        x2 = ConvRaw(cg, 3, use_bias=True, dtype=self.dtype, name="conv3x3")(xg)
        a11 = jax.nn.softmax(jnp.mean(x1, axis=(1, 2)), axis=-1)[:, None, :]  # (bg,1,cg)
        a21 = jax.nn.softmax(jnp.mean(x2, axis=(1, 2)), axis=-1)[:, None, :]
        f12 = x2.reshape(b * g, h * w, cg)
        f22 = x1.reshape(b * g, h * w, cg)
        weights = (
            jnp.einsum("bkc,bnc->bn", a11, f12) + jnp.einsum("bkc,bnc->bn", a21, f22)
        ).reshape(b * g, h, w, 1)
        return (xg * nn.sigmoid(weights)).reshape(b, h, w, c)


class LSKblock(nn.Module):
    """Large-selective-kernel spatial gating (reference: common.py:5295)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        a1 = ConvRaw(c, 5, g=c, use_bias=True, dtype=self.dtype, name="conv0")(x)
        a2 = ConvRaw(c, 7, g=c, d=3, use_bias=True, dtype=self.dtype, name="conv_spatial")(a1)
        a1 = ConvRaw(c // 2, 1, use_bias=True, dtype=self.dtype, name="conv1")(a1)
        a2 = ConvRaw(c // 2, 1, use_bias=True, dtype=self.dtype, name="conv2")(a2)
        attn = jnp.concatenate([a1, a2], axis=-1)
        agg = jnp.concatenate(
            [jnp.mean(attn, -1, keepdims=True), jnp.max(attn, -1, keepdims=True)], axis=-1
        )
        sig = nn.sigmoid(ConvRaw(2, 7, use_bias=True, dtype=self.dtype, name="conv_squeeze")(agg))
        attn = a1 * sig[..., 0:1] + a2 * sig[..., 1:2]
        return x * ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="conv")(attn)


def _adaptive_avg_pool(x, out_hw):
    """NHWC adaptive average pool to (oh, ow)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if h == oh and w == ow:
        return x
    if h % oh == 0 and w % ow == 0:
        return x.reshape(b, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


class MLCA(nn.Module):
    """Mixed local-channel attention (reference: common.py:6353)."""

    local_size: int = 5
    gamma: int = 2
    b: int = 1
    local_weight: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b_, h, w, c = x.shape
        ls = self.local_size
        t = int(abs(math.log2(c) + self.b) / self.gamma)
        k = t if t % 2 else t + 1
        k = max(k, 1)
        local = _adaptive_avg_pool(x, (ls, ls))  # (b, ls, ls, c)
        glob = jnp.mean(local, axis=(1, 2))  # (b, c)

        def conv1d(v, name):  # channel-dim 1D conv, kernel k
            # (b, n, c) -> depthwise over c via conv on the channel axis
            vv = v[..., None]  # (b, n, c, 1)
            kern = self.param(name, KERNEL_INIT, (1, k, 1, 1))
            return jax.lax.conv_general_dilated(
                vv.reshape(-1, v.shape[-1], 1)[:, None].astype(jnp.float32),
                kern.reshape(1, k, 1, 1).astype(jnp.float32),
                (1, 1),
                ((0, 0), ((k - 1) // 2, (k - 1) // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(v.shape)

        y_local = conv1d(local.reshape(b_, ls * ls, c), "conv_local").reshape(b_, ls, ls, c)
        y_global = conv1d(glob[:, None, :], "conv")[:, 0]  # (b, c)
        att_local = nn.sigmoid(y_local)
        att_global = jnp.broadcast_to(nn.sigmoid(y_global)[:, None, None, :], att_local.shape)
        att = att_global * (1 - self.local_weight) + att_local * self.local_weight
        att = jax.image.resize(att, (b_, h, w, c), method="linear")
        return x * att.astype(x.dtype)


class TripletAttention(nn.Module):
    """Rotate-to-interact triplet attention (reference: common.py:7124)."""

    dtype: Dtype = jnp.float32

    def _gate(self, t, name):
        z = jnp.concatenate(
            [jnp.max(t, -1, keepdims=True), jnp.mean(t, -1, keepdims=True)], axis=-1
        )
        z = ConvRaw(1, 7, use_bias=False, dtype=self.dtype, name=name)(z)
        return t * nn.sigmoid(z)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # branch 1: channel stays last (plain spatial gate)
        b1 = self._gate(x, "cw")
        # branch 2: rotate H<->C
        b2 = self._gate(x.transpose(0, 3, 2, 1), "hc").transpose(0, 3, 2, 1)
        # branch 3: rotate W<->C
        b3 = self._gate(x.transpose(0, 1, 3, 2), "wc").transpose(0, 1, 3, 2)
        return (b1 + b2 + b3) / 3.0


class GlobalContextBlock(nn.Module):
    """GCNet global-context channel add (reference: common.py:6985)."""

    ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ctx_w = ConvRaw(1, 1, use_bias=True, dtype=self.dtype, name="conv_mask")(x)  # (b,h,w,1)
        ctx_w = jax.nn.softmax(ctx_w.reshape(b, h * w, 1).astype(jnp.float32), axis=1)
        ctx = jnp.einsum("bnk,bnc->bc", ctx_w, x.reshape(b, h * w, c).astype(jnp.float32))
        hid = max(int(c * self.ratio), 1)
        t = nn.Dense(hid, dtype=self.dtype, name="fc1")(ctx.astype(self.dtype))
        t = nn.LayerNorm(dtype=self.dtype, name="ln")(t)
        t = nn.relu(t)
        t = nn.Dense(c, dtype=self.dtype, name="fc2")(t)
        return x + t[:, None, None, :]


class NonLocalBlock(nn.Module):
    """Embedded-Gaussian non-local block (reference: common.py:7068)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        inter = max(c // 2, 1)
        theta = ConvRaw(inter, 1, use_bias=True, dtype=self.dtype, name="theta")(x).reshape(b, h * w, inter)
        phi = ConvRaw(inter, 1, use_bias=True, dtype=self.dtype, name="phi")(x).reshape(b, h * w, inter)
        gfn = ConvRaw(inter, 1, use_bias=True, dtype=self.dtype, name="g")(x).reshape(b, h * w, inter)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta, phi).astype(jnp.float32), axis=-1
        ).astype(x.dtype)
        y = jnp.einsum("bnm,bmc->bnc", attn, gfn).reshape(b, h, w, inter)
        return x + ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="out")(y)


class CoTAttention(nn.Module):
    """Contextual transformer attention (reference: common.py:5961)."""

    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        k = self.kernel_size
        key = Conv(c, k, g=4, act=True, dtype=self.dtype, name="key_embed")(x, train)
        val = Conv(c, 1, act=False, dtype=self.dtype, name="value_embed")(x, train)
        y = jnp.concatenate([key, x], axis=-1)
        att = Conv(2 * c // 4, 1, dtype=self.dtype, name="att1")(y, train)
        att = ConvRaw(k * k * c, 1, use_bias=True, dtype=self.dtype, name="att2")(att)
        att = att.reshape(b, h, w, c, k * k).mean(-1)
        k2 = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(x.dtype) * val
        return key + k2


class DoubleAttention(nn.Module):
    """A2-Nets double attention (reference: common.py:5702)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        cm = max(c // 2, 1)
        A = ConvRaw(cm, 1, use_bias=True, dtype=self.dtype, name="convA")(x).reshape(b, h * w, cm)
        B = ConvRaw(cm, 1, use_bias=True, dtype=self.dtype, name="convB")(x).reshape(b, h * w, cm)
        V = ConvRaw(cm, 1, use_bias=True, dtype=self.dtype, name="convV")(x).reshape(b, h * w, cm)
        att_maps = jax.nn.softmax(B.astype(jnp.float32), axis=1)
        global_desc = jnp.einsum("bnc,bnd->bcd", att_maps, A.astype(jnp.float32))  # (b, cm, cm)
        att_vecs = jax.nn.softmax(V.astype(jnp.float32), axis=-1)
        z = jnp.einsum("bnc,bdc->bnd", att_vecs, global_desc).reshape(b, h, w, cm).astype(x.dtype)
        return x + ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="conv_out")(z)


class ParallelPolarizedSelfAttention(nn.Module):
    """Polarized self-attention, parallel variant (reference:
    common.py:6480)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ch = c // 2
        # channel branch
        wv = ConvRaw(ch, 1, use_bias=True, dtype=self.dtype, name="ch_wv")(x).reshape(b, h * w, ch)
        wq = ConvRaw(1, 1, use_bias=True, dtype=self.dtype, name="ch_wq")(x).reshape(b, h * w, 1)
        wq = jax.nn.softmax(wq.astype(jnp.float32), axis=1).astype(x.dtype)
        z = jnp.einsum("bnc,bnk->bc", wv, wq)[:, None, None, :]  # (b,1,1,ch)
        z = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="ch_wz")(z)
        z = nn.sigmoid(nn.LayerNorm(dtype=self.dtype, name="ln")(z))
        ch_out = x * z
        # spatial branch
        sv = ConvRaw(ch, 1, use_bias=True, dtype=self.dtype, name="sp_wv")(x)
        sq = ConvRaw(ch, 1, use_bias=True, dtype=self.dtype, name="sp_wq")(x)
        sq = jnp.mean(sq, axis=(1, 2))  # (b, ch)
        sq = jax.nn.softmax(sq.astype(jnp.float32), axis=-1).astype(x.dtype)
        sp = nn.sigmoid(jnp.einsum("bhwc,bc->bhw", sv, sq))[..., None]
        return ch_out + x * sp


class SpatialGroupEnhance(nn.Module):
    """SGE grouped spatial gating (reference: common.py:6565)."""

    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.groups
        xg = x.reshape(b * g, h, w, c // g)
        xn = xg * jnp.mean(xg, axis=(1, 2), keepdims=True)
        t = jnp.sum(xn, axis=-1, keepdims=True)  # (bg, h, w, 1)
        mean = jnp.mean(t, axis=(1, 2), keepdims=True)
        std = jnp.std(t, axis=(1, 2), keepdims=True) + 1e-5
        t = (t - mean) / std
        weight = self.param("weight", nn.initializers.ones, (1, 1, 1, g))
        bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, g))
        t = t.reshape(b, h, w, g) * weight + bias
        t = t.reshape(b * g, h, w, 1)
        return (xg * nn.sigmoid(t)).reshape(b, h, w, c)


class MHSA(nn.Module):
    """2D multi-head self-attention with learned positional encodings
    (reference: common.py:6312)."""

    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        q = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="query")(x)
        k = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="key")(x)
        v = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="value")(x)
        rel_h = self.param("rel_h", nn.initializers.normal(0.02), (1, 1, h, 1, hd))
        rel_w = self.param("rel_w", nn.initializers.normal(0.02), (1, w, 1, 1, hd))
        pos = (rel_h + rel_w).reshape(1, h * w, 1, hd)

        def heads(t):
            return t.reshape(b, h * w, nh, hd)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k + 0)  # content
        attn = attn + jnp.einsum("bnhd,kmhd->bhnm", q, jnp.broadcast_to(pos, (1, h * w, 1, hd)))
        attn = jax.nn.softmax(attn.astype(jnp.float32) / math.sqrt(hd), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, c)
        return out


class S2Attention(nn.Module):
    """Spatial-shift MLP attention (reference: common.py:3007/:6543)."""

    dtype: Dtype = jnp.float32

    @staticmethod
    def _shift(x, part: int):
        # 4-way channel-partitioned spatial shift
        b, h, w, c = x.shape
        q = c // 4
        outs = []
        for i, (dy, dx) in enumerate(((0, 1), (0, -1), (1, 0), (-1, 0))):
            seg = x[..., i * q : (i + 1) * q] if i < 3 else x[..., 3 * q :]
            outs.append(jnp.roll(seg, (dy * part, dx * part), axis=(1, 2)))
        return jnp.concatenate(outs, axis=-1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.Dense(c * 3, dtype=self.dtype, name="mlp1")(x)
        x1 = self._shift(y[..., :c], 1)
        x2 = self._shift(y[..., c : 2 * c], -1)
        x3 = y[..., 2 * c :]
        stacked = jnp.stack([x1, x2, x3], axis=1)  # (b,3,h,w,c)
        a = jnp.mean(stacked, axis=(2, 3))  # (b,3,c)
        ahat = nn.Dense(3 * c, dtype=self.dtype, name="mlp_a")(a.reshape(a.shape[0], -1))
        ahat = jax.nn.softmax(ahat.reshape(a.shape[0], 3, c).astype(jnp.float32), axis=1).astype(x.dtype)
        fused = jnp.sum(stacked * ahat[:, :, None, None, :], axis=1)
        return nn.Dense(c, dtype=self.dtype, name="mlp2")(fused)


class EfficientAttention(nn.Module):
    """Linear-complexity attention: softmax(K)^T V context then
    softmax(Q) read-out (reference: common.py:5876)."""

    num_heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        q = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="queries")(x).reshape(b, h * w, nh, hd)
        k = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="keys")(x).reshape(b, h * w, nh, hd)
        v = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="values")(x).reshape(b, h * w, nh, hd)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1)
        q = jax.nn.softmax(q.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum("bnhd,bnhe->bhde", k, v.astype(jnp.float32))
        out = jnp.einsum("bnhd,bhde->bnhe", q, ctx).reshape(b, h, w, c).astype(x.dtype)
        return x + ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="reproj")(out)


class ELA(nn.Module):
    """Efficient local attention: strip-pooled 1D conv gates (reference:
    common.py:6228)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        xh = jnp.mean(x, axis=2)[:, :, None, :]  # (b, h, 1, c)
        xw = jnp.mean(x, axis=1)[:, None, :, :]  # (b, 1, w, c)
        kh = ConvRaw(c, (7, 1), g=c, use_bias=False, dtype=self.dtype, name="conv_h")(xh)
        kw = ConvRaw(c, (1, 7), g=c, use_bias=False, dtype=self.dtype, name="conv_w")(xw)
        gn = nn.GroupNorm(num_groups=16 if c % 16 == 0 else 1, dtype=self.dtype, name="gn")
        ah = nn.sigmoid(gn(kh))
        aw = nn.sigmoid(nn.GroupNorm(num_groups=16 if c % 16 == 0 else 1, dtype=self.dtype, name="gn2")(kw))
        return x * ah * aw


class MSCAAttention(nn.Module):
    """Multi-scale strip-conv attention from SegNeXt (reference:
    common.py:9306)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        u = x
        a = ConvRaw(c, 5, g=c, use_bias=True, dtype=self.dtype, name="conv0")(x)
        for i, k in enumerate((7, 11, 21)):
            s = ConvRaw(c, (1, k), g=c, use_bias=True, dtype=self.dtype, name=f"conv{i}_1")(a)
            s = ConvRaw(c, (k, 1), g=c, use_bias=True, dtype=self.dtype, name=f"conv{i}_2")(s)
            a = a + s
        a = ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="conv3")(a)
        return u * a


class MultiSEAM(nn.Module):
    """SEAM with multi-dilation depthwise branches averaged (reference:
    common.py:8527)."""

    c2: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, d in enumerate((1, 2, 3)):
            c = x.shape[-1]
            y = ConvRaw(c, 3, g=c, d=d, use_bias=True, dtype=self.dtype, name=f"dcov{i}")(x)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
                dtype=self.dtype, name=f"bn{i}",
            )(nn.gelu(y))
            outs.append(y)
        y = sum(outs) / 3.0
        c = x.shape[-1]
        v = jnp.mean(y, axis=(1, 2))
        v = nn.Dense(max(c // 16, 1), use_bias=False, dtype=self.dtype, name="fc1")(v)
        v = nn.relu(v)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(v)
        gate = jnp.exp(nn.sigmoid(v))
        return x * gate[:, None, None, :]
