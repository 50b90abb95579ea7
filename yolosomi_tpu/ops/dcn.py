"""Deformable convolution v2/v3, TPU-native.

Counterpart of the reference's one native component — the DCNv3 CUDA
extension (models/ops_dcnv3/, SURVEY.md §2.9) — and the pure-torch DCNv2
actually reachable from its YAMLs (common.py:3768-3833).

The math spec is the reference's own debug implementation
(dcnv3_core_pytorch, functions/dcnv3_func.py:147-188): normalized
reference points + dilation grid + learned offsets, bilinear sampling
with zeros padding and align_corners=False, softmax-mask-weighted sum
over kernel points. Here that becomes a vectorized XLA gather
(`jnp.take_along_axis` over flattened spatial) — batched gathers
partition cleanly on the data axis and autodiff gives the backward for
free (the reference hand-writes 6 CUDA col2im variants,
dcnv3_im2col_cuda.cuh:279-840).

Layouts are NHWC throughout (the CUDA kernel is also channels-last,
dcnv3_im2col_cuda.cuh:216).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _bilinear_gather(img: jax.Array, px: jax.Array, py: jax.Array) -> jax.Array:
    """Bilinear sample with zeros padding.

    img: (N, H, W, G, Cg); px, py: (N, Q, G) pixel coords (align_corners=
    False convention: valid centers at 0..W-1). Returns (N, Q, G, Cg).
    """
    N, H, W, G, Cg = img.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    imgf = img.reshape(N, H * W, G, Cg).transpose(0, 2, 1, 3)  # (N, G, HW, Cg)

    out = 0.0
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xc = x0 + dx
        yc = y0 + dy
        w = jnp.abs(1.0 - jnp.abs(px - xc)) * jnp.abs(1.0 - jnp.abs(py - yc))
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        flat = (yi * W + xi).transpose(0, 2, 1)  # (N, G, Q)
        tap = jnp.take_along_axis(imgf, flat[..., None], axis=2)  # (N, G, Q, Cg)
        out = out + tap * (w * inb).transpose(0, 2, 1)[..., None]
    return out.transpose(0, 2, 1, 3)  # (N, Q, G, Cg)


def dcnv3_core(
    input: jax.Array,  # (N, H, W, G*Cg) NHWC, unpadded
    offset: jax.Array,  # (N, Hout, Wout, G*P*2) interleaved (x, y)
    mask: jax.Array,  # (N, Hout, Wout, G*P) softmax'd over P
    kernel_h: int,
    kernel_w: int,
    stride_h: int,
    stride_w: int,
    pad_h: int,
    pad_w: int,
    dilation_h: int,
    dilation_w: int,
    group: int,
    group_channels: int,
    offset_scale: float = 1.0,
) -> jax.Array:
    """DCNv3 forward (spec: functions/dcnv3_func.py:147-188)."""
    x = jnp.pad(input, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    N, H_, W_, _ = x.shape
    _, Hout, Wout, _ = offset.shape
    P = kernel_h * kernel_w
    G, Cg = group, group_channels

    # normalized reference points over the padded canvas
    base_y = (dilation_h * (kernel_h - 1)) // 2 + 0.5
    base_x = (dilation_w * (kernel_w - 1)) // 2 + 0.5
    ref_y = (base_y + jnp.arange(Hout, dtype=jnp.float32) * stride_h) / H_
    ref_x = (base_x + jnp.arange(Wout, dtype=jnp.float32) * stride_w) / W_
    ref = jnp.stack(
        [jnp.broadcast_to(ref_x[None, :], (Hout, Wout)), jnp.broadcast_to(ref_y[:, None], (Hout, Wout))],
        axis=-1,
    )  # (Hout, Wout, 2) (x, y)

    # normalized dilation grid (P, 2), kernel-x fastest like the reference's
    # meshgrid(x, y) ij ordering
    gx = -((dilation_w * (kernel_w - 1)) // 2) + jnp.arange(kernel_w, dtype=jnp.float32) * dilation_w
    gy = -((dilation_h * (kernel_h - 1)) // 2) + jnp.arange(kernel_h, dtype=jnp.float32) * dilation_h
    grid = jnp.stack(
        [
            jnp.broadcast_to(gx[:, None], (kernel_w, kernel_h)) / W_,
            jnp.broadcast_to(gy[None, :], (kernel_w, kernel_h)) / H_,
        ],
        axis=-1,
    ).reshape(P, 2)

    off = offset.reshape(N, Hout, Wout, G, P, 2).astype(jnp.float32)
    spatial_norm = jnp.array([W_, H_], jnp.float32)
    loc = (
        ref[None, :, :, None, None, :]
        + grid[None, None, None, None, :, :] * offset_scale
        + off * offset_scale / spatial_norm
    )  # (N, Hout, Wout, G, P, 2) normalized [0, 1]

    # to pixel coords, align_corners=False: pixel = norm * size - 0.5
    px = loc[..., 0] * W_ - 0.5
    py = loc[..., 1] * H_ - 0.5
    Q = Hout * Wout * P
    px = px.transpose(0, 1, 2, 4, 3).reshape(N, Q, G)
    py = py.transpose(0, 1, 2, 4, 3).reshape(N, Q, G)

    img = x.astype(jnp.float32).reshape(N, H_, W_, G, Cg)
    sampled = _bilinear_gather(img, px, py)  # (N, Q, G, Cg)
    sampled = sampled.reshape(N, Hout, Wout, P, G, Cg)
    m = mask.reshape(N, Hout, Wout, G, P).astype(jnp.float32)
    out = jnp.einsum("nhwpgc,nhwgp->nhwgc", sampled, m)
    return out.reshape(N, Hout, Wout, G * Cg).astype(input.dtype)


class DCNv3(nn.Module):
    """DCNv3 module (spec: modules/dcnv3.py:95-221, DCNv3_pytorch):
    input proj, depthwise-conv + LN + GELU context branch producing
    offsets and softmax masks, the core sampling op, optional
    center-feature-scale blend, output proj."""

    channels: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 4
    offset_scale: float = 1.0
    center_feature_scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        N, H, W, C = x.shape
        assert C == self.channels and C % self.group == 0
        G = self.group
        Cg = C // G
        P = self.kernel_size * self.kernel_size

        value = nn.Dense(C, dtype=self.dtype, name="input_proj")(x)

        ctx = nn.Conv(
            C, (self.kernel_size, self.kernel_size), padding="SAME", feature_group_count=C,
            dtype=self.dtype, name="dw_conv",
        )(x)
        ctx = nn.LayerNorm(dtype=self.dtype, use_fast_variance=False, name="norm")(ctx)
        ctx = nn.gelu(ctx)

        # offset/mask heads init to zero: identity sampling at init
        # (reference: _reset_parameters, modules/dcnv3.py:178-186)
        offset = nn.Dense(
            G * P * 2, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="offset",
        )(ctx)
        mask = nn.Dense(
            G * P, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="mask",
        )(ctx)
        mask = nn.softmax(mask.reshape(N, H, W, G, P), axis=-1).reshape(N, H, W, G * P)

        out = dcnv3_core(
            value, offset, mask,
            self.kernel_size, self.kernel_size, self.stride, self.stride,
            self.pad, self.pad, self.dilation, self.dilation, G, Cg, self.offset_scale,
        )

        if self.center_feature_scale:
            w = self.param("cfs_weight", nn.initializers.zeros, (G, C), jnp.float32)
            b = self.param("cfs_bias", nn.initializers.zeros, (G,), jnp.float32)
            scale = jax.nn.sigmoid(jnp.einsum("nhwc,gc->nhwg", ctx.astype(jnp.float32), w) + b)
            scale = jnp.repeat(scale[..., None], Cg, axis=-1).reshape(N, H, W, C).astype(out.dtype)
            out = out * (1 - scale) + value * scale

        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out)


class DCNv2(nn.Module):
    """Modulated deformable conv block (spec: common.py:3768-3833 — the
    deformable conv actually reachable from reference YAMLs): an offset/
    mask conv, a deformable 3x3 conv, BN + SiLU. Offset channel order is
    (dy, dx) pairs like torchvision deform_conv2d."""

    c2: int
    k: int = 3
    s: int = 1
    p: int = 1
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolosomi_tpu.models.layers import BN_EPS, BN_MOMENTUM

        N, H, W, C = x.shape
        k = self.k
        P = k * k
        om = nn.Conv(
            3 * P, (k, k), strides=(self.s, self.s), padding=((self.p, self.p), (self.p, self.p)),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_offset_mask",
        )(x)
        Hout, Wout = om.shape[1:3]
        o1, o2, m = jnp.split(om, 3, axis=-1)
        offset_y = o1.reshape(N, Hout, Wout, P)
        offset_x = o2.reshape(N, Hout, Wout, P)
        mask = jax.nn.sigmoid(m.reshape(N, Hout, Wout, P))

        # sampling locations: y = r*s - pad + i + dy (standard conv tap grid)
        ky = jnp.arange(k, dtype=jnp.float32)
        kx = jnp.arange(k, dtype=jnp.float32)
        grid_y = jnp.broadcast_to(ky[:, None], (k, k)).reshape(P)
        grid_x = jnp.broadcast_to(kx[None, :], (k, k)).reshape(P)
        base_y = jnp.arange(Hout, dtype=jnp.float32) * self.s - self.p
        base_x = jnp.arange(Wout, dtype=jnp.float32) * self.s - self.p
        py = base_y[None, :, None, None] + grid_y[None, None, None, :] + offset_y
        px = base_x[None, None, :, None] + grid_x[None, None, None, :] + offset_x

        Q = Hout * Wout * P
        img = x.astype(jnp.float32).reshape(N, H, W, 1, C)
        sampled = _bilinear_gather(img, px.reshape(N, Q, 1), py.reshape(N, Q, 1))
        sampled = sampled.reshape(N, Hout, Wout, P, C) * mask[..., None]

        weight = self.param(
            "weight", nn.initializers.variance_scaling(2.0, "fan_out", "normal"), (P, C, self.c2), jnp.float32
        )
        out = jnp.einsum("nhwpc,pco->nhwo", sampled, weight).astype(x.dtype)
        out = out + self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32).astype(x.dtype)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype, name="bn"
        )(out)
        return nn.silu(out) if self.act is True else out


class BottleneckDCN(nn.Module):
    """Bottleneck with a DCNv2 second conv (reference: common.py:3849)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolosomi_tpu.models.layers import Conv

        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = DCNv2(self.c2, 3, 1, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C3_DCN(nn.Module):
    """C3 with deformable bottlenecks (reference: common.py:3862)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolosomi_tpu.models.layers import Conv

        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = BottleneckDCN(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], axis=-1), train)


class C2f_DCN(nn.Module):
    """C2f with deformable bottlenecks (reference: common.py:3870)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolosomi_tpu.models.layers import Conv

        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(BottleneckDCN(c, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)
