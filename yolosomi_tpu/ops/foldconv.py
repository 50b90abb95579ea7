"""W-parity folded convolution — a full-lane rewrite of half-lane convs.

TPU vector lanes are 128 wide; a conv whose channel count is 64 wastes
half of every register and VMEM tile. The round-3 width-pad experiment
(PERF.md "width-pad experiment") measured that a c=64 3x3 conv at 160^2
costs the SAME wall time as the true c=128 conv — the cost is layout-
bound, not MAC-bound. This module exploits that: fold the width parity
into the channel dim (B,H,W,C) -> (B,H,W/2,2C) so the tensor is
full-lane, and run an EXACTLY equivalent conv there with a
block-structured (kh,3,2C,2C) kernel built from the original
(kh,kw,C,C) weights.

Math (stride 1, SAME padding, kw=3): with q the output column parity
and dw the original tap offset, the folded tap column offset is
u = (q+dw)//2 and the input parity r = (q+dw)%2, so

    kf[:, u+1, r*C+ci, q*O+co] = k[:, dw+1, ci, co]

and every other entry is zero. SAME padding in folded space is exact:
the u=-1 taps only read parity r=1 (original column 2j-1) and the u=+1
taps only parity r=0 (original column 2j+... == W, the padded one).

The fold quadruples nominal MACs (2Cx2O vs CxO) — on the MXU that is
free at these shapes because the systolic array was idling on lanes,
and the measured wall-time verdict is what tools/probe_fold_conv.py
exists to produce.

Reference counterpart: none — the CUDA reference leaves these convs to
cuDNN. This is TPU-lane engineering on top of the same graph.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Tuple

import jax
import jax.numpy as jnp


@contextmanager
def fold_w_mode(max_c: int = 64):
    """Trace-time switch (same pattern as ops/quant.quant_mode): inside
    the context, ConvRaw routes eligible 3x3 s1 convs with channels
    <= max_c through the folded full-lane path. Wrap model.apply or its
    jit; each mode is its own compiled program."""
    from yolosomi_tpu.models.layers import FOLD_W_MODE

    prev = FOLD_W_MODE[0]
    FOLD_W_MODE[0] = int(max_c)
    try:
        yield
    finally:
        FOLD_W_MODE[0] = prev


def fold_w(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,H,W//2,2C); channel block p*C+c holds column parity p."""
    b, h, w, c = x.shape
    assert w % 2 == 0, f"fold_w needs even W, got {w}"
    return x.reshape(b, h, w // 2, 2 * c)


def unfold_w(x: jax.Array) -> jax.Array:
    """Inverse of fold_w: (B,H,W2,2C) -> (B,H,2*W2,C)."""
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, 2 * w2, c2 // 2)


def fold_kernel(k: jax.Array) -> jax.Array:
    """(kh,3,Ci,Co) stride-1 kernel -> (kh,3,2Ci,2Co) folded-space kernel."""
    kh, kw, ci, co = k.shape
    assert kw == 3, f"fold_kernel supports kw=3, got {kw}"
    kf = jnp.zeros((kh, 3, 2 * ci, 2 * co), k.dtype)
    for q in (0, 1):
        for dw in (-1, 0, 1):
            u, r = (q + dw) // 2, (q + dw) % 2
            kf = kf.at[:, u + 1, r * ci:(r + 1) * ci, q * co:(q + 1) * co].set(k[:, dw + 1])
    return kf


def fold_bn_channel_params(v: jax.Array) -> jax.Array:
    """Duplicate per-channel vectors (BN scale/bias/mean/var, conv bias)
    into folded-channel layout: (C,) -> (2C,) = [v | v]."""
    return jnp.concatenate([v, v], axis=-1)


def conv_folded(x_f: jax.Array, kf: jax.Array, pad_h: int = 1) -> jax.Array:
    """Stride-1 conv in folded space. x_f: (B,H,W2,2C); kf from fold_kernel."""
    return jax.lax.conv_general_dilated(
        x_f, kf, window_strides=(1, 1),
        padding=((pad_h, pad_h), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3x3_w_folded(x: jax.Array, k: jax.Array) -> jax.Array:
    """Reference entry: fold -> conv -> unfold, equal to SAME 3x3 s1 conv."""
    return unfold_w(conv_folded(fold_w(x), fold_kernel(k)))
