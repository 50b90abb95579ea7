"""Activation zoo (reference: utils/activations.py).

Parameter-free activations are plain jnp functions usable as the `act`
callable of Conv (layers.py); the learnable ones (FReLU, AconC,
MetaAconC) are flax modules. The reference's "export-friendly" SiLU/
Hardswish re-implementations are unnecessary here — jax primitives lower
cleanly through jax2tf/StableHLO.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from yolosomi_tpu.models.layers import BN_EPS, BN_MOMENTUM, ConvRaw

Dtype = Any


def silu(x):
    return nn.silu(x)


def hardswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def mish(x):
    """x * tanh(softplus(x)) (reference: activations.py Mish; the
    MemoryEfficientMish variant exists there only to save torch autograd
    memory — jax recomputes under remat for free)."""
    return x * jnp.tanh(nn.softplus(x))


def hardsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class FReLU(nn.Module):
    """Funnel activation: max(x, depthwise-conv-BN(x)) (activations.py:51)."""

    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = ConvRaw(c, self.k, 1, p=1, g=c, use_bias=False, dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype, name="bn",
        )(y)
        return jnp.maximum(x, y)


class AconC(nn.Module):
    """(p1-p2)*x * sigmoid(beta*(p1-p2)*x) + p2*x with learnable per-channel
    p1/p2/beta (activations.py:62)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        p1 = self.param("p1", nn.initializers.normal(1.0), (c,))
        p2 = self.param("p2", nn.initializers.normal(1.0), (c,))
        beta = self.param("beta", nn.initializers.ones, (c,))
        dpx = (p1 - p2).astype(x.dtype) * x
        return dpx * nn.sigmoid(beta.astype(x.dtype) * dpx) + p2.astype(x.dtype) * x


class MetaAconC(nn.Module):
    """AconC whose beta comes from a small GAP->1x1->1x1 network
    (activations.py:79; the reference removes the BN layers — batch-size-1
    instability — and so do we)."""

    r: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        mid = max(self.r, c // self.r)
        p1 = self.param("p1", nn.initializers.normal(1.0), (c,))
        p2 = self.param("p2", nn.initializers.normal(1.0), (c,))
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = ConvRaw(mid, 1, use_bias=True, dtype=self.dtype, name="fc1")(y)
        beta = nn.sigmoid(ConvRaw(c, 1, use_bias=True, dtype=self.dtype, name="fc2")(y))
        dpx = (p1 - p2).astype(x.dtype) * x
        return dpx * nn.sigmoid(beta * dpx) + p2.astype(x.dtype) * x
