"""Tier-2 zoo shape/finite tests (spec: reference common.py families)."""

import numpy as np
import jax
import jax.numpy as jnp

from yolosomi_tpu.models import layers as L


def _run(mod, x, train=False):
    variables = mod.init(jax.random.PRNGKey(0), x, train)
    out = mod.apply(variables, x, train, mutable=["batch_stats"] if train else False)
    return out[0] if isinstance(out, tuple) else out


def test_c3tr():
    x = jnp.ones((1, 8, 8, 16))
    y = _run(L.C3TR(16, n=1), x)
    assert y.shape == (1, 8, 8, 16) and bool(jnp.isfinite(y).all())


def test_c3ghost():
    x = jnp.ones((1, 8, 8, 16))
    y = _run(L.C3Ghost(16, n=1), x)
    assert y.shape == (1, 8, 8, 16)


def test_simam_gates():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    y = _run(L.SimAM(), x)
    assert y.shape == x.shape
    # gated output magnitude bounded by input
    assert float(jnp.abs(y).max()) <= float(jnp.abs(x).max()) + 1e-6


def test_coorattention():
    x = jnp.ones((1, 8, 8, 32))
    y = _run(L.CoorAttention(32), x)
    assert y.shape == x.shape


def test_sppcspc():
    x = jnp.ones((1, 8, 8, 32))
    y = _run(L.SPPCSPC(32), x)
    assert y.shape == (1, 8, 8, 32)


def test_classify():
    x = jnp.ones((2, 8, 8, 16))
    y = _run(L.Classify(10), x)
    assert y.shape == (2, 10)


def test_transformer_block():
    x = jnp.ones((1, 4, 4, 16))
    y = _run(L.TransformerBlock(16, num_heads=4, n=1), x)
    assert y.shape == (1, 4, 4, 16)


import pytest


@pytest.mark.parametrize(
    "mod_name,kwargs",
    [("ECA", {}), ("BAM", {}), ("GAMAttention", {}), ("SKAttention", {}),
     ("ShuffleAttention", {}), ("NAMAttention", {})],
)
def test_attention_gates_shape_preserving(mod_name, kwargs):
    mod = getattr(L, mod_name)(**kwargs)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    variables = mod.init(jax.random.PRNGKey(1), x, False)
    y = mod.apply(variables, x, False, mutable=["batch_stats"])
    y = y[0] if isinstance(y, tuple) else y
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_experimental_blocks():
    for mod, cin in [
        (L.CrossConv(16, 3, 2), 16),
        (L.MixConv2d(16, (1, 3), 1), 8),
        (L.C3SE(16, n=1), 16),
        (L.C3ECA(16, n=1), 16),
        (L.C3SPP(16), 16),
        (L.C3x(16, n=1), 16),
        (L.RepC3(16, n=1), 16),
        (L.GSConv(16, 3, 2), 8),
    ]:
        x = jnp.ones((1, 8, 8, cin))
        y = _run(mod, x)
        assert jnp.isfinite(y).all(), type(mod).__name__


def test_sum_and_spd():
    xs = [jnp.ones((1, 4, 4, 8)), jnp.full((1, 4, 4, 8), 2.0)]
    y = _run2 = L.Sum(2).apply(L.Sum(2).init(jax.random.PRNGKey(0), xs), xs)
    np.testing.assert_allclose(np.asarray(y), 3.0)
    spd = L.SPD()
    z = spd.apply(spd.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 4))), jnp.ones((1, 8, 8, 4)))
    assert z.shape == (1, 4, 4, 16)
