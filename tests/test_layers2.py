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


# -- round-2 Tier-2 additions ------------------------------------------------


def test_lska_gate():
    x = jnp.ones((1, 16, 16, 8))
    y = _run(L.LSKA(k_size=11), x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_sppf_lska():
    x = jnp.ones((1, 16, 16, 16))
    y = _run(L.SPPF_LSKA(32), x)
    assert y.shape == (1, 16, 16, 32)


def test_carafe_upsamples():
    x = jnp.ones((2, 8, 8, 16))
    y = _run(L.CARAFE(), x)
    assert y.shape == (2, 16, 16, 16) and bool(jnp.isfinite(y).all())


def test_carafe_constant_preserved():
    """Reassembly weights are a softmax -> a constant map stays constant
    away from the zero-padded border (k_up//2*scale = 4 pixels)."""
    x = jnp.full((1, 8, 8, 4), 3.0)
    y = _run(L.CARAFE(), x)
    np.testing.assert_allclose(np.asarray(y)[:, 5:-5, 5:-5], 3.0, rtol=1e-4)


def test_dysample_upsamples():
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 16)), jnp.float32)
    y = _run(L.DySample(scale=2, groups=4), x)
    assert y.shape == (2, 16, 16, 16) and bool(jnp.isfinite(y).all())


def test_involution_shapes():
    x = jnp.ones((1, 8, 8, 32))
    y = _run(L.Involution(32, kernel_size=3, stride=1), x)
    assert y.shape == (1, 8, 8, 32)
    y2 = _run(L.Involution(32, kernel_size=3, stride=2), x)
    assert y2.shape == (1, 4, 4, 32)


def test_swin_layer_and_c3str():
    x = jnp.asarray(np.random.default_rng(1).random((1, 8, 8, 32)), jnp.float32)
    y = _run(L.SwinTransformerLayer(32, num_heads=2, window_size=4, shift_size=2), x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    y = _run(L.C3STR(32, n=1), x)
    assert y.shape == (1, 8, 8, 32)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = L.window_partition(x, 4)
    back = L.window_reverse(w, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_hor_block():
    x = jnp.asarray(np.random.default_rng(2).random((1, 8, 8, 32)), jnp.float32)
    y = _run(L.HorBlock(32, order=3), x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_zoom_cat():
    l = jnp.ones((1, 16, 16, 8))
    m = jnp.ones((1, 8, 8, 4))
    s = jnp.ones((1, 4, 4, 2))
    mod = L.ZoomCat()
    v = mod.init(jax.random.PRNGKey(0), [l, m, s], False)
    y = mod.apply(v, [l, m, s], False)
    assert y.shape == (1, 8, 8, 14)


def test_c2fcib_and_psa_and_scdown():
    x = jnp.ones((1, 8, 8, 64))
    y = _run(L.C2fCIB(64, n=1, shortcut=True), x)
    assert y.shape == (1, 8, 8, 64)
    y = _run(L.PSA(64), x)
    assert y.shape == (1, 8, 8, 64)
    y = _run(L.SCDown(32, 3, 2), x)
    assert y.shape == (1, 4, 4, 32)


def test_rfem_c3rfem():
    x = jnp.asarray(np.random.default_rng(3).random((1, 8, 8, 16)), jnp.float32)
    y = _run(L.RFEM(16), x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    y = _run(L.C3RFEM(32, n=1), x)
    assert y.shape == (1, 8, 8, 32)


def test_lvcblock_gates():
    x = jnp.asarray(np.random.default_rng(4).random((2, 8, 8, 16)), jnp.float32)
    y = _run(L.LVCBlock(16), x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
    assert (np.asarray(y) >= 0).all()  # relu output


def test_convmixer():
    x = jnp.asarray(np.random.default_rng(5).random((1, 16, 16, 32)), jnp.float32)
    y = _run(L.ConvMixer(32, depth=1), x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


ATTN_BLOCKS = [
    lambda: L.EMAAttention(factor=4),
    lambda: L.LSKblock(),
    lambda: L.MLCA(),
    lambda: L.TripletAttention(),
    lambda: L.GlobalContextBlock(),
    lambda: L.NonLocalBlock(),
    lambda: L.CoTAttention(),
    lambda: L.DoubleAttention(),
    lambda: L.ParallelPolarizedSelfAttention(),
    lambda: L.SpatialGroupEnhance(groups=4),
    lambda: L.MHSA(num_heads=4),
    lambda: L.S2Attention(),
    lambda: L.EfficientAttention(num_heads=4),
    lambda: L.ELA(),
    lambda: L.MSCAAttention(),
    lambda: L.MultiSEAM(),
]


def test_attention_set_channel_preserving():
    """Every round-2 attention block is a drop-in channel-preserving map."""
    x = jnp.asarray(np.random.default_rng(7).random((2, 8, 8, 32)), jnp.float32)
    for make in ATTN_BLOCKS:
        mod = make()
        y = _run(mod, x)
        assert y.shape == x.shape, type(mod).__name__
        assert bool(jnp.isfinite(y).all()), type(mod).__name__
