"""W-parity folded conv (ops/foldconv.py + ConvRaw folded paths).

The fold is a serving-path rewrite of half-lane 3x3 convs into
full-lane folded-space convs (PERF.md round-3 lever 2). These tests pin
exact float equivalence, int8-path equivalence, eligibility guards, and
block-level equivalence on the actual L2 C2fCBAM target.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosomi_tpu.models.layers import C2fCBAM, Conv, ConvRaw, FOLD_W_MODE
from yolosomi_tpu.ops.foldconv import (
    conv3x3_w_folded, fold_kernel, fold_w, fold_w_mode, unfold_w,
)
from yolosomi_tpu.ops.quant import calibrate, quant_mode


def test_fold_math_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 20, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32) * 0.1
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = conv3x3_w_folded(x, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fold_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(unfold_w(fold_w(x))), np.asarray(x))


def test_convraw_folded_path_exact_and_restores():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)), jnp.float32)
    m = ConvRaw(16, 3)
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)
    assert FOLD_W_MODE[0] == 0
    with fold_w_mode(64):
        assert FOLD_W_MODE[0] == 64
        got = m.apply(v, x)
    assert FOLD_W_MODE[0] == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "kwargs,shape",
    [
        (dict(k=1), (1, 8, 16, 16)),        # not 3x3
        (dict(k=3, s=2), (1, 8, 16, 16)),   # strided
        (dict(k=3, g=16), (1, 8, 16, 16)),  # grouped
        (dict(k=3), (1, 8, 15, 16)),        # odd W
        (dict(k=3), (1, 8, 16, 128)),       # over the channel threshold
    ],
)
def test_fold_ineligible_falls_back(kwargs, shape):
    """Ineligible convs must take the plain path (same numbers, and the
    guard must not crash on odd widths / groups)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    m = ConvRaw(shape[-1], **kwargs)
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)
    with fold_w_mode(64):
        got = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fold_int8_compose():
    """int8 x fold: the folded int8 conv must reproduce the plain int8
    conv bit-for-bit (same quantized values, duplicated scales)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)
    m = ConvRaw(8, 3)
    v = dict(m.init(jax.random.PRNGKey(0), x))
    v["quant"] = calibrate(m, v, [x])
    with quant_mode("int8"):
        want = m.apply(v, x)
        with fold_w_mode(64):
            got = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_c2fcbam_block_folded_parity():
    """The actual lever target: an L2-shaped C2fCBAM (c=64 internals)
    under fold_w_mode must match the plain forward to float tolerance."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 128)), jnp.float32)
    m = C2fCBAM(128, n=2)
    v = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(v, x)
    with fold_w_mode(64):
        got = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
