"""Parity of the fused Pallas per-sample-weight conv (ops/odconv_pallas)
against jax.lax.conv_general_dilated applied per sample — the same
golden the other ODConv lowerings are checked against
(tests/test_odconv_parity.py). Interpret mode on CPU; the compiled
kernel runs the identical trace on TPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosomi_tpu.ops.odconv_pallas import odconv_s2_pallas, supported


def _ref(x, wmix):
    def one(xi, wi):
        return jax.lax.conv_general_dilated(
            xi[None], wi, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    return jax.vmap(one)(x, wmix)


@pytest.mark.parametrize(
    "b,h,w,cin,cout",
    [
        (2, 16, 16, 8, 128),    # P1-like (cin below lane width -> packed 2-plane)
        (2, 8, 8, 32, 256),     # two N tiles, packed 2-plane
        (2, 8, 8, 128, 256),    # lane-aligned cin -> 4-plane 9-tap path
        (1, 12, 20, 16, 128),   # non-square, oh with odd divisors
    ],
)
def test_matches_per_sample_conv(b, h, w, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    wmix = jnp.asarray(rng.standard_normal((b, 3, 3, cin, cout)) * 0.1, jnp.float32)
    assert supported(3, 2, 1, 1, h, w, cout)
    got = odconv_s2_pallas(x, wmix, interpret=True)
    ref = _ref(x, wmix)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_bf16_matches_bf16_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.bfloat16)
    wmix = jnp.asarray(rng.standard_normal((2, 3, 3, 8, 128)) * 0.1, jnp.bfloat16)
    got = odconv_s2_pallas(x, wmix, interpret=True)
    # golden in f32 — bf16 conv accumulates in f32 on the MXU, as does
    # the kernel's preferred_element_type=f32 accumulator
    ref = _ref(x.astype(jnp.float32), wmix.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.15, rtol=0.03
    )


def test_unsupported_configs_rejected():
    assert not supported(1, 1, 1, 1, 16, 16, 128)  # 1x1 s1
    assert not supported(3, 2, 2, 1, 16, 16, 128)  # grouped
    assert not supported(3, 2, 1, 1, 15, 16, 128)  # odd H
    assert not supported(3, 2, 1, 1, 16, 16, 96)   # cout not lane-aligned
