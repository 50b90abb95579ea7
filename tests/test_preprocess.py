"""On-device preprocessing tests (spec: reference utils/augmentations.py
via the host implementations as oracles)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosomi_tpu.ops.preprocess import (
    affine_batch,
    flips,
    hsv_jitter,
    normalize,
    preprocess_train_batch,
)


def test_normalize():
    img = jnp.full((1, 4, 4, 3), 255, jnp.uint8)
    out = normalize(img)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_hsv_identity_gains():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    out = hsv_jitter(img, jnp.ones((2, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_hsv_value_gain_scales_brightness():
    img = jnp.full((1, 4, 4, 3), 0.4, jnp.float32)
    out = hsv_jitter(img, jnp.asarray([[1.0, 1.0, 1.5]]))
    np.testing.assert_allclose(np.asarray(out), 0.6, atol=1e-5)


def test_hsv_matches_cv2_oracle():
    """Continuous HSV math vs cv2's uint8 LUT path (sub-2% agreement)."""
    import cv2

    rng = np.random.default_rng(1)
    bgr = rng.integers(0, 255, (32, 32, 3), np.uint8)
    sgain, vgain = 1.3, 0.8
    hue, sat, val = cv2.split(cv2.cvtColor(bgr, cv2.COLOR_BGR2HSV))
    x = np.arange(256)
    lut_sat = np.clip(x * sgain, 0, 255).astype(np.uint8)
    lut_val = np.clip(x * vgain, 0, 255).astype(np.uint8)
    ref = cv2.cvtColor(cv2.merge((hue, cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val))), cv2.COLOR_HSV2BGR)

    rgb = bgr[..., ::-1].astype(np.float32) / 255.0
    ours = np.asarray(hsv_jitter(jnp.asarray(rgb[None]), jnp.asarray([[1.0, sgain, vgain]])))[0]
    ours_bgr = (ours[..., ::-1] * 255).round()
    assert np.abs(ours_bgr.astype(int) - ref.astype(int)).mean() < 5


def test_flips_mirror_labels():
    img = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    t = jnp.array(
        [[[1, 0.25, 0.25, 0.1, 0.1]], [[2, 0.25, 0.25, 0.1, 0.1]]], jnp.float32
    )
    out_img, out_t = flips(img, t, do_lr=jnp.array([True, False]), do_ud=jnp.array([False, True]))
    np.testing.assert_allclose(np.asarray(out_t[0, 0]), [1, 0.75, 0.25, 0.1, 0.1])
    np.testing.assert_allclose(np.asarray(out_t[1, 0]), [2, 0.25, 0.75, 0.1, 0.1])
    np.testing.assert_allclose(np.asarray(out_img[0]), np.asarray(img[0, :, ::-1]))
    np.testing.assert_allclose(np.asarray(out_img[1]), np.asarray(img[1, ::-1]))


def test_affine_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    eye = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    out = affine_batch(img, eye, (8, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_affine_translation_matches_cv2():
    import cv2

    rng = np.random.default_rng(2)
    img = rng.random((16, 16, 3)).astype(np.float32)
    # forward: shift by (+2, +3); inverse matrix shifts back
    inv = np.array([[1.0, 0.0, -2.0], [0.0, 1.0, -3.0]], np.float32)
    ours = np.asarray(affine_batch(jnp.asarray(img[None]), jnp.asarray(inv[None]), (16, 16), fill=0.0))[0]
    ref = cv2.warpAffine(img, np.array([[1, 0, 2], [0, 1, 3]], np.float32), (16, 16), borderValue=0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_preprocess_train_batch_runs_jitted():
    hyp = {"hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "fliplr": 0.5, "flipud": 0.0}
    imgs = jnp.zeros((2, 16, 16, 3), jnp.uint8)
    t = jnp.full((2, 4, 5), -1.0, jnp.float32)
    fn = jax.jit(lambda i, tt, k: preprocess_train_batch(i, tt, k, hyp))
    out_i, out_t = fn(imgs, t, jax.random.PRNGKey(0))
    assert out_i.shape == (2, 16, 16, 3) and out_i.dtype == jnp.float32
    assert out_t.shape == t.shape
