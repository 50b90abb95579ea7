"""Native imgproc parity tests (C++ letterbox vs the cv2 oracle)."""

import numpy as np
import pytest

from yolosomi_tpu import native
from yolosomi_tpu.data.augment import letterbox as cv2_letterbox


@pytest.fixture(scope="module")
def img(rng):
    return rng.integers(0, 255, (300, 400, 3), np.uint8)


def test_native_builds():
    assert native.native_available(), "g++ toolchain should be present in this image"


def test_letterbox_geometry_matches_cv2(img):
    ours, r, (dw, dh) = native.letterbox(img, 256)
    ref, (rr, _), (rdw, rdh) = cv2_letterbox(img, (256, 256), auto=False)
    assert ours.shape == ref.shape == (256, 256, 3)
    assert r == pytest.approx(rr, abs=1e-6)
    assert dw == pytest.approx(rdw, abs=0.5) and dh == pytest.approx(rdh, abs=0.5)
    # padding bands equal exactly
    np.testing.assert_array_equal(ours[:32], ref[:32])


def test_letterbox_pixels_close_to_cv2(img):
    ours, _, _ = native.letterbox(img, 256)
    ref, _, _ = cv2_letterbox(img, (256, 256), auto=False)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.mean() < 2.0  # bilinear rounding differences only
    assert (diff <= 10).mean() > 0.99


def test_assemble_batch(img, rng):
    imgs = [img, rng.integers(0, 255, (200, 500, 3), np.uint8)]
    batch, ratios, pads = native.assemble_batch(imgs, 192)
    assert batch.shape == (2, 192, 192, 3)
    assert ratios[0] == pytest.approx(192 / 400)
    assert ratios[1] == pytest.approx(192 / 500)
    # each slot matches the single-image path
    one, r, _ = native.letterbox(imgs[1], 192)
    np.testing.assert_array_equal(batch[1], one)
