"""Box geometry unit tests (spec: reference utils/general.py:532-627)."""

import numpy as np
import pytest

from yolosomi_tpu.utils.boxes import (
    clip_coords,
    letterbox_params,
    scale_coords,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)


def test_xywh_roundtrip(rng):
    boxes = rng.uniform(0, 640, size=(32, 4)).astype(np.float32)
    boxes[:, 2:] = np.abs(boxes[:, 2:]) + 1
    back = xyxy2xywh(xywh2xyxy(boxes))
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-4)


def test_xywh2xyxy_known():
    out = xywh2xyxy(np.array([[10.0, 20.0, 4.0, 6.0]]))
    np.testing.assert_allclose(out, [[8.0, 17.0, 12.0, 23.0]])


def test_xywhn_denormalize():
    out = xywhn2xyxy(np.array([[0.5, 0.5, 0.25, 0.25]]), w=640, h=480, padw=10, padh=20)
    np.testing.assert_allclose(out, [[240 + 10, 180 + 20, 400 + 10, 300 + 20]])


def test_xyxy2xywhn_clips():
    out = xyxy2xywhn(np.array([[-10.0, -10.0, 700.0, 500.0]]), w=640, h=480, clip=True)
    assert (out >= 0).all() and (out <= 1.0 + 1e-6).all()


def test_clip_coords():
    out = clip_coords(np.array([[-5.0, -5.0, 700.0, 700.0]]), (480, 640))
    np.testing.assert_allclose(out, [[0, 0, 640, 480]])


def test_scale_coords_inverts_letterbox():
    # original 400x300 image letterboxed to 640x640
    img0 = (300, 400)  # h, w
    (r, _), new_unpad, (dw, dh) = letterbox_params(img0, (640, 640))
    box_orig = np.array([[100.0, 50.0, 300.0, 250.0]])
    box_lb = box_orig * r + np.array([dw, dh, dw, dh])
    back = scale_coords((640, 640), box_lb, img0)
    np.testing.assert_allclose(back, box_orig, atol=1e-3)


def test_letterbox_params_auto_stride():
    _, _, (dw, dh) = letterbox_params((300, 400), (640, 640), auto=True, stride=32)
    assert (2 * dw) % 32 == 0 or dw == 0
    assert (2 * dh) % 32 == 0 or dh == 0
