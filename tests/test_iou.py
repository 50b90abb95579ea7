"""IoU family unit tests (spec: reference utils/metrics.py:208-480)."""

import numpy as np
import pytest
import jax.numpy as jnp

from yolosomi_tpu.utils.iou import (
    bbox_iou,
    box_iou,
    bbox_ioa,
    wasserstein,
    wasserstein_loss,
    wh_iou,
)


def test_iou_identity():
    b = jnp.array([[10.0, 10.0, 4.0, 4.0]])
    assert abs(float(bbox_iou(b, b)[0]) - 1.0) < 1e-5


def test_iou_disjoint():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[100.0, 100.0, 2.0, 2.0]])
    assert float(bbox_iou(a, b)[0]) < 1e-6


def test_iou_half_overlap():
    # two 2x2 boxes sharing half their area: inter=2, union=6
    a = jnp.array([[1.0, 1.0, 2.0, 2.0]])
    b = jnp.array([[2.0, 1.0, 2.0, 2.0]])
    assert abs(float(bbox_iou(a, b)[0]) - 2.0 / 6.0) < 1e-5


def test_ciou_less_than_iou_when_offset():
    a = jnp.array([[10.0, 10.0, 4.0, 4.0]])
    b = jnp.array([[12.0, 12.0, 4.0, 8.0]])
    plain = float(bbox_iou(a, b)[0])
    ciou = float(bbox_iou(a, b, CIoU=True)[0])
    assert ciou < plain


def test_ciou_identity_is_one():
    b = jnp.array([[10.0, 10.0, 4.0, 4.0]])
    assert abs(float(bbox_iou(b, b, CIoU=True)[0]) - 1.0) < 1e-4


def test_ciou_grad_finite_at_zero_size_prediction():
    """h==0 predictions (sigmoid-underflowed wh logits) must not NaN the
    CIoU backward: arctan(w/0) has a 0*inf gradient without the
    reference's +eps on heights (metrics.py:184-185) — this silently
    zeroed every flagship train step through the finite-grad guard."""
    import jax

    tbox = jnp.array([[0.5, 0.5, 1.2, 0.8]])
    for pbox in (
        jnp.array([[0.5, 0.5, 1.0, 0.0]]),  # h == 0
        jnp.array([[0.5, 0.5, 0.0, 1.0]]),  # w == 0
        jnp.array([[0.5, 0.5, 0.0, 0.0]]),  # both
    ):
        g = jax.grad(lambda p: (1.0 - bbox_iou(p, tbox, xywh=True, CIoU=True)).sum())(pbox)
        assert bool(jnp.isfinite(g).all()), (pbox, g)


def test_giou_penalty():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[10.0, 0.0, 2.0, 2.0]])
    giou = float(bbox_iou(a, b, GIoU=True)[0])
    assert giou < 0  # disjoint boxes have negative GIoU


def test_box_iou_matrix_shape_and_values():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
    b2 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    m = box_iou(b1, b2)
    assert m.shape == (2, 1)
    assert abs(float(m[0, 0]) - 1.0) < 1e-6
    assert abs(float(m[1, 0]) - 25.0 / 175.0) < 1e-5


def test_bbox_ioa():
    box1 = jnp.array([0.0, 0.0, 10.0, 10.0])
    box2 = jnp.array([[5.0, 5.0, 15.0, 15.0]])
    assert abs(float(bbox_ioa(box1, box2)[0]) - 0.25) < 1e-6


def test_wh_iou():
    m = wh_iou(jnp.array([[4.0, 4.0]]), jnp.array([[4.0, 4.0], [2.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(m), [[1.0, 0.25]], atol=1e-6)


def test_nwd_identity_and_decay():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    far = jnp.array([[100.0, 100.0, 110.0, 110.0]])
    assert float(wasserstein_loss(b, b)[0]) > 0.99
    assert float(wasserstein_loss(b, far)[0]) < float(wasserstein_loss(b, b)[0])
    assert float(wasserstein(b, b)[0]) > 0.99


def test_nwd_small_box_sensitivity():
    # NWD's key property: same absolute offset hurts small boxes more
    small_a = jnp.array([[0.0, 0.0, 4.0, 4.0]])
    small_b = jnp.array([[2.0, 0.0, 6.0, 4.0]])
    # NWD still gives a usable similarity where IoU is already tiny
    assert 0.0 < float(wasserstein_loss(small_a, small_b)[0]) < 1.0


def test_inner_iou_scaling():
    from yolosomi_tpu.utils.iou import bbox_inner_iou

    a = jnp.array([[10.0, 10.0, 8.0, 8.0]])
    b = jnp.array([[12.0, 10.0, 8.0, 8.0]])
    inner = float(bbox_inner_iou(a, b, ratio=0.7)[0])
    full = float(bbox_iou(a, b)[0])
    # shrunken boxes overlap less for the same offset
    assert 0 <= inner < full
    assert float(bbox_inner_iou(a, a, ratio=0.7)[0]) > 0.99


def test_wiou_penalizes_distance():
    from yolosomi_tpu.utils.iou import wiou

    a = jnp.array([[10.0, 10.0, 8.0, 8.0]])
    near = jnp.array([[11.0, 10.0, 8.0, 8.0]])
    # WIoU multiplies IoU by exp(dist/diag) >= 1; equal boxes give ~1
    assert float(wiou(a, a)[0]) == pytest.approx(1.0, abs=1e-4)
    assert float(wiou(a, near)[0]) > float(bbox_iou(a, near)[0])
