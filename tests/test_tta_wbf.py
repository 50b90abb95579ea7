"""TTA + WBF tests (spec: reference yolo.py:1253-1317, wbf.py + the WBF paper)."""

import numpy as np
import jax.numpy as jnp

from yolosomi_tpu.ops.tta import clip_augmented, descale_pred, forward_augment, scale_img
from yolosomi_tpu.ops.wbf import weighted_boxes_fusion


def test_scale_img_pads_to_stride():
    img = jnp.ones((1, 64, 64, 3))
    out = scale_img(img, 0.83, gs=32)
    assert out.shape[1] % 32 == 0 and out.shape[2] % 32 == 0
    assert out.shape[1] >= int(64 * 0.83)


def test_descale_pred_lr_flip():
    pred = jnp.array([[[10.0, 20.0, 4.0, 6.0, 0.9, 0.5]]])
    out = np.asarray(descale_pred(pred, "lr", 1.0, img_w=64))
    assert out[0, 0, 0] == 54.0  # x mirrored
    assert out[0, 0, 1] == 20.0


def test_descale_pred_scale():
    pred = jnp.array([[[10.0, 20.0, 4.0, 6.0, 0.9, 0.5]]])
    out = np.asarray(descale_pred(pred, None, 0.5, img_w=64))
    np.testing.assert_allclose(out[0, 0, :4], [20.0, 40.0, 8.0, 12.0])


def test_clip_augmented_drops_tails():
    nl = 3
    n0, n1, n2 = 84, 63, 42  # divisible by g = 1+4+16 = 21
    rows = [jnp.zeros((1, n, 6)) for n in (n0, n1, n2)]
    out = clip_augmented(rows, nl)
    g = 21
    assert out[0].shape[1] == n0 - (n0 // g) * 1  # clip large tail of scale 1
    assert out[2].shape[1] == n2 - (n2 // g) * 16  # clip small head of last


def test_forward_augment_identity_model():
    """A fake decode that returns fixed boxes per scale: output must return
    to the original frame."""

    def apply_decode(xi):
        b, h, w, _ = xi.shape
        # single box centered at image center, size w/4
        return jnp.tile(jnp.array([[w / 2, h / 2, w / 4, h / 4, 0.9, 1.0]]), (b, 21, 1))

    images = jnp.zeros((1, 64, 64, 3))
    out = np.asarray(forward_augment(apply_decode, images, nl=3, gs=32))
    # every surviving row should decode near the original center (scale-corrected)
    assert out.shape[-1] == 6
    xs = out[0, :, 0]
    assert np.all(xs > 0)


def test_wbf_merges_same_box():
    b1 = np.array([[0.1, 0.1, 0.3, 0.3]])
    b2 = np.array([[0.11, 0.1, 0.31, 0.3]])
    boxes, scores, labels = weighted_boxes_fusion(
        [b1, b2], [np.array([0.9]), np.array([0.8])], [np.array([1]), np.array([1])]
    )
    assert len(boxes) == 1
    assert labels[0] == 1
    # fused box between the two inputs, weighted toward higher score
    assert 0.1 <= boxes[0][0] <= 0.11
    assert scores[0] > 0.8  # both models agree -> no down-scaling


def test_wbf_keeps_different_labels_apart():
    b = np.array([[0.1, 0.1, 0.3, 0.3]])
    boxes, scores, labels = weighted_boxes_fusion(
        [b, b], [np.array([0.9]), np.array([0.8])], [np.array([1]), np.array([2])]
    )
    assert len(boxes) == 2


def test_wbf_single_model_box_downweighted():
    """A box seen by only 1 of 2 models gets score * 1/2 (WBF T/N factor)."""
    b1 = np.array([[0.1, 0.1, 0.3, 0.3]])
    b2 = np.zeros((0, 4))
    boxes, scores, labels = weighted_boxes_fusion(
        [b1, b2], [np.array([0.8]), np.zeros(0)], [np.array([1]), np.zeros(0)]
    )
    assert len(boxes) == 1
    np.testing.assert_allclose(scores[0], 0.4, atol=1e-6)


def test_wbf_empty():
    boxes, scores, labels = weighted_boxes_fusion([np.zeros((0, 4))], [np.zeros(0)], [np.zeros(0)])
    assert len(boxes) == 0
