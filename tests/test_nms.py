"""NMS tests: greedy-keep parity with a trivial numpy reference
(spec: reference utils/general.py:629-711 + torchvision greedy NMS)."""

import numpy as np
import jax.numpy as jnp

from yolosomi_tpu.ops.nms import non_max_suppression, soft_nms_scores


def _ref_greedy_nms(boxes, scores, iou_thres):
    """Sequential greedy NMS, the torchvision contract."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= 0:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (a + b - inter + 1e-7)
        suppressed |= iou > iou_thres
    return keep


def _make_pred(boxes_xyxy, obj, cls_probs):
    """Assemble a (1, N, 5+nc) decoded prediction row set."""
    boxes = np.asarray(boxes_xyxy, np.float32)
    xywh = np.stack(
        [
            (boxes[:, 0] + boxes[:, 2]) / 2,
            (boxes[:, 1] + boxes[:, 3]) / 2,
            boxes[:, 2] - boxes[:, 0],
            boxes[:, 3] - boxes[:, 1],
        ],
        -1,
    )
    pred = np.concatenate([xywh, np.asarray(obj, np.float32)[:, None], np.asarray(cls_probs, np.float32)], -1)
    return jnp.asarray(pred[None])


def test_nms_suppresses_overlaps():
    boxes = [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]]
    obj = [0.9, 0.8, 0.7]
    cls = [[1.0], [1.0], [1.0]]  # single class
    out = np.asarray(non_max_suppression(_make_pred(boxes, obj, cls), 0.25, 0.45, max_det=10, max_nms=16))
    valid = out[0][out[0][:, 4] > 0]
    assert len(valid) == 2  # box 1 suppressed by box 0
    np.testing.assert_allclose(valid[0, :4], [0, 0, 10, 10], atol=1e-4)
    np.testing.assert_allclose(valid[1, :4], [50, 50, 60, 60], atol=1e-4)


def test_nms_class_offset_keeps_different_classes():
    boxes = [[0, 0, 10, 10], [1, 1, 11, 11]]
    obj = [0.9, 0.8]
    cls = [[1.0, 0.0], [0.0, 1.0]]  # different classes, same location
    out = np.asarray(non_max_suppression(_make_pred(boxes, obj, cls), 0.25, 0.45, max_det=10, max_nms=16))
    valid = out[0][out[0][:, 4] > 0]
    assert len(valid) == 2  # per-class NMS keeps both
    assert set(valid[:, 5].astype(int)) == {0, 1}


def test_nms_agnostic_suppresses_across_classes():
    boxes = [[0, 0, 10, 10], [1, 1, 11, 11]]
    obj = [0.9, 0.8]
    cls = [[1.0, 0.0], [0.0, 1.0]]
    out = np.asarray(
        non_max_suppression(_make_pred(boxes, obj, cls), 0.25, 0.45, agnostic=True, max_det=10, max_nms=16)
    )
    valid = out[0][out[0][:, 4] > 0]
    assert len(valid) == 1


def test_nms_conf_threshold():
    boxes = [[0, 0, 10, 10], [50, 50, 60, 60]]
    obj = [0.9, 0.1]
    cls = [[1.0], [1.0]]
    out = np.asarray(non_max_suppression(_make_pred(boxes, obj, cls), 0.25, 0.45, max_det=10, max_nms=16))
    valid = out[0][out[0][:, 4] > 0]
    assert len(valid) == 1  # 0.1*1.0 < 0.25 dropped


def test_nms_matches_greedy_reference(rng):
    n = 64
    centers = rng.uniform(20, 200, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    keep_ref = _ref_greedy_nms(boxes, scores, 0.5)

    cls = np.ones((n, 1), np.float32)
    out = np.asarray(
        non_max_suppression(_make_pred(boxes, scores, cls), 0.25, 0.5, max_det=64, max_nms=64)
    )[0]
    valid = out[out[:, 4] > 0]
    ref_boxes = boxes[keep_ref]
    assert len(valid) == len(keep_ref)
    np.testing.assert_allclose(valid[:, :4], ref_boxes, atol=1e-3)


def test_nms_multilabel():
    boxes = [[0, 0, 10, 10]]
    obj = [0.9]
    cls = [[0.9, 0.8]]  # both classes above threshold
    out = np.asarray(
        non_max_suppression(_make_pred(boxes, obj, cls), 0.25, 0.45, multi_label=True, max_det=10, max_nms=16)
    )
    valid = out[0][out[0][:, 4] > 0]
    assert len(valid) == 2  # one detection per qualifying class


def test_soft_nms_decays_overlaps():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 11.0, 11.0]])
    scores = jnp.array([0.9, 0.8])
    out = np.asarray(soft_nms_scores(boxes, scores, sigma=0.5, max_det=2))
    assert out[0] == 0.9
    assert 0 < out[1] < 0.8  # decayed, not removed


def test_tiled_nms_matches_sequential_greedy():
    """_nms_single_tiled (the default path) must produce the exact keep set
    of the sequential greedy while-loop, across tile boundaries, buffer
    overflow, and empty inputs."""
    import jax.numpy as jnp
    from yolosomi_tpu.ops.nms import _nms_single, _nms_single_tiled

    rng = np.random.default_rng(7)
    for trial in range(12):
        K = int(rng.choice([32, 300, 1100]))
        n_real = int(rng.integers(0, K + 1))
        boxes = np.zeros((K, 4), np.float32)
        if n_real:
            c = rng.uniform(0, 300, (n_real, 2))
            wh = rng.uniform(10, 90, (n_real, 2))
            boxes[:n_real] = np.concatenate([c - wh / 2, c + wh / 2], 1)
        scores = np.zeros((K,), np.float32)
        scores[:n_real] = np.sort(rng.uniform(0.1, 1.0, n_real))[::-1]
        b, s = jnp.asarray(boxes), jnp.asarray(scores)
        for md in (5, 100):
            i1, v1 = _nms_single(b, s, 0.45, md)
            i2, v2 = _nms_single_tiled(b, s, 0.45, md, tile=256)
            k1 = np.asarray(i1)[np.asarray(v1)]
            k2 = np.asarray(i2)[np.asarray(v2)]
            np.testing.assert_array_equal(k1, k2, err_msg=f"trial {trial} md {md}")


def test_tiled_nms_suppression_chain():
    """A suppression chain (A kills B, dead B must NOT kill C) across the
    iterative self-suppression — the case where one fixed-point iteration
    is not enough."""
    import jax.numpy as jnp
    from yolosomi_tpu.ops.nms import _nms_single_tiled

    # A, B, C on a line: IoU(A,B)=IoU(B,C)=0.43 > τ, IoU(A,C)=0.11 < τ
    # -> greedy keeps {A, C}
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    idx, valid = _nms_single_tiled(boxes, scores, 0.3, 10, tile=256)
    kept = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(kept, [0, 2])


def test_fused_postprocess_matches_unfused():
    """fused_postprocess (serving path) must produce the same detections
    as decode + non_max_suppression for single-label settings."""
    import jax
    import jax.numpy as jnp
    from yolosomi_tpu.models.heads import decode
    from yolosomi_tpu.ops.nms import fused_postprocess, non_max_suppression

    rng = np.random.default_rng(3)
    nc, na = 4, 3
    strides = (8.0, 16.0)
    anchors = np.array([[[10, 13], [16, 30], [33, 23]],
                        [[30, 61], [62, 45], [59, 119]]], np.float32)
    preds = [
        jnp.asarray(rng.normal(0, 2, (2, 8, 8, na, 5 + nc)), jnp.float32),
        jnp.asarray(rng.normal(0, 2, (2, 4, 4, na, 5 + nc)), jnp.float32),
    ]
    dec = decode(preds, anchors, strides)
    ref = np.asarray(non_max_suppression(dec, conf_thres=0.25, iou_thres=0.45,
                                         max_det=50, max_nms=64, exact=True))
    got = np.asarray(fused_postprocess(preds, anchors, strides, conf_thres=0.25,
                                       iou_thres=0.45, max_det=50, max_nms=64))
    # unfused outputs xyxy too; rows are conf-sorted in both
    for b in range(2):
        rv = ref[b][ref[b][:, 4] > 0]
        gv = got[b][got[b][:, 4] > 0]
        assert len(rv) == len(gv), (b, len(rv), len(gv))
        np.testing.assert_allclose(gv, rv, atol=1e-4, rtol=1e-5)


def test_fused_postprocess_classes_pre_argmax():
    """--classes must mask BEFORE the per-box argmax: a box whose best
    class is filtered still surfaces its best allowed class (matching
    non_max_suppression's masking order)."""
    import jax.numpy as jnp
    from yolosomi_tpu.models.heads import decode
    from yolosomi_tpu.ops.nms import fused_postprocess, non_max_suppression

    na, nc = 1, 3
    strides = (8.0,)
    anchors = np.array([[[16, 16]]], np.float32)
    # one confident box: class 0 strongest (disallowed), class 2 allowed
    p = np.full((1, 2, 2, na, 5 + nc), -8.0, np.float32)
    p[0, 1, 1, 0, :4] = [0.0, 0.0, 0.5, 0.5]
    p[0, 1, 1, 0, 4] = 4.0       # obj
    p[0, 1, 1, 0, 5] = 4.0       # class 0 (disallowed)
    p[0, 1, 1, 0, 7] = 2.0       # class 2 (allowed)
    preds = [jnp.asarray(p)]
    allowed = jnp.asarray([False, False, True])
    got = np.asarray(fused_postprocess(preds, anchors, strides, conf_thres=0.25,
                                       classes=allowed, max_det=10, max_nms=4))
    ref = np.asarray(non_max_suppression(
        decode(preds, anchors, strides), conf_thres=0.25, classes=allowed,
        max_det=10, max_nms=4, exact=True))
    gv = got[0][got[0][:, 4] > 0]
    rv = ref[0][ref[0][:, 4] > 0]
    assert len(gv) == len(rv) == 1
    assert gv[0, 5] == rv[0, 5] == 2.0
    np.testing.assert_allclose(gv, rv, atol=1e-4)


def test_greedy_nms_host_hybrid_semantics():
    """--save-hybrid pool rule (reference val.py:162-164): conf-1.0 label
    rows always survive and suppress overlapping same-class predictions;
    other-class overlaps are untouched (class-offset)."""
    from val import _greedy_nms_host

    rows = np.array(
        [
            [10, 10, 50, 50, 1.0, 0],   # label, cls 0
            [12, 12, 52, 52, 0.9, 0],   # pred overlapping label, same cls -> suppressed
            [12, 12, 52, 52, 0.8, 1],   # same box, other cls -> kept
            [200, 200, 240, 240, 0.7, 0],  # far away -> kept
        ],
        np.float32,
    )
    out = _greedy_nms_host(rows, iou_thres=0.5)
    assert len(out) == 3
    assert out[0, 4] == 1.0  # label first (highest conf)
    got = {(round(c, 3), int(k)) for c, k in out[:, 4:6].tolist()}
    assert got == {(1.0, 0), (0.8, 1), (0.7, 0)}
    # empty keep path
    assert len(_greedy_nms_host(rows[:0], 0.5)) == 0
