"""mAP protocol tests (spec: reference utils/metrics.py:15-168, val.py:50-71)."""

import numpy as np

from yolosomi_tpu.utils.metrics import (
    ConfusionMatrix,
    ap_per_class,
    compute_ap,
    fitness,
    process_batch,
)


def test_fitness_weights():
    x = np.array([1.0, 1.0, 1.0, 1.0])
    assert abs(fitness(x) - 1.0) < 1e-9
    x = np.array([0.0, 0.0, 0.5, 0.5])
    assert abs(fitness(x) - (0.1 * 0.5 + 0.7 * 0.5)) < 1e-9
    # aIoU variant uses [0, 0, 0.1, 0.9] (reference: metrics_aIoU.py:15)
    assert abs(fitness(x, aiou=True) - (0.1 * 0.5 + 0.9 * 0.5)) < 1e-9


def test_compute_ap_perfect():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 1.0])
    ap, _, _ = compute_ap(recall, precision)
    assert ap > 0.99


def test_compute_ap_zero():
    recall = np.array([0.0])
    precision = np.array([0.0])
    ap, _, _ = compute_ap(recall, precision)
    assert ap < 0.02


def test_ap_per_class_perfect_detector():
    n = 50
    tp = np.ones((n, 10), bool)
    conf = np.linspace(0.99, 0.5, n)
    pred_cls = np.zeros(n)
    target_cls = np.zeros(n)
    p, r, ap, f1, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert ap.shape == (1, 10)
    assert ap[0, 0] > 0.97
    assert p[0] > 0.97 and r[0] > 0.9


def test_ap_per_class_half_fp():
    n = 100
    tp = np.zeros((n, 10), bool)
    tp[::2] = True  # alternating TP/FP by confidence
    conf = np.linspace(0.99, 0.5, n)
    pred_cls = np.zeros(n)
    target_cls = np.zeros(50)
    _, _, ap, _, _ = ap_per_class(tp, conf, pred_cls, target_cls)
    assert 0.3 < ap[0, 0] < 0.75


def test_process_batch_exact_match():
    iouv = np.linspace(0.5, 0.95, 10)
    det = np.array([[10, 10, 20, 20, 0.9, 1]], float)
    lab = np.array([[1, 10, 10, 20, 20]], float)
    correct = process_batch(det, lab, iouv)
    assert correct.all()  # IoU 1.0 passes every threshold


def test_process_batch_wrong_class():
    iouv = np.linspace(0.5, 0.95, 10)
    det = np.array([[10, 10, 20, 20, 0.9, 2]], float)
    lab = np.array([[1, 10, 10, 20, 20]], float)
    assert not process_batch(det, lab, iouv).any()


def test_process_batch_partial_iou():
    iouv = np.linspace(0.5, 0.95, 10)
    # IoU = 50/150 ~ 0.33 -> below 0.5, no match
    det = np.array([[0, 0, 10, 10, 0.9, 0]], float)
    lab = np.array([[0, 5, 0, 15, 10]], float)
    assert not process_batch(det, lab, iouv).any()
    # IoU ~ 0.82 -> matches thresholds below 0.82
    det = np.array([[0, 0, 10, 11, 0.9, 0]], float)
    lab = np.array([[0, 0, 1, 10, 11]], float)
    correct = process_batch(det, lab, iouv)
    assert correct[0, 0] and not correct[0, -1]


def test_process_batch_greedy_unique():
    """Two detections on one GT: only the higher-IoU one matches."""
    iouv = np.array([0.5])
    det = np.array(
        [[0, 0, 10, 10, 0.9, 0], [0, 0, 10, 9, 0.8, 0]], float
    )
    lab = np.array([[0, 0, 0, 10, 10]], float)
    correct = process_batch(det, lab, iouv)
    assert correct.sum() == 1
    assert correct[0, 0] and not correct[1, 0]


def test_confusion_matrix_counts():
    cm = ConfusionMatrix(nc=2, conf=0.25, iou_thres=0.45)
    det = np.array([[10, 10, 20, 20, 0.9, 0], [50, 50, 60, 60, 0.8, 1]], float)
    lab = np.array([[0, 10, 10, 20, 20], [1, 50, 50, 60, 60]], float)
    cm.process_batch(det, lab)
    tp, fp = cm.tp_fp()
    assert tp.tolist() == [1.0, 1.0]
    assert fp.tolist() == [0.0, 0.0]


def test_confusion_matrix_background():
    cm = ConfusionMatrix(nc=2)
    det = np.array([[10, 10, 20, 20, 0.9, 0]], float)
    lab = np.zeros((0, 5))
    cm.process_batch(det, lab)
    assert cm.matrix[0, 2] == 1  # background FP for class 0
    cm2 = ConfusionMatrix(nc=2)
    cm2.process_batch(np.zeros((0, 6)), np.array([[1, 10, 10, 20, 20]], float))
    assert cm2.matrix[2, 1] == 1  # background FN for class 1
