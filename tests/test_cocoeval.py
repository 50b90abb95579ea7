"""Vendored COCO evaluator tests (protocol spec: the pycocotools bbox
path the reference invokes, val.py:227-241). Oracles are hand-computable
configurations.
"""

import json

import numpy as np
import pytest

from yolosomi_tpu.utils.cocoeval import COCOEvaluator, IOU_THRS


def make_gt(boxes_per_img, cat=0):
    """boxes: {img_id: [xywh, ...]}"""
    anns, imgs = [], []
    aid = 1
    for img_id, boxes in boxes_per_img.items():
        imgs.append({"id": img_id})
        for b in boxes:
            anns.append(
                {"id": aid, "image_id": img_id, "category_id": cat, "bbox": list(b),
                 "area": b[2] * b[3], "iscrowd": 0}
            )
            aid += 1
    return {"images": imgs, "annotations": anns, "categories": [{"id": cat}]}


def test_perfect_detections():
    gt = make_gt({1: [[10, 10, 20, 20], [50, 50, 30, 30]], 2: [[0, 0, 40, 40]]})
    dt = [
        {"image_id": a["image_id"], "category_id": 0, "bbox": a["bbox"], "score": 0.9}
        for a in gt["annotations"]
    ]
    ev = COCOEvaluator(gt, dt).accumulate()
    s = ev.summarize(log=lambda *_: None)
    assert s[0] == pytest.approx(1.0, abs=0.02)  # AP@[.5:.95]
    assert s[1] == pytest.approx(1.0, abs=0.02)  # AP@0.5
    assert s[8] == pytest.approx(1.0, abs=0.02)  # AR@100


def test_half_recall():
    gt = make_gt({1: [[10, 10, 20, 20], [100, 100, 20, 20]]})
    dt = [{"image_id": 1, "category_id": 0, "bbox": [10, 10, 20, 20], "score": 0.9}]
    ev = COCOEvaluator(gt, dt).accumulate()
    s = ev.summarize(log=lambda *_: None)
    # precision 1.0 up to recall 0.5, zero beyond: 101-pt AP ~= 51/101
    assert s[1] == pytest.approx(51 / 101, abs=0.02)
    assert s[8] == pytest.approx(0.5, abs=0.01)


def test_false_positive_penalty():
    gt = make_gt({1: [[10, 10, 20, 20]]})
    dt = [
        {"image_id": 1, "category_id": 0, "bbox": [10, 10, 20, 20], "score": 0.8},
        {"image_id": 1, "category_id": 0, "bbox": [200, 200, 20, 20], "score": 0.9},  # FP ranked first
    ]
    ev = COCOEvaluator(gt, dt).accumulate()
    s = ev.summarize(log=lambda *_: None)
    # best precision on the PR curve is 0.5 (TP arrives second)
    assert s[1] == pytest.approx(0.5, abs=0.02)


def test_iou_threshold_sweep():
    """A detection at IoU ~0.6 counts below-thr only for thr <= 0.6."""
    gt = make_gt({1: [[0, 0, 100, 100]]})
    # shifted box: inter 75x100 over union 125x100 = 0.6
    dt = [{"image_id": 1, "category_id": 0, "bbox": [25, 0, 100, 100], "score": 0.9}]
    ev = COCOEvaluator(gt, dt).accumulate()
    ev.summarize(log=lambda *_: None)
    p = ev.precision[:, :, 0, 0, 2]  # (T, R) at area=all maxDet=100
    ok = (p.max(axis=1) > 0).astype(int)
    expected = (IOU_THRS <= 0.6 + 1e-9).astype(int)
    np.testing.assert_array_equal(ok, expected)


def test_crowd_ignored():
    gt = make_gt({1: [[10, 10, 20, 20]]})
    gt["annotations"].append(
        {"id": 99, "image_id": 1, "category_id": 0, "bbox": [50, 50, 30, 30],
         "area": 900, "iscrowd": 1}
    )
    # detection only on the crowd region: matched-to-crowd => ignored, not FP
    dt = [
        {"image_id": 1, "category_id": 0, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 0, "bbox": [50, 50, 30, 30], "score": 0.8},
    ]
    ev = COCOEvaluator(gt, dt).accumulate()
    s = ev.summarize(log=lambda *_: None)
    assert s[1] == pytest.approx(1.0, abs=0.02)


def test_from_files_roundtrip(tmp_path):
    gt = make_gt({1: [[10, 10, 20, 20]]})
    dt = [{"image_id": 1, "category_id": 0, "bbox": [10, 10, 20, 20], "score": 0.9}]
    (tmp_path / "gt.json").write_text(json.dumps(gt))
    (tmp_path / "dt.json").write_text(json.dumps(dt))
    ev = COCOEvaluator.from_files(tmp_path / "gt.json", tmp_path / "dt.json").accumulate()
    assert ev.summarize(log=lambda *_: None)[0] > 0.9
