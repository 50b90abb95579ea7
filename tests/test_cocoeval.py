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


def test_cross_validation_vs_ap_per_class():
    """Two independent mAP implementations (the YOLOv5-protocol
    ap_per_class and the COCO-protocol evaluator) must agree closely on
    the same synthetic detections — cross-validating both against
    implementation bugs. Protocol differences (1000-pt vs 101-pt grid,
    greedy-vs-unique matching) keep them from being identical; tolerance
    is a few points."""
    from yolosomi_tpu.utils.metrics import ap_per_class, box_iou_np, process_batch

    rng = np.random.default_rng(42)
    n_img, nc = 30, 3
    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    gt_json = {"images": [], "annotations": [], "categories": [{"id": c} for c in range(nc)]}
    dt_json = []
    aid = 1
    for img in range(n_img):
        gt_json["images"].append({"id": img})
        n_gt = int(rng.integers(1, 6))
        gts = []
        # non-overlapping gts (grid cells): overlapping gts expose the
        # protocols' different matching orders (global-IoU-greedy vs
        # score-greedy), which is a real difference, not a bug
        cells = rng.permutation(16)[:n_gt]
        for cell in cells:
            cx, cy = (cell % 4) * 120, (cell // 4) * 120
            x, y = cx + rng.uniform(0, 20), cy + rng.uniform(0, 20)
            w, h = rng.uniform(40, 90, 2)
            c = int(rng.integers(0, nc))
            gts.append([c, x, y, x + w, y + h])
            gt_json["annotations"].append(
                {"id": aid, "image_id": img, "category_id": c,
                 "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0}
            )
            aid += 1
        gts = np.array(gts, np.float32)
        # detections: jittered copies of ALL gts + some false positives.
        # Full recall matters: below max-recall the YOLO protocol's
        # trapz-with-sentinel adds a linear tail to AP that the COCO
        # protocol's step sampling does not — a genuine protocol
        # difference of up to (1 - max_recall)/2, not a bug.
        dets = []
        for g in gts:
            if True:
                j = rng.normal(0, 2, 4)
                b = g[1:] + j
                score = float(rng.uniform(0.5, 1.0))
                dets.append([b[0], b[1], b[2], b[3], score, g[0]])
        for _ in range(rng.integers(0, 3)):
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(20, 100, 2)
            dets.append([x, y, x + w, y + h, float(rng.uniform(0.05, 0.5)), int(rng.integers(0, nc))])
        dets = np.array(dets, np.float32).reshape(-1, 6)
        correct = process_batch(dets, gts, iouv)
        stats.append((correct, dets[:, 4], dets[:, 5], gts[:, 0]))
        for d in dets:
            dt_json.append(
                {"image_id": img, "category_id": int(d[5]),
                 "bbox": [float(d[0]), float(d[1]), float(d[2] - d[0]), float(d[3] - d[1])],
                 "score": float(d[4])}
            )

    stats_np = [np.concatenate(x, 0) for x in zip(*stats)]
    _, _, ap, _, _ = ap_per_class(*stats_np)
    yolo_map50, yolo_map = ap[:, 0].mean(), ap.mean()

    ev = COCOEvaluator(gt_json, dt_json).accumulate()
    s = ev.summarize(log=lambda *_: None)
    assert abs(s[1] - yolo_map50) < 0.05, (s[1], yolo_map50)
    assert abs(s[0] - yolo_map) < 0.05, (s[0], yolo_map)
