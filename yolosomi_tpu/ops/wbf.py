"""Weighted boxes fusion (Solovyev et al. 2021).

Replaces the `ensemble_boxes` pip dependency the reference's wbf.py
imports (reference: wbf.py:6,68). Host-side numpy: WBF is an offline
ensembling step over per-model label files, not a hot path.

Algorithm: sort all (weighted) predictions by score; greedily cluster by
same-label IoU > iou_thr against the running fused box; each cluster's
fused box is the score-weighted average of its members and its score is
rescaled by member count vs model count.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _iou(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (a + b - inter + 1e-9)


def weighted_boxes_fusion(
    boxes_list: Sequence[np.ndarray],  # per model: (n, 4) xyxy normalized [0,1]
    scores_list: Sequence[np.ndarray],
    labels_list: Sequence[np.ndarray],
    weights: Sequence[float] | None = None,
    iou_thr: float = 0.55,
    skip_box_thr: float = 0.0,
    conf_type: str = "avg",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fuse per-model predictions; returns (boxes (m,4), scores (m,), labels (m,))."""
    n_models = len(boxes_list)
    if weights is None:
        weights = [1.0] * n_models
    weights = np.asarray(weights, np.float64)

    rows = []
    for mi, (b, s, l) in enumerate(zip(boxes_list, scores_list, labels_list)):
        b = np.asarray(b, np.float64).reshape(-1, 4)
        s = np.asarray(s, np.float64).reshape(-1)
        l = np.asarray(l, np.float64).reshape(-1)
        keep = s > skip_box_thr
        for bb, ss, ll in zip(b[keep], s[keep], l[keep]):
            rows.append((ll, ss * weights[mi], weights[mi], mi, *bb))
    if not rows:
        return np.zeros((0, 4)), np.zeros(0), np.zeros(0)
    rows = np.array(rows, np.float64)
    rows = rows[rows[:, 1].argsort()[::-1]]

    fused: List[np.ndarray] = []  # running fused box per cluster [label, score, wsum, _, x1,y1,x2,y2]
    members: List[List[np.ndarray]] = []
    for row in rows:
        matched = -1
        if fused:
            fb = np.array([f[4:8] for f in fused])
            fl = np.array([f[0] for f in fused])
            ious = _iou(row[4:8], fb)
            ious[fl != row[0]] = 0.0
            j = int(np.argmax(ious))
            if ious[j] > iou_thr:
                matched = j
        if matched < 0:
            fused.append(row.copy())
            members.append([row])
        else:
            members[matched].append(row)
            mem = np.array(members[matched])
            w = mem[:, 1]
            box = (mem[:, 4:8] * w[:, None]).sum(0) / w.sum()
            f = fused[matched]
            f[4:8] = box
            f[1] = w.mean() if conf_type == "avg" else w.max()
            f[2] = mem[:, 2].sum()

    out_boxes, out_scores, out_labels = [], [], []
    for f, mem in zip(fused, members):
        mem = np.array(mem)
        score = float(mem[:, 1].mean() if conf_type == "avg" else mem[:, 1].max())
        # rescale by participating models (the WBF paper's T/N factor)
        n_used = len(np.unique(mem[:, 3]))
        score *= min(n_used, n_models) / n_models
        out_boxes.append(f[4:8])
        out_scores.append(score)
        out_labels.append(f[0])
    order = np.argsort(out_scores)[::-1]
    return (
        np.array(out_boxes)[order],
        np.array(out_scores)[order],
        np.array(out_labels)[order],
    )
