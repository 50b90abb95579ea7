"""Second-stage classifier filter (reference: utils/general.py:769
apply_classifier + detect.py:93-95).

Re-classifies each detection's crop and keeps only detections whose
second-stage class agrees with the detector's class — the reference's
optional `--classify` path (dead by default there too: it needs a
separately trained resnet50.pt). `classify_fn` is any callable mapping a
(N, 224, 224, 3) float batch in [0,1] to (N, nc) logits — e.g. a
Classify-head model (models/layers.py Classify) loaded via Runner.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax.numpy as jnp


def apply_classifier(
    dets: np.ndarray,  # (M, 6) [x1,y1,x2,y2,conf,cls] in im0 pixel coords
    classify_fn: Callable,
    im0: np.ndarray,  # HWC uint8/float image the coords refer to
    size: int = 224,
) -> np.ndarray:
    """Return the subset of dets whose crop re-classifies to the same class."""
    import cv2

    if len(dets) == 0:
        return dets
    h0, w0 = im0.shape[:2]
    # square the boxes and pad 1.3x + 30px (reference general.py:776-780)
    xy = (dets[:, :2] + dets[:, 2:4]) / 2
    wh = np.maximum(dets[:, 2:4] - dets[:, :2], 0).max(axis=1, keepdims=True)
    wh = wh * 1.3 + 30
    x1y1 = np.clip(xy - wh / 2, 0, [w0 - 1, h0 - 1]).astype(int)
    x2y2 = np.clip(xy + wh / 2, 1, [w0, h0]).astype(int)

    crops = []
    for (x1, y1), (x2, y2) in zip(x1y1, x2y2):
        cut = im0[y1:y2, x1:x2]
        if cut.size == 0:
            cut = np.zeros((2, 2, 3), im0.dtype)
        crops.append(cv2.resize(cut[:, :, ::-1], (size, size)).astype(np.float32) / 255.0)
    batch = np.stack(crops)
    # pad to a power-of-two bucket: a jitted classify_fn then compiles one
    # program per bucket instead of one per distinct detection count
    n = len(batch)
    bucket = 1 << (n - 1).bit_length()
    if bucket > n:
        batch = np.concatenate([batch, np.zeros((bucket - n, size, size, 3), np.float32)])
    logits = np.asarray(classify_fn(jnp.asarray(batch)))[:n]
    cls2 = logits.argmax(1)
    keep = cls2 == dets[:, 5].astype(int)
    return dets[keep]
