"""Image-space augmentations (host side, numpy/cv2).

Behavioral counterparts of the reference's utils/augmentations.py:
letterbox (:92), random_perspective (:125), augment_hsv (:48), mixup
(:305), copy_reduce_paste (:238 — the SOMI small-object paster), cutout
(:278), hist_equalize (:64). Geometry matches the reference formulas;
labels ride the same affine matrices.

The fused on-device preprocessing path (SURVEY.md §7.1 "input pipeline on
device") lives in yolosomi_tpu/ops/preprocess.py; this module is the
host fallback and the correctness oracle for it.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Tuple

import cv2
import numpy as np

from yolosomi_tpu.utils.boxes import box_candidates, letterbox_params


def letterbox(
    im: np.ndarray,
    new_shape=(640, 640),
    color=(114, 114, 114),
    auto: bool = True,
    scale_fill: bool = False,
    scaleup: bool = True,
    stride: int = 32,
):
    """Ratio-preserving resize + pad (reference: augmentations.py:92-124).
    Returns (image, ratio, (dw, dh))."""
    shape = im.shape[:2]
    ratio, new_unpad, (dw, dh) = letterbox_params(
        shape, new_shape, scaleup=scaleup, stride=stride, auto=auto, scalefill=scale_fill
    )
    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return im, ratio, (dw, dh)


def augment_hsv(im: np.ndarray, hgain=0.5, sgain=0.5, vgain=0.5) -> np.ndarray:
    """LUT-based HSV jitter (reference: augmentations.py:48-62)."""
    if hgain or sgain or vgain:
        r = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(im.dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(im.dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(im.dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        im = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)
    return im


def hist_equalize(im: np.ndarray, clahe: bool = True, bgr: bool = True) -> np.ndarray:
    """Histogram equalization on the Y channel (reference: augmentations.py:64-73)."""
    yuv = cv2.cvtColor(im, cv2.COLOR_BGR2YUV if bgr else cv2.COLOR_RGB2YUV)
    if clahe:
        c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
        yuv[:, :, 0] = c.apply(yuv[:, :, 0])
    else:
        yuv[:, :, 0] = cv2.equalizeHist(yuv[:, :, 0])
    return cv2.cvtColor(yuv, cv2.COLOR_YUV2BGR if bgr else cv2.COLOR_YUV2RGB)


def replicate(im: np.ndarray, labels: np.ndarray):
    """Duplicate the smallest half of the boxes at random spots
    (reference: augmentations.py:75-89). labels: (n, 5) [cls, x1, y1, x2, y2]
    pixels; returns (im, labels) with the copies appended."""
    h, w = im.shape[:2]
    boxes = labels[:, 1:].astype(int)
    x1, y1, x2, y2 = boxes.T
    s = ((x2 - x1) + (y2 - y1)) / 2  # side length proxy
    for i in s.argsort()[: round(s.size * 0.5)]:  # smallest half
        x1b, y1b, x2b, y2b = boxes[i]
        bh, bw = y2b - y1b, x2b - x1b
        yc, xc = int(random.uniform(0, h - bh)), int(random.uniform(0, w - bw))
        x1a, y1a, x2a, y2a = [xc, yc, xc + bw, yc + bh]
        im[y1a:y2a, x1a:x2a] = im[y1b:y2b, x1b:x2b]
        labels = np.append(labels, [[labels[i, 0], x1a, y1a, x2a, y2a]], axis=0)
    return im, labels


def random_perspective(
    im: np.ndarray,
    targets: Optional[np.ndarray] = None,  # (n, 5) [cls, x1, y1, x2, y2] pixels
    degrees: float = 10,
    translate: float = 0.1,
    scale: float = 0.1,
    shear: float = 10,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
):
    """Center-Perspective-Rotation/scale-Shear-Translation 3x3 compose
    (reference: augmentations.py:125-212). Labels warped with the same
    matrix then filtered by box_candidates."""
    if targets is None:
        targets = np.zeros((0, 5), np.float32)
    M, s, width, height = perspective_params(
        im.shape[0], im.shape[1], degrees=degrees, translate=translate, scale=scale,
        shear=shear, perspective=perspective, border=border,
    )
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            im = cv2.warpPerspective(im, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            im = cv2.warpAffine(im, M[:2], dsize=(width, height), borderValue=(114, 114, 114))
    return im, warp_labels(targets, M, s, width, height, perspective)


def perspective_params(
    h_in: int,
    w_in: int,
    degrees: float = 10,
    translate: float = 0.1,
    scale: float = 0.1,
    shear: float = 10,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
):
    """Sample random_perspective's 3x3 matrix without touching pixels
    (same draw order as the reference, augmentations.py:134-160).
    Returns (M, scale_drawn, out_width, out_height) — the image warp is
    cv2.warpAffine/Perspective with M, or on device an inverse warp with
    np.linalg.inv(M) (ops/mosaic_device.py)."""
    height = h_in + border[0] * 2
    width = w_in + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -w_in / 2
    C[1, 2] = -h_in / 2

    P = np.eye(3)
    P[2, 0] = random.uniform(-perspective, perspective)
    P[2, 1] = random.uniform(-perspective, perspective)

    R = np.eye(3)
    a = random.uniform(-degrees, degrees)
    s = random.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(random.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = random.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = random.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ P @ C
    return M, s, width, height


def warp_labels(targets, M, s, width, height, perspective: float = 0.0):
    """Warp (n, 5) [cls, x1, y1, x2, y2] boxes through M + box_candidates
    filter (the label half of random_perspective)."""
    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)  # 4 corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = np.asarray(
            box_candidates(targets[:, 1:5].T * s, new.T, area_thr=0.1)
        )
        targets = targets[keep]
        targets[:, 1:5] = new[keep]
    return targets


def mixup(im: np.ndarray, labels: np.ndarray, im2: np.ndarray, labels2: np.ndarray):
    """Beta(32,32) image blend, labels concatenated (reference:
    augmentations.py:305-311)."""
    r = np.random.beta(32.0, 32.0)
    im = (im * r + im2 * (1 - r)).astype(np.uint8)
    labels = np.concatenate((labels, labels2), 0)
    return im, labels


def cutout(im: np.ndarray, labels: np.ndarray, p: float = 0.5):
    """Random occlusion squares; drops labels >60% obscured (reference:
    augmentations.py:278-303)."""
    from yolosomi_tpu.utils.iou import bbox_ioa

    if random.random() < p:
        h, w = im.shape[:2]
        scales = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16
        for s in scales:
            mask_h = random.randint(1, int(h * s))
            mask_w = random.randint(1, int(w * s))
            xmin = max(0, random.randint(0, w) - mask_w // 2)
            ymin = max(0, random.randint(0, h) - mask_h // 2)
            xmax = min(w, xmin + mask_w)
            ymax = min(h, ymin + mask_h)
            im[ymin:ymax, xmin:xmax] = [random.randint(64, 191) for _ in range(3)]
            if len(labels) and s > 0.03:
                box = np.array([xmin, ymin, xmax, ymax], np.float32)
                ioa = np.asarray(bbox_ioa(box, labels[:, 1:5]))
                labels = labels[ioa < 0.60]
    return im, labels


def copy_reduce_paste(
    im: np.ndarray,
    labels: np.ndarray,
    p: float = 0.5,
    reduce_threshold: int = 32,
    overlap_threshold: float = 0.3,
):
    """SOMI small-object synthesizer (reference: augmentations.py:238-276):
    paste shrunken copies of object crops at random spots with IoA below
    `overlap_threshold`, increasing small-instance density. Crops wider
    than `reduce_threshold` px are scaled down to that width.

    Deviation from the reference: it sources crops from polygon `segments`,
    which are empty for box-label datasets (VisDrone/UAVDT) — a silent
    no-op as shipped. Here crops come from the label boxes so the
    augmentation is live.

    labels: (n, 5) [cls, x1, y1, x2, y2] pixels. Returns (im, labels).
    """
    from yolosomi_tpu.utils.iou import bbox_ioa

    n = len(labels)
    if p and n:
        h, w = im.shape[:2]
        for j in random.sample(range(n), k=round(p * n)):
            c, x1, y1, x2, y2 = labels[j]
            x1i, y1i = max(int(x1), 0), max(int(y1), 0)
            x2i, y2i = min(int(x2), w), min(int(y2), h)
            bw, bh = x2i - x1i, y2i - y1i
            if bw < 2 or bh < 2:
                continue
            crop = im[y1i:y2i, x1i:x2i]
            if bw > reduce_threshold:
                scale = reduce_threshold / bw
                crop = cv2.resize(crop, (0, 0), fx=scale, fy=scale)
            ch, cw = crop.shape[:2]
            if ch < 1 or cw < 1 or cw >= w or ch >= h:
                continue
            xn = random.randint(0, w - cw)
            yn = random.randint(0, h - ch)
            box = np.array([xn, yn, xn + cw, yn + ch], np.float32)
            ioa = np.asarray(bbox_ioa(box, labels[:, 1:5]))
            if ioa.size == 0 or ioa.max() < overlap_threshold:
                im[yn : yn + ch, xn : xn + cw] = crop
                labels = np.concatenate(
                    (labels, [[c, xn, yn, xn + cw, yn + ch]]), 0
                ).astype(labels.dtype)
    return im, labels


def copy_paste(im: np.ndarray, labels: np.ndarray, segments, p: float = 0.5):
    """Segment-based flip-paste (reference: augmentations.py:214-236);
    no-op without segments."""
    n = len(segments)
    if p and n:
        from yolosomi_tpu.utils.iou import bbox_ioa

        h, w, c = im.shape
        im_new = np.zeros(im.shape, np.uint8)
        for j in random.sample(range(n), k=round(p * n)):
            l, s = labels[j], segments[j]
            box = w - l[3], l[2], w - l[1], l[4]
            ioa = np.asarray(bbox_ioa(np.array(box, np.float32), labels[:, 1:5]))
            if (ioa < 0.30).all():
                labels = np.concatenate((labels, [[l[0], *box]]), 0)
                segments.append(np.concatenate((w - s[:, 0:1], s[:, 1:2]), 1))
                cv2.drawContours(im_new, [segments[j].astype(np.int32)], -1, (255, 255, 255), cv2.FILLED)
        result = cv2.bitwise_and(src1=im, src2=im_new)
        result = cv2.flip(result, 1)
        i = result > 0
        im[i] = result[i]
    return im, labels, segments


def blur(im: np.ndarray, ksize: int) -> np.ndarray:
    """Box blur with an odd kernel (A.Blur semantics)."""
    return cv2.blur(im, (ksize, ksize))


def median_blur(im: np.ndarray, ksize: int) -> np.ndarray:
    return cv2.medianBlur(im, ksize)


def to_gray(im: np.ndarray) -> np.ndarray:
    """Luminance replicated to 3 channels (A.ToGray semantics)."""
    g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
    return cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)


def clahe(im: np.ndarray, clip_limit: float = 2.0, tile: int = 8) -> np.ndarray:
    """CLAHE on the LAB luminance channel (A.CLAHE semantics)."""
    lab = cv2.cvtColor(im, cv2.COLOR_BGR2LAB)
    lab[..., 0] = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=(tile, tile)).apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2BGR)


def brightness_contrast(im: np.ndarray, alpha: float, beta: float) -> np.ndarray:
    """img*alpha + beta*255, clipped (A.RandomBrightnessContrast with
    brightness_by_max=True)."""
    out = im.astype(np.float32) * alpha + beta * 255.0
    return np.clip(out, 0, 255).astype(np.uint8)


class Albumentations:
    """Pixel-level augment plane (reference: augmentations.py:17-45).

    Uses the albumentations package when installed; otherwise runs a
    NATIVE cv2 fallback implementing the same transform list with the
    reference's probabilities and the library's documented defaults:
    Blur p=0.001 (odd ksize 3..7), MedianBlur p=0.01 (odd ksize 3..7),
    ToGray p=0.01, CLAHE p=0.3 (clip 1..4, 8x8 tiles),
    RandomBrightnessContrast p=0.3 (±0.2 each, brightness_by_max).
    All transforms are pixel-only, so labels pass through unchanged."""

    _NATIVE_PS = {"blur": 0.001, "median": 0.01, "gray": 0.01, "clahe": 0.3, "bc": 0.3}

    def __init__(self):
        self.transform = None
        self.native = False
        try:
            import albumentations as A

            self.transform = A.Compose(
                [
                    A.Blur(p=0.001),
                    A.MedianBlur(p=0.01),
                    A.ToGray(p=0.01),
                    A.CLAHE(p=0.3),
                    A.RandomBrightnessContrast(p=0.3),
                ],
                bbox_params=A.BboxParams(format="yolo", label_fields=["class_labels"]),
            )
        except ImportError:
            self.native = True

    def _native(self, im: np.ndarray) -> np.ndarray:
        ps = self._NATIVE_PS
        if random.random() < ps["blur"]:
            im = blur(im, random.choice([3, 5, 7]))
        if random.random() < ps["median"]:
            im = median_blur(im, random.choice([3, 5, 7]))
        if random.random() < ps["gray"]:
            im = to_gray(im)
        if random.random() < ps["clahe"]:
            im = clahe(im, clip_limit=random.uniform(1.0, 4.0))
        if random.random() < ps["bc"]:
            im = brightness_contrast(
                im, alpha=1.0 + random.uniform(-0.2, 0.2), beta=random.uniform(-0.2, 0.2)
            )
        return im

    def __call__(self, im, labels, p: float = 1.0):
        if self.transform and random.random() < p:
            new = self.transform(image=im, bboxes=labels[:, 1:], class_labels=labels[:, 0])
            im = new["image"]
            labels = np.array([[c, *b] for c, b in zip(new["class_labels"], new["bboxes"])], np.float32)
            if len(labels) == 0:
                labels = np.zeros((0, 5), np.float32)
        elif self.native and random.random() < p:
            im = self._native(np.ascontiguousarray(im))
        return im, labels
