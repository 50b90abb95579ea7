"""Datasets + loaders (host side).

Behavioral counterpart of the reference's utils/datasets.py: file-list
expansion (:422-447), validated label cache (:550-585, :948-995),
rect-training shape binning (:498-524), mosaic/mixup __getitem__
(:596-673), and the inference loaders (:157-256). Differences, TPU-first:

- batches collate to fixed shapes: images (B, H, W, 3) uint8 NHWC and
  targets (B, max_labels, 5) padded with cls=-1 (no ragged tensors, so
  the train step compiles once per image size).
- the loader is a thread-prefetched iterator feeding device_put; there is
  no DistributedSampler — per-host sharding happens at the sharding layer
  (yolosomi_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import glob
import hashlib
import math
import os
import queue
import random
import threading
from pathlib import Path
from typing import List, Optional

import cv2
import numpy as np

from yolosomi_tpu.data import augment as A
from yolosomi_tpu.utils.boxes import letterbox_params, xywhn2xyxy, xyxy2xywhn
from yolosomi_tpu.utils.general import LOGGER

IMG_FORMATS = ("bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp")
VID_FORMATS = ("asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv")
CACHE_VERSION = "yolosomi-tpu-0.1"


def img2label_paths(img_paths: List[str]) -> List[str]:
    """images/ -> labels/, *.jpg -> *.txt (reference: datasets.py:398-401)."""
    sa, sb = os.sep + "images" + os.sep, os.sep + "labels" + os.sep
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


def get_hash(paths: List[str]) -> str:
    """md5 of path names + sizes (reference: datasets.py:85-91)."""
    size = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    h = hashlib.md5(str(size).encode())
    h.update("".join(paths).encode())
    return h.hexdigest()


def list_images(path) -> List[str]:
    """Expand dir / txt-list / glob into a sorted image file list
    (reference: datasets.py:422-447)."""
    files: List[str] = []
    for p in path if isinstance(path, list) else [path]:
        p = Path(p)
        if p.is_dir():
            files += glob.glob(str(p / "**" / "*.*"), recursive=True)
        elif p.is_file() and p.suffix == ".txt":
            parent = str(p.parent) + os.sep
            with open(p) as f:
                lines = f.read().strip().splitlines()
            files += [x.replace("./", parent) if x.startswith("./") else x for x in lines]
        elif p.is_file():
            files.append(str(p))
        else:
            files += glob.glob(str(p), recursive=True)
    imgs = sorted(x for x in files if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS)
    if not imgs:
        raise FileNotFoundError(f"no images found in {path}")
    return imgs


def verify_image_label(im_file: str, lb_file: str):
    """Validate one image/label pair (reference: datasets.py:948-995).
    Returns (im_file, labels (n,5), shape (w,h), nm, nf, ne, ncorrupt, msg)."""
    nm = nf = ne = nc = 0
    msg = ""
    try:
        im = cv2.imread(im_file)
        if im is None:
            raise ValueError("unreadable image")
        shape = (im.shape[1], im.shape[0])  # (w, h)
        assert shape[0] > 9 and shape[1] > 9, f"image size {shape} <10 pixels"
        if os.path.isfile(lb_file):
            nf = 1
            with open(lb_file) as f:
                rows = [x.split() for x in f.read().strip().splitlines() if len(x)]
            lb = np.array(rows, dtype=np.float32) if rows else np.zeros((0, 5), np.float32)
            if len(lb):
                assert lb.shape[1] == 5, f"labels require 5 columns, got {lb.shape[1]}"
                assert (lb >= 0).all(), "negative label values"
                assert (lb[:, 1:] <= 1).all(), "non-normalized coordinates"
                _, idx = np.unique(lb, axis=0, return_index=True)
                if len(idx) < len(lb):
                    lb = lb[idx]
                    msg = f"{im_file}: removed {len(rows) - len(idx)} duplicate labels"
            else:
                ne = 1
        else:
            nm = 1
            lb = np.zeros((0, 5), np.float32)
        return im_file, lb, shape, nm, nf, ne, nc, msg
    except Exception as e:
        nc = 1
        return None, None, None, nm, nf, ne, nc, f"{im_file}: ignoring corrupt image/label: {e}"


class DetectionDataset:
    """Train/val dataset (reference LoadImagesAndLabels, datasets.py:404-706)."""

    def __init__(
        self,
        path,
        img_size: int = 640,
        batch_size: int = 16,
        augment: bool = False,
        hyp: Optional[dict] = None,
        rect: bool = False,
        stride: int = 32,
        pad: float = 0.0,
        max_labels: int = 300,
        cache_images: bool = False,
    ):
        self.img_size = img_size
        self.augment = augment
        self.hyp = hyp or {}
        self.rect = rect
        self.stride = stride
        self.pad = pad
        self.max_labels = max_labels
        self.mosaic = augment and not rect
        self.mosaic_border = [-img_size // 2, -img_size // 2]
        self.albumentations = A.Albumentations() if augment else None

        self.img_files = list_images(path)
        self.label_files = img2label_paths(self.img_files)
        cache = self._load_or_build_cache(path)
        labels, shapes = zip(*[(cache[f][0], cache[f][1]) for f in self.img_files])
        self.labels = list(labels)
        self.shapes = np.array(shapes, np.float64)  # (n, 2) (w, h)
        self.n = len(self.img_files)
        self.indices = np.arange(self.n)
        self.batch = np.floor(np.arange(self.n) / batch_size).astype(int)

        if self.rect:
            self._setup_rect(batch_size)

        self.ims: List[Optional[np.ndarray]] = [None] * self.n
        if cache_images:
            for i in range(self.n):
                self.ims[i], _, _ = self.load_image(i)

    # -- caching --------------------------------------------------------

    def _cache_path(self, path) -> Path:
        p = Path(path if isinstance(path, str) else path[0])
        return (p if p.is_file() else p.parent).with_suffix(".somi.cache.npy")

    def _load_or_build_cache(self, path) -> dict:
        cache_path = self._cache_path(path)
        h = get_hash(self.label_files + self.img_files)
        if cache_path.exists():
            try:
                cache = np.load(cache_path, allow_pickle=True).item()
                if cache.get("version") == CACHE_VERSION and cache.get("hash") == h:
                    # corrupt/invalid files were excluded during the build
                    # pass; rebuild the kept file lists from the cache keys
                    # (reference rebuilds from cache on load too) so a
                    # cache hit filters identically to a cache build.
                    self.img_files = [f for f in self.img_files if f in cache]
                    self.label_files = img2label_paths(self.img_files)
                    return cache
            except Exception:
                pass
        cache = {"version": CACHE_VERSION, "hash": h}
        nm = nf = ne = nc = 0
        keep_imgs, keep_lbls = [], []
        for im_file, lb_file in zip(self.img_files, self.label_files):
            f, lb, shape, m, fo, e, c, msg = verify_image_label(im_file, lb_file)
            nm, nf, ne, nc = nm + m, nf + fo, ne + e, nc + c
            if msg:
                LOGGER.warning(msg)
            if f is not None:
                cache[f] = (lb, shape)
                keep_imgs.append(im_file)
                keep_lbls.append(lb_file)
        self.img_files, self.label_files = keep_imgs, keep_lbls
        LOGGER.info(f"dataset: {nf} labels found, {nm} missing, {ne} empty, {nc} corrupt")
        try:
            np.save(cache_path, cache)
            cache_path.with_suffix(".npy").rename(cache_path)  # np.save appends .npy
        except Exception:
            pass
        return cache

    def _setup_rect(self, batch_size: int):
        """Aspect-ratio batch binning (reference: datasets.py:498-524)."""
        nb = self.batch[-1] + 1
        s = self.shapes  # (w, h)
        ar = s[:, 1] / s[:, 0]  # h/w
        irect = ar.argsort()
        self.img_files = [self.img_files[i] for i in irect]
        self.label_files = [self.label_files[i] for i in irect]
        self.labels = [self.labels[i] for i in irect]
        self.shapes = s[irect]
        ar = ar[irect]
        shapes = [[1.0, 1.0]] * nb
        for i in range(nb):
            ari = ar[self.batch == i]
            mini, maxi = ari.min(), ari.max()
            if maxi < 1:
                shapes[i] = [maxi, 1.0]
            elif mini > 1:
                shapes[i] = [1.0, 1.0 / mini]
        self.batch_shapes = (
            np.ceil(np.array(shapes) * self.img_size / self.stride + self.pad).astype(int) * self.stride
        )

    # -- image access ---------------------------------------------------

    def load_image(self, i: int):
        """Lazy load + long-side resize (reference: datasets.py:710-729)."""
        im = self.ims[i]
        if im is not None:
            h0, w0 = self.shapes[i][1], self.shapes[i][0]
            return im, (int(h0), int(w0)), im.shape[:2]
        im = cv2.imread(self.img_files[i])
        assert im is not None, f"image not found {self.img_files[i]}"
        h0, w0 = im.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_AREA if r < 1 and not self.augment else cv2.INTER_LINEAR
            im = cv2.resize(im, (int(w0 * r), int(h0 * r)), interpolation=interp)
        return im, (h0, w0), im.shape[:2]

    @staticmethod
    def _mosaic_tile_rects(i: int, xc: int, yc: int, w: int, h: int, s: int):
        """Canvas/source paste rectangles for mosaic tile i (TL/TR/BL/BR)
        — single source of truth for load_mosaic (pixels) and _plan_mosaic
        (device plan), reference datasets.py:745-760."""
        if i == 0:  # top left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        return (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b)

    def load_mosaic(self, index: int):
        """4-image mosaic on a 2s x 2s canvas (reference: datasets.py:732-798)."""
        s = self.img_size
        labels4 = []
        yc, xc = (int(random.uniform(-x, 2 * s + x)) for x in self.mosaic_border)
        indices = [index] + random.choices(list(self.indices), k=3)
        random.shuffle(indices)
        img4 = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = self._mosaic_tile_rects(i, xc, yc, w, h, s)
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            labels = self.labels[idx].copy()
            if labels.size:
                labels[:, 1:] = np.asarray(xywhn2xyxy(labels[:, 1:], w, h, padw, padh))
            labels4.append(labels)
        labels4 = np.concatenate(labels4, 0) if labels4 else np.zeros((0, 5), np.float32)
        labels4[:, 1:] = labels4[:, 1:].clip(0, 2 * s)

        img4, labels4 = A.copy_reduce_paste(img4, labels4, p=self.hyp.get("copy_paste", 0.0))
        img4, labels4 = A.random_perspective(
            img4,
            labels4,
            degrees=self.hyp.get("degrees", 0.0),
            translate=self.hyp.get("translate", 0.1),
            scale=self.hyp.get("scale", 0.5),
            shear=self.hyp.get("shear", 0.0),
            perspective=self.hyp.get("perspective", 0.0),
            border=self.mosaic_border,
        )
        return img4, labels4

    def __len__(self):
        return self.n

    def __getitem__(self, index: int):
        """Returns (img HWC uint8 BGR, labels (n,5) [cls,xc,yc,w,h] norm,
        path, shapes) — the reference tuple (datasets.py:596-673) minus the
        CHW flip (we stay NHWC)."""
        hyp = self.hyp
        use_mosaic = self.mosaic and random.random() < hyp.get("mosaic", 0.0)
        if use_mosaic:
            img, labels = self.load_mosaic(index)
            shapes = None
            if random.random() < hyp.get("mixup", 0.0):
                img, labels = A.mixup(img, labels, *self.load_mosaic(random.randint(0, self.n - 1)))
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            shape = self.batch_shapes[self.batch[index]] if self.rect else self.img_size
            img, ratio, pad = A.letterbox(img, shape, auto=False, scaleup=self.augment)
            shapes = (h0, w0), ((h / h0, w / w0), pad)
            labels = self.labels[index].copy()
            if labels.size:
                labels[:, 1:] = np.asarray(
                    xywhn2xyxy(labels[:, 1:], ratio[0] * w, ratio[1] * h, padw=pad[0], padh=pad[1])
                )
            if self.augment:
                img, labels = A.random_perspective(
                    img,
                    labels,
                    degrees=hyp.get("degrees", 0.0),
                    translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5),
                    shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0),
                )

        nl = len(labels)
        if nl:
            labels[:, 1:5] = np.asarray(
                xyxy2xywhn(labels[:, 1:5], w=img.shape[1], h=img.shape[0], clip=True, eps=1e-3)
            )

        if self.augment:
            if self.albumentations:
                img, labels = self.albumentations(img, labels)
                nl = len(labels)
            img = A.augment_hsv(
                img, hgain=hyp.get("hsv_h", 0.0), sgain=hyp.get("hsv_s", 0.0), vgain=hyp.get("hsv_v", 0.0)
            )
            if random.random() < hyp.get("flipud", 0.0):
                img = np.flipud(img)
                if nl:
                    labels[:, 2] = 1 - labels[:, 2]
            if random.random() < hyp.get("fliplr", 0.0):
                img = np.fliplr(img)
                if nl:
                    labels[:, 1] = 1 - labels[:, 1]

        return np.ascontiguousarray(img), labels.astype(np.float32), self.img_files[index], shapes


    def resized_hw(self, i: int):
        """(h, w) of image i after load_image's long-side resize — analytic
        from the cached shapes, no pixel load (device-cache planning)."""
        w0, h0 = self.shapes[i]
        r = self.img_size / max(h0, w0)
        return (int(h0 * r), int(w0 * r)) if r != 1 else (int(h0), int(w0))

    def _plan_mosaic(self, index: int):
        """load_mosaic's geometry with no pixel work (identical draw order,
        so a seeded plan matches a seeded load_mosaic label-for-label).
        Returns (idx4, center, offs, srect, minv, labels_xyxy)."""
        s = self.img_size
        hyp = self.hyp
        yc, xc = (int(random.uniform(-x, 2 * s + x)) for x in self.mosaic_border)
        indices = [index] + random.choices(list(self.indices), k=3)
        random.shuffle(indices)
        labels4 = []
        offs = np.zeros((4, 2), np.float32)
        srect = np.zeros((4, 4), np.float32)
        for i, idx in enumerate(indices):
            h, w = self.resized_hw(idx)
            (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = self._mosaic_tile_rects(i, xc, yc, w, h, s)
            padw, padh = x1a - x1b, y1a - y1b
            offs[i] = (padw, padh)
            srect[i] = (x1b, y1b, x2b, y2b)
            labels = self.labels[idx].copy()
            if labels.size:
                labels[:, 1:] = np.asarray(xywhn2xyxy(labels[:, 1:], w, h, padw, padh))
            labels4.append(labels)
        labels4 = np.concatenate(labels4, 0) if labels4 else np.zeros((0, 5), np.float32)
        labels4[:, 1:] = labels4[:, 1:].clip(0, 2 * s)
        M, sc, width, height = A.perspective_params(
            2 * s, 2 * s,
            degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
            scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
            perspective=hyp.get("perspective", 0.0), border=self.mosaic_border,
        )
        labels4 = A.warp_labels(labels4, M, sc, width, height, hyp.get("perspective", 0.0))
        return (
            np.asarray(indices, np.int32), np.asarray([xc, yc], np.float32),
            offs, srect, np.linalg.inv(M).astype(np.float32), labels4,
        )

    def _plan_letterbox(self, index: int):
        """The non-mosaic __getitem__ branch as a single-tile plan.

        The letterbox resize ratio is usually 1 (the cache slab already
        holds the long-side-S image) but load_image's int() truncation can
        leave the long side at S-1, making ratio S/(S-1); that scale is
        folded into the plan matrix (source = (M @ L)^-1 @ output with L
        the letterbox scale+pad), so pixels stay aligned with the labels
        at the cost of one combined bilinear resample instead of the
        host's resize-then-warp pair (sub-pixel difference)."""
        h, w = self.resized_hw(index)
        ratio, new_unpad, (dw, dh) = letterbox_params(
            (h, w), self.img_size, scaleup=self.augment, auto=False
        )
        top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
        labels = self.labels[index].copy()
        if labels.size:
            labels[:, 1:] = np.asarray(
                xywhn2xyxy(labels[:, 1:], ratio[0] * w, ratio[1] * h, padw=dw, padh=dh)
            )
        hyp = self.hyp
        M, sc, width, height = A.perspective_params(
            self.img_size, self.img_size,
            degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
            scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
            perspective=hyp.get("perspective", 0.0), border=(0, 0),
        )
        labels = A.warp_labels(labels, M, sc, width, height, hyp.get("perspective", 0.0))
        # pixel mapping of the host's cv2.resize to the ROUNDED new_unpad
        # (center-aligned: dst = s*src + 0.5*s - 0.5), then the int pad.
        # Labels above keep the host's ratio-based formula — including the
        # host's own <=0.25 px ratio-vs-rounded-resize inconsistency —
        # so labels stay bit-identical to --cache ram while pixels align
        # with what cv2 actually renders.
        sx, sy = new_unpad[0] / w, new_unpad[1] / h
        L = np.asarray(
            [[sx, 0.0, 0.5 * sx - 0.5 + left], [0.0, sy, 0.5 * sy - 0.5 + top], [0.0, 0.0, 1.0]],
            np.float64,
        )
        idx4 = np.full(4, index, np.int32)
        center = np.asarray([1e9, 1e9], np.float32)  # tile 0 owns every pixel
        offs = np.zeros((4, 2), np.float32)
        srect = np.zeros((4, 4), np.float32)
        srect[0] = (0, 0, w, h)
        return idx4, center, offs, srect, np.linalg.inv(M @ L).astype(np.float32), labels

    def plan_item(self, index: int):
        """__getitem__ for the device-cache path: every random draw and all
        label geometry happen here on the host (same draw order as
        __getitem__, minus pixels); the device builds the pixels from the
        HBM-cached slab (ops/mosaic_device.py). HSV + flips run on device
        inside the train step (ops/preprocess.py), so they are not drawn
        here. Returns (plan, labels_xywhn, path, None)."""
        hyp = self.hyp
        use_mosaic = self.mosaic and random.random() < hyp.get("mosaic", 0.0)
        if use_mosaic:
            idx4, center, offs, srect, minv, labels = self._plan_mosaic(index)
        else:
            idx4, center, offs, srect, minv, labels = self._plan_letterbox(index)
        mixw = 1.0
        second = (idx4, center, offs, srect, minv)
        if use_mosaic and random.random() < hyp.get("mixup", 0.0):
            i2, c2, o2, r2, m2, labels2 = self._plan_mosaic(random.randint(0, self.n - 1))
            second = (i2, c2, o2, r2, m2)
            mixw = float(np.random.beta(32.0, 32.0))
            labels = np.concatenate([labels, labels2], 0)
        if len(labels):
            labels = labels.copy()
            labels[:, 1:5] = np.asarray(
                xyxy2xywhn(labels[:, 1:5], w=self.img_size, h=self.img_size, clip=True, eps=1e-3)
            )
        plan = {
            "idx": np.stack([idx4, second[0]], 0),
            "center": np.stack([center, second[1]], 0),
            "offs": np.stack([offs, second[2]], 0),
            "srect": np.stack([srect, second[3]], 0),
            "minv": np.stack([minv, second[4]], 0),
            "mixw": np.float32(mixw),
        }
        return plan, labels.astype(np.float32), self.img_files[index], None


def collate_plan_batch(samples, max_labels: int):
    """Stack plan samples: plan dict of (B, 2, ...) arrays + padded targets."""
    plans, labels, paths, shapes = zip(*samples)
    from yolosomi_tpu.losses import pad_targets

    batch_plan = {k: np.stack([p[k] for p in plans], 0) for k in plans[0]}
    return batch_plan, pad_targets(list(labels), max_labels), list(paths), list(shapes)


def collate_batch(samples, max_labels: int):
    """Stack a list of dataset samples into fixed-shape arrays:
    images (B,H,W,3) uint8, targets (B,max_labels,5) cls=-1-padded."""
    imgs, labels, paths, shapes = zip(*samples)
    images = np.stack(imgs, 0)
    from yolosomi_tpu.losses import pad_targets

    targets = pad_targets(list(labels), max_labels)
    return images, targets, list(paths), list(shapes)


def collate_batch4(samples, max_labels: int, rng=None):
    """Quad collate (reference collate_fn4, datasets.py:658-682 / --quad):
    each group of 4 samples becomes ONE 2x-size image — either the first
    image bilinear-upscaled 2x (p=0.5) or a 2x2 paste of all four — so
    large-image training runs at batch/4 cost. Labels are normalized
    xywh, so the upscale branch keeps them unchanged and the paste branch
    shifts by the sub-image offset and halves.

    Returns images (B/4, 2H, 2W, 3) uint8, targets (B/4, 4*max_labels, 5)."""
    import cv2

    rng = rng or np.random.default_rng()
    imgs, labels, paths, shapes = zip(*samples)
    n = len(imgs) // 4
    imgs4, labels4 = [], []
    for g in range(n):
        i = g * 4
        if rng.random() < 0.5:
            h, w = imgs[i].shape[:2]
            imgs4.append(cv2.resize(imgs[i], (2 * w, 2 * h), interpolation=cv2.INTER_LINEAR))
            labels4.append(labels[i])
        else:
            # layout matches the reference's cat order: i top-left,
            # i+1 below it (ho), i+2 right (wo), i+3 diagonal (ho+wo)
            left = np.concatenate([imgs[i], imgs[i + 1]], axis=0)
            right = np.concatenate([imgs[i + 2], imgs[i + 3]], axis=0)
            imgs4.append(np.concatenate([left, right], axis=1))
            merged = []
            for k, (ox, oy) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                lk = np.asarray(labels[i + k], np.float32).reshape(-1, 5)
                if len(lk):
                    lk = lk.copy()
                    lk[:, 1] = (lk[:, 1] + ox) * 0.5
                    lk[:, 2] = (lk[:, 2] + oy) * 0.5
                    lk[:, 3:5] *= 0.5
                merged.append(lk)
            labels4.append(np.concatenate(merged, 0))
    from yolosomi_tpu.losses import pad_targets

    targets = pad_targets(labels4, 4 * max_labels)
    return np.stack(imgs4, 0), targets, list(paths[:n]), list(shapes[:n])


class DataLoader:
    """Shuffling, thread-prefetched batch iterator (replaces the
    reference's InfiniteDataLoader + worker pool, datasets.py:94-155)."""

    def __init__(self, dataset: DetectionDataset, batch_size: int, shuffle: bool = False, prefetch: int = 2,
                 drop_last: bool = False, seed: int = 0, workers: Optional[int] = None,
                 quad: bool = False, plan: bool = False):
        import os as _os

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0
        self.seed = seed
        self.quad = quad and batch_size % 4 == 0  # reference --quad (collate_fn4)
        self.plan = plan  # device-cache mode: yield randomness plans, not pixels
        self.sample_weights = None  # per-image weights (--image-weights)
        # item-level thread pool: cv2 decode/warp release the GIL, so
        # threads parallelize the per-image augmentation (the reference
        # uses worker processes, datasets.py:94-123)
        self.workers = workers if workers is not None else min(8, _os.cpu_count() or 1)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def _batches(self):
        idx = np.arange(len(self.dataset))
        rng = np.random.default_rng(self.seed + self.epoch)
        if self.sample_weights is not None:
            # weighted resampling with replacement (reference: train.py
            # --image-weights via random.choices, train.py:236-241)
            w = np.asarray(self.sample_weights, np.float64)
            w = w / w.sum()
            idx = rng.choice(len(self.dataset), size=len(self.dataset), p=w)
        elif self.shuffle:
            rng.shuffle(idx)
        nb = len(self)
        pool = None
        if self.workers > 1 and not self.plan:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.workers)
        try:
            for b in range(nb):
                sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                if len(sel) < self.batch_size and not self.dataset.rect:
                    # pad the final batch by wrapping (fixed shapes for jit)
                    sel = np.concatenate([sel, idx[: self.batch_size - len(sel)]])
                getter = self.dataset.plan_item if self.plan else self.dataset.__getitem__
                if pool is not None and not self.plan:
                    # plans are pure-python random draws: keep them on one
                    # thread for determinism (they do no pixel work anyway)
                    items = list(pool.map(getter, [int(i) for i in sel]))
                else:
                    items = [getter(int(i)) for i in sel]
                if self.plan:
                    yield collate_plan_batch(items, self.dataset.max_labels)
                elif self.quad:
                    yield collate_batch4(items, self.dataset.max_labels, rng)
                else:
                    yield collate_batch(items, self.dataset.max_labels)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    def __iter__(self):
        self.epoch += 1
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class LoadImages:
    """Inference loader for files/dirs/globs/videos (reference:
    datasets.py:157-256). Yields (path, letterboxed HWC uint8, original
    image, video_capture)."""

    def __init__(self, path, img_size: int = 640, stride: int = 32, auto: bool = False):
        files = []
        p = str(Path(path).resolve())
        if "*" in p:
            files = sorted(glob.glob(p, recursive=True))
        elif os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "*.*")))
        elif os.path.isfile(p):
            files = [p]
        else:
            raise FileNotFoundError(f"{p} does not exist")
        images = [x for x in files if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS]
        videos = [x for x in files if x.rsplit(".", 1)[-1].lower() in VID_FORMATS]
        self.files = images + videos
        self.video_flag = [False] * len(images) + [True] * len(videos)
        self.img_size = img_size
        self.stride = stride
        self.auto = auto
        self.nf = len(self.files)
        self.mode = "image"
        self.cap = None
        if videos:
            self._new_video(videos[0])
        assert self.nf > 0, f"no images/videos in {p}"

    def _new_video(self, path):
        self.frame = 0
        self.cap = cv2.VideoCapture(path)
        self.frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __iter__(self):
        self.count = 0
        return self

    def __len__(self):
        return self.nf

    def __next__(self):
        if self.count == self.nf:
            raise StopIteration
        path = self.files[self.count]
        if self.video_flag[self.count]:
            self.mode = "video"
            ret, im0 = self.cap.read()
            if not ret:
                self.count += 1
                self.cap.release()
                if self.count == self.nf:
                    raise StopIteration
                self._new_video(self.files[self.count])
                ret, im0 = self.cap.read()
            self.frame += 1
        else:
            self.count += 1
            im0 = cv2.imread(path)
            assert im0 is not None, f"image not found {path}"
        if not self.auto and _native_letterbox_ok():
            # C++ letterbox (native/imgproc.cc): ~3x the cv2 path on large
            # frames; semantics = scaleup letterbox to a square img_size
            from yolosomi_tpu import native as _native

            img = _native.letterbox(im0, self.img_size)[0]
        else:
            img = A.letterbox(im0, self.img_size, stride=self.stride, auto=self.auto)[0]
        return path, np.ascontiguousarray(img), im0, self.cap


def _native_letterbox_ok() -> bool:
    global _NATIVE_OK
    if _NATIVE_OK is None:
        try:
            from yolosomi_tpu import native as _native

            _NATIVE_OK = bool(_native.native_available())
        except Exception:
            _NATIVE_OK = False
    return _NATIVE_OK


_NATIVE_OK = None


# ---------------------------------------------------------------------------
# Dataset utilities (reference: datasets.py:882-1050)
# ---------------------------------------------------------------------------


def autosplit(path, weights=(0.9, 0.1, 0.0), annotated_only: bool = False, seed: int = 0):
    """Write autosplit_{train,val,test}.txt next to the dataset
    (reference: datasets.py:924-946)."""
    files = list_images(path)
    if annotated_only:
        files = [f for f, l in zip(files, img2label_paths(files)) if os.path.exists(l)]
    rng = np.random.default_rng(seed)
    choice = rng.choice(3, size=len(files), p=list(weights))
    root = Path(path)
    names = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for n in names:
        (root.parent / n).unlink(missing_ok=True)
    for f, c in zip(files, choice):
        with open(root.parent / names[c], "a") as fh:
            fh.write("./" + os.path.relpath(f, root.parent) + "\n")
    return [root.parent / n for n in names]


def extract_boxes(path, out_dir=None):
    """Crop every labeled box into a per-class classification dataset
    (reference: datasets.py:890-921)."""
    files = list_images(path)
    labels = img2label_paths(files)
    out = Path(out_dir) if out_dir else Path(path).parent / "classifier"
    n = 0
    for imf, lbf in zip(files, labels):
        if not os.path.exists(lbf):
            continue
        im = cv2.imread(imf)
        if im is None:
            continue
        h, w = im.shape[:2]
        rows = np.array([x.split() for x in open(lbf).read().strip().splitlines()], np.float32)
        for j, row in enumerate(rows):
            c = int(row[0])
            d = out / str(c)
            d.mkdir(parents=True, exist_ok=True)
            b = row[1:5] * [w, h, w, h]
            bw, bh = b[2] * 1.2 + 3, b[3] * 1.2 + 3  # 20% pad (reference :909-911)
            x1 = int(max(b[0] - bw / 2, 0)); x2 = int(min(b[0] + bw / 2, w))
            y1 = int(max(b[1] - bh / 2, 0)); y2 = int(min(b[1] + bh / 2, h))
            if x2 > x1 and y2 > y1:
                cv2.imwrite(str(d / f"{Path(imf).stem}_{j}.jpg"), im[y1:y2, x1:x2])
                n += 1
    LOGGER.info(f"extract_boxes: wrote {n} crops to {out}")
    return out


def dataset_stats(data_cfg: dict, out_json=None) -> dict:
    """Per-split instance/label statistics JSON (reference: datasets.py:998-1050)."""
    import json

    stats = {}
    for split in ("train", "val", "test"):
        p = data_cfg.get(split)
        if not p:
            stats[split] = None
            continue
        try:
            files = list_images(p)
        except FileNotFoundError:
            stats[split] = None
            continue
        labels = []
        for lb in img2label_paths(files):
            if os.path.exists(lb):
                rows = [x.split() for x in open(lb).read().strip().splitlines() if x]
                labels.append(np.array(rows, np.float32) if rows else np.zeros((0, 5), np.float32))
            else:
                labels.append(np.zeros((0, 5), np.float32))
        nc = int(data_cfg.get("nc", 80))
        x = np.array([np.bincount(l[:, 0].astype(int), minlength=nc) for l in labels])
        stats[split] = {
            "instance_stats": {"total": int(x.sum()), "per_class": x.sum(0).tolist()},
            "image_stats": {
                "total": len(files),
                "unlabelled": int(np.all(x == 0, 1).sum()),
                "per_class": (x > 0).sum(0).tolist(),
            },
        }
    if out_json:
        Path(out_json).write_text(json.dumps(stats, indent=2))
    return stats


def flatten_recursive(path, out_dir=None):
    """Copy a nested tree into one flat directory (reference: datasets.py:882-888)."""
    import shutil

    out = Path(out_dir) if out_dir else Path(str(path) + "_flat")
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for f in Path(path).rglob("*.*"):
        if f.is_file():
            shutil.copy(f, out / f.name)
            n += 1
    LOGGER.info(f"flatten_recursive: copied {n} files to {out}")
    return out


class LoadStreams:
    """Multi-source stream loader: RTSP/HTTP/webcam, one reader thread per
    stream (reference: datasets.py:301-395). Yields batched letterboxed
    frames."""

    def __init__(self, sources, img_size: int = 640, stride: int = 32):
        if isinstance(sources, str) and os.path.isfile(sources) and sources.endswith(".txt"):
            sources = [s.strip() for s in open(sources).read().splitlines() if s.strip()]
        elif isinstance(sources, str):
            sources = [sources]
        self.sources = sources
        self.img_size = img_size
        self.stride = stride
        self.imgs = [None] * len(sources)
        self.threads = []
        self.running = True
        for i, s in enumerate(sources):
            cap = cv2.VideoCapture(int(s) if s.isdigit() else s)
            assert cap.isOpened(), f"failed to open stream {s}"
            ok, self.imgs[i] = cap.read()
            assert ok, f"failed to read from {s}"
            t = threading.Thread(target=self._reader, args=(i, cap), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i: int, cap):
        while self.running and cap.isOpened():
            ok, frame = cap.read()
            if ok:
                self.imgs[i] = frame
            else:
                break

    def __iter__(self):
        return self

    def __next__(self):
        frames = [im.copy() for im in self.imgs]
        batch = np.stack([A.letterbox(f, self.img_size, stride=self.stride, auto=False)[0] for f in frames])
        return self.sources, batch, frames, None

    def close(self):
        self.running = False


def load_mosaic9(dataset: "DetectionDataset", index: int):
    """9-image mosaic on a 3s x 3s canvas (reference: datasets.py:801-878;
    unused by the default pipeline but part of the augmentation library)."""
    s = dataset.img_size
    labels9 = []
    indices = [index] + random.choices(list(dataset.indices), k=8)
    random.shuffle(indices)
    img9 = np.full((s * 3, s * 3, 3), 114, dtype=np.uint8)
    hp = wp = -1
    for i, idx in enumerate(indices):
        img, _, (h, w) = dataset.load_image(idx)
        if i == 0:  # center
            c = s, s, s + w, s + h
            h0, w0 = h, w
        elif i == 1:
            c = s, s - h, s + w, s
        elif i == 2:
            c = s + wp, s - h, s + wp + w, s
        elif i == 3:
            c = s + w0, s, s + w0 + w, s + h
        elif i == 4:
            c = s + w0, s + hp, s + w0 + w, s + hp + h
        elif i == 5:
            c = s + w0 - w, s + h0, s + w0, s + h0 + h
        elif i == 6:
            c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
        elif i == 7:
            c = s - w, s + h0 - h, s, s + h0
        else:
            c = s - w, s + h0 - hp - h, s, s + h0 - hp
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        img9[y1:y2, x1:x2] = img[y1 - padh :, x1 - padw :][: y2 - y1, : x2 - x1]
        hp, wp = h, w
        labels = dataset.labels[idx].copy()
        if labels.size:
            labels[:, 1:] = np.asarray(xywhn2xyxy(labels[:, 1:], w, h, padw, padh))
        labels9.append(labels)
    yc, xc = (int(random.uniform(0, s)) for _ in range(2))
    img9 = img9[yc : yc + 2 * s, xc : xc + 2 * s]
    labels9 = np.concatenate(labels9, 0) if labels9 else np.zeros((0, 5), np.float32)
    labels9[:, [1, 3]] -= xc
    labels9[:, [2, 4]] -= yc
    labels9[:, 1:] = labels9[:, 1:].clip(0, 2 * s)
    img9, labels9 = A.random_perspective(
        img9, labels9,
        degrees=dataset.hyp.get("degrees", 0.0), translate=dataset.hyp.get("translate", 0.1),
        scale=dataset.hyp.get("scale", 0.5), shear=dataset.hyp.get("shear", 0.0),
        perspective=dataset.hyp.get("perspective", 0.0), border=dataset.mosaic_border,
    )
    return img9, labels9
