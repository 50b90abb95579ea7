"""End-to-end user API: AutoShape/Detections counterparts + hub loader.

Reference: common.py:2119 (AutoShape: robust pre/post around the model)
and common.py:2210 (Detections: results object with print/save/crop/
pandas), hubconf.py:13 (_create loader).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

import numpy as np

from yolosomi_tpu.data.augment import letterbox
from yolosomi_tpu.engine.runner import Runner
from yolosomi_tpu.utils.boxes import scale_coords


class Detections:
    """Inference results holder (reference: common.py:2210-2318)."""

    def __init__(self, ims: List[np.ndarray], pred: List[np.ndarray], files: List[str], names: List[str]):
        self.ims = ims
        self.pred = pred  # per image (n, 6) [x1,y1,x2,y2,conf,cls] native pixels
        self.files = files
        self.names = names
        self.n = len(pred)

    def __len__(self):
        return self.n

    def __repr__(self):
        lines = []
        for i, det in enumerate(self.pred):
            s = f"image {i + 1}/{self.n} {self.files[i]}: "
            if len(det) == 0:
                s += "(no detections)"
            for c in np.unique(det[:, 5].astype(int)):
                n = int((det[:, 5] == c).sum())
                name = self.names[c] if c < len(self.names) else str(c)
                s += f"{n} {name}{'s' * (n > 1)}, "
            lines.append(s.rstrip(", "))
        return "\n".join(lines)

    def pandas(self):
        """Per-image DataFrames with xmin/ymin/xmax/ymax/confidence/class/name
        (reference: common.py:2288)."""
        import pandas as pd

        cols = ["xmin", "ymin", "xmax", "ymax", "confidence", "class", "name"]
        out = []
        for det in self.pred:
            rows = [
                [*box, conf, int(c), self.names[int(c)] if int(c) < len(self.names) else str(int(c))]
                for *box, conf, c in det
            ]
            out.append(pd.DataFrame(rows, columns=cols))
        return out

    def crop(self, save_dir: str = "runs/crops"):
        import cv2

        save_dir = Path(save_dir)
        crops = []
        for im, det, f in zip(self.ims, self.pred, self.files):
            for j, (*box, conf, c) in enumerate(det):
                x1, y1, x2, y2 = (int(v) for v in box)
                crop = im[max(y1, 0) : y2, max(x1, 0) : x2]
                name = self.names[int(c)] if int(c) < len(self.names) else str(int(c))
                d = save_dir / name
                d.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(d / f"{Path(f).stem}_{j}.jpg"), crop)
                crops.append(crop)
        return crops

    def save(self, save_dir: str = "runs/detect"):
        import cv2

        from detect import COLORS, draw_box

        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        for im, det, f in zip(self.ims, self.pred, self.files):
            im = im.copy()
            for *box, conf, c in det:
                name = self.names[int(c)] if int(c) < len(self.names) else str(int(c))
                draw_box(im, box, f"{name} {conf:.2f}", COLORS[int(c) % len(COLORS)])
            cv2.imwrite(str(save_dir / Path(f).name), im)
        return save_dir

    @property
    def xyxy(self):
        return self.pred


class AutoShape:
    """Input-robust wrapper: accepts file paths, numpy HWC images, or lists
    thereof; letterboxes, batches, infers, and rescales to native frames
    (reference: common.py:2119-2208)."""

    def __init__(self, runner: Runner, imgsz: int = 640, conf: float = 0.25, iou: float = 0.45,
                 names: Optional[List[str]] = None):
        self.runner = runner
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.names = names or runner.names

    def __call__(self, ims: Union[str, np.ndarray, Sequence], size: Optional[int] = None) -> Detections:
        import cv2

        size = size or self.imgsz
        if not isinstance(ims, (list, tuple)):
            ims = [ims]
        raw, files = [], []
        for i, im in enumerate(ims):
            if isinstance(im, (str, Path)):
                files.append(str(im))
                im = cv2.imread(str(im))
                assert im is not None, f"image not found {files[-1]}"
            else:
                files.append(f"image{i}.jpg")
                im = np.asarray(im)
                if im.ndim == 2:
                    im = np.stack([im] * 3, -1)
            raw.append(im)

        batch, meta = [], []
        for im in raw:
            lb, ratio, pad = letterbox(im, size, auto=False)
            batch.append(lb)
            meta.append((im.shape[:2], (ratio, pad)))
        x = np.stack(batch, 0).astype(np.float32) / 255.0

        infer = self.runner.infer_fn(conf_thres=self.conf, iou_thres=self.iou, max_det=300)
        out = np.asarray(infer(self.runner.variables, x))
        pred = []
        for i, det in enumerate(out):
            det = det[det[:, 4] > 0]
            if len(det):
                (h0, w0), rp = meta[i]
                det = det.copy()
                det[:, :4] = np.asarray(scale_coords(x.shape[1:3], det[:, :4], (h0, w0), rp))
            pred.append(det)
        return Detections(raw, pred, files, self.names)


def load(
    cfg: str = "yolo-somi",
    weights: Optional[str] = None,
    nc: Optional[int] = None,
    imgsz: int = 640,
    conf: float = 0.25,
    iou: float = 0.45,
    names: Optional[List[str]] = None,
    autoshape: bool = True,
):
    """Hub-style entry (reference: hubconf.py:13 _create): build + load,
    optionally AutoShape-wrapped."""
    runner = Runner(cfg, weights, nc=nc, imgsz=imgsz)
    if autoshape:
        return AutoShape(runner, imgsz=imgsz, conf=conf, iou=iou, names=names)
    return runner


def apply_classifier(detections: "Detections", classifier, imgsz: int = 224):
    """Second-stage classifier over detection crops (reference:
    general.py apply_classifier + detect.py:93-95,204-205): re-labels each
    box with the classifier's argmax, dropping disagreeing detections.

    `classifier(batch_float_nhwc) -> (N, n_classes) logits`.
    """
    import cv2

    for i, (im, det) in enumerate(zip(detections.ims, detections.pred)):
        if len(det) == 0:
            continue
        crops = []
        for x1, y1, x2, y2, *_ in det:
            crop = im[max(int(y1), 0) : int(y2), max(int(x1), 0) : int(x2)]
            if crop.size == 0:
                crop = np.zeros((imgsz, imgsz, 3), np.uint8)
            crops.append(cv2.resize(crop, (imgsz, imgsz)))
        logits = np.asarray(classifier(np.stack(crops).astype(np.float32) / 255.0))
        pred_cls = logits.argmax(1)
        keep = pred_cls == det[:, 5].astype(int)
        detections.pred[i] = det[keep]
    return detections
