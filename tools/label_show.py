"""Draw ground-truth labels onto images (reference: label_show.py for
VOC-XML annotations, lable.py for YOLO-txt — merged into one tool).

Usage:
  python tools/label_show.py --images dir/ --labels dir/ --format yolo
  python tools/label_show.py --images dir/ --labels dir/ --format voc
"""

from __future__ import annotations

import argparse
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolosomi_tpu.utils.general import increment_path  # noqa: E402
from detect import COLORS  # noqa: E402


def read_yolo(txt: Path, w: int, h: int):
    out = []
    if not txt.exists():
        return out
    for line in txt.read_text().splitlines():
        p = line.split()
        if len(p) < 5:
            continue
        c = int(float(p[0]))
        x, y, bw, bh = (float(v) for v in p[1:5])
        out.append((c, int((x - bw / 2) * w), int((y - bh / 2) * h),
                    int((x + bw / 2) * w), int((y + bh / 2) * h)))
    return out


def read_voc(xml: Path, names_out: list):
    out = []
    if not xml.exists():
        return out
    for obj in ET.parse(xml).findall("object"):
        name = obj.findtext("name", "obj")
        if name not in names_out:
            names_out.append(name)
        b = obj.find("bndbox")
        out.append((
            names_out.index(name),
            int(float(b.findtext("xmin"))), int(float(b.findtext("ymin"))),
            int(float(b.findtext("xmax"))), int(float(b.findtext("ymax"))),
        ))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--labels", required=True)
    ap.add_argument("--format", choices=("yolo", "voc"), default="yolo")
    ap.add_argument("--names", nargs="*", default=[], help="class names (yolo format)")
    ap.add_argument("--out", default="runs/label_show")
    args = ap.parse_args(argv)

    save_dir = increment_path(args.out, mkdir=True)
    names = list(args.names)
    n = 0
    for img_path in sorted(Path(args.images).iterdir()):
        if img_path.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp"):
            continue
        im = cv2.imread(str(img_path))
        if im is None:
            continue
        h, w = im.shape[:2]
        lab = Path(args.labels) / (img_path.stem + (".txt" if args.format == "yolo" else ".xml"))
        boxes = read_yolo(lab, w, h) if args.format == "yolo" else read_voc(lab, names)
        for c, x1, y1, x2, y2 in boxes:
            col = COLORS[c % len(COLORS)]
            cv2.rectangle(im, (x1, y1), (x2, y2), col, 2)
            label = names[c] if c < len(names) else str(c)
            cv2.putText(im, label, (x1, max(y1 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.5, col, 1)
        cv2.imwrite(str(Path(save_dir) / img_path.name), im)
        n += 1
    print(f"annotated {n} images -> {save_dir}")
    return save_dir


if __name__ == "__main__":
    main()
