"""YOLO txt -> VOC XML converter (counterpart of reference txt2xml.py).

Usage:
    python tools/yolo2voc.py --images dir/images --labels dir/labels \
        --out dir/xml --names pedestrian people ...
"""

from __future__ import annotations

import argparse
from pathlib import Path
from xml.etree.ElementTree import Element, ElementTree, SubElement

from PIL import Image


def to_xml(img_path: Path, label_path: Path, names, out_dir: Path) -> None:
    w, h = Image.open(img_path).size
    root = Element("annotation")
    SubElement(root, "filename").text = img_path.name
    size = SubElement(root, "size")
    SubElement(size, "width").text = str(w)
    SubElement(size, "height").text = str(h)
    SubElement(size, "depth").text = "3"
    if label_path.exists():
        for row in label_path.read_text().strip().splitlines():
            parts = row.split()
            if len(parts) < 5:
                continue
            c, xc, yc, bw, bh = int(parts[0]), *(float(v) for v in parts[1:5])
            obj = SubElement(root, "object")
            SubElement(obj, "name").text = names[c] if c < len(names) else str(c)
            SubElement(obj, "difficult").text = "0"
            bb = SubElement(obj, "bndbox")
            SubElement(bb, "xmin").text = str(int((xc - bw / 2) * w))
            SubElement(bb, "ymin").text = str(int((yc - bh / 2) * h))
            SubElement(bb, "xmax").text = str(int((xc + bw / 2) * w))
            SubElement(bb, "ymax").text = str(int((yc + bh / 2) * h))
    ElementTree(root).write(out_dir / (img_path.stem + ".xml"))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", required=True)
    parser.add_argument("--labels", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--names", nargs="+", default=[str(i) for i in range(10)])
    args = parser.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for img in sorted(Path(args.images).glob("*.jpg")):
        to_xml(img, Path(args.labels) / (img.stem + ".txt"), args.names, out)
        n += 1
    print(f"wrote {n} xml files to {out}")
