"""VOC XML -> COCO JSON converter (counterpart of reference xml2json.py:22-70).

Usage:
    python tools/voc2coco.py --xml dir/xml --out annotations.json --names ...
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from xml.etree import ElementTree


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--xml", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--names", nargs="+", default=None)
    args = parser.parse_args()

    images, annotations = [], []
    categories = {}
    if args.names:
        categories = {n: i + 1 for i, n in enumerate(args.names)}
    ann_id = 1
    for img_id, xml_path in enumerate(sorted(Path(args.xml).glob("*.xml")), 1):
        root = ElementTree.parse(xml_path).getroot()
        fname = root.findtext("filename") or xml_path.stem + ".jpg"
        w = int(root.findtext("size/width") or 0)
        h = int(root.findtext("size/height") or 0)
        images.append({"id": img_id, "file_name": fname, "width": w, "height": h})
        for obj in root.findall("object"):
            name = obj.findtext("name")
            if name not in categories:
                categories[name] = len(categories) + 1
            bb = obj.find("bndbox")
            x1, y1 = float(bb.findtext("xmin")), float(bb.findtext("ymin"))
            x2, y2 = float(bb.findtext("xmax")), float(bb.findtext("ymax"))
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": categories[name],
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": i, "name": n} for n, i in categories.items()],
    }
    Path(args.out).write_text(json.dumps(coco))
    print(f"wrote {len(images)} images / {len(annotations)} annotations to {args.out}")


if __name__ == "__main__":
    main()
