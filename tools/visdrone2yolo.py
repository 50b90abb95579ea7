"""VisDrone annotation -> YOLO txt converter.

Counterpart of reference VisDrone2YOLO_lable.py:18-32 and the embedded
converter in data/VisDrone.yaml:23-61. VisDrone annotation rows are
`x,y,w,h,score,category,truncation,occlusion` with categories 1-10
mapping to YOLO classes 0-9; rows with score 0 (ignored regions) are
dropped.

Usage:
    python tools/visdrone2yolo.py --dir ../datasets/VisDrone/VisDrone2019-DET-train
"""

from __future__ import annotations

import argparse
from pathlib import Path

from PIL import Image


def convert(dir_path: Path) -> None:
    (dir_path / "labels").mkdir(parents=True, exist_ok=True)
    anns = sorted((dir_path / "annotations").glob("*.txt"))
    for f in anns:
        img_path = dir_path / "images" / f.with_suffix(".jpg").name
        if not img_path.exists():
            continue
        img_size = Image.open(img_path).size  # (w, h)
        lines = []
        for row in f.read_text().strip().splitlines():
            parts = row.strip().strip(",").split(",")
            if len(parts) < 6 or parts[4] == "0":  # score 0 = ignored region
                continue
            x, y, w, h = (int(v) for v in parts[:4])
            cls = int(parts[5]) - 1
            if cls < 0 or cls > 9:
                continue
            xc = (x + w / 2) / img_size[0]
            yc = (y + h / 2) / img_size[1]
            lines.append(f"{cls} {xc:.6f} {yc:.6f} {w / img_size[0]:.6f} {h / img_size[1]:.6f}")
        (dir_path / "labels" / f.name).write_text("\n".join(lines) + ("\n" if lines else ""))
    print(f"converted {len(anns)} annotation files in {dir_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", required=True, help="VisDrone2019-DET-* directory (with annotations/ images/)")
    args = parser.parse_args()
    convert(Path(args.dir))
