"""Synthetic detection dataset generator (smoke/overfit runs).

Serves the role of coco128 in the reference's test strategy (SURVEY.md
§4: "mAP on coco128 as a golden regression test") in this zero-egress
environment: images with colored primitive shapes on textured noise,
three classes (0=circle, 1=rectangle, 2=triangle), YOLO txt labels.

Usage:
    python tools/make_shapes_dataset.py --out datasets/shapes --n 64
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np
import yaml


def make_image(rng, w=640, h=480, max_objects=6):
    im = np.ascontiguousarray(
        (rng.integers(0, 80, (h, w, 3)) + rng.integers(0, 40)).astype(np.uint8)
    )
    labels = []
    for _ in range(rng.integers(1, max_objects + 1)):
        cls = int(rng.integers(0, 3))
        size = int(rng.integers(30, 120))
        cx = int(rng.integers(size, w - size))
        cy = int(rng.integers(size, h - size))
        color = tuple(int(c) for c in rng.integers(120, 255, 3))
        if cls == 0:
            cv2.circle(im, (cx, cy), size // 2, color, -1)
            bw = bh = size
        elif cls == 1:
            bw, bh = size, int(size * 0.7)
            cv2.rectangle(im, (cx - bw // 2, cy - bh // 2), (cx + bw // 2, cy + bh // 2), color, -1)
        else:
            bw = bh = size
            pts = np.array(
                [[cx, cy - size // 2], [cx - size // 2, cy + size // 2], [cx + size // 2, cy + size // 2]]
            )
            cv2.fillPoly(im, [pts], color)
        labels.append((cls, cx / w, cy / h, bw / w, bh / h))
    return im, labels


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="datasets/shapes")
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--val-n", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    out = Path(args.out)
    for split, n in (("train", args.n), ("val", args.val_n)):
        (out / split / "images").mkdir(parents=True, exist_ok=True)
        (out / split / "labels").mkdir(parents=True, exist_ok=True)
        for i in range(n):
            im, labels = make_image(rng)
            cv2.imwrite(str(out / split / "images" / f"{split}{i:04d}.jpg"), im)
            with open(out / split / "labels" / f"{split}{i:04d}.txt", "w") as f:
                for row in labels:
                    f.write(" ".join(f"{v:.6f}" if isinstance(v, float) else str(v) for v in row) + "\n")
    yaml.safe_dump(
        {"path": str(out.resolve()), "train": "train/images", "val": "val/images",
         "nc": 3, "names": ["circle", "rectangle", "triangle"]},
        open(out / "shapes.yaml", "w"),
    )
    print(f"wrote {args.n}+{args.val_n} images to {out}")


if __name__ == "__main__":
    main()
