"""Synthetic detection dataset generator (smoke/overfit + accuracy-axis runs).

Serves the role of coco128/VisDrone in the reference's test strategy
(SURVEY.md §4: "mAP on coco128 as a golden regression test") in this
zero-egress environment.

Two presets:
  - default ("shapes"): the round-1 smoke set — 3 classes, large objects,
    64+16 images. Used by overfit tests and the training-health cycle.
  - "shapes1200": the accuracy-axis set promised by PERF.md — 10 classes,
    1200+240 images at 640px, object sizes log-uniform 8..112 px biased
    SMALL (half below ~30 px, exercising the P2/stride-4 plane exactly the
    way VisDrone does per the reference's design intent,
    models/modules/YOLO-SOMI.yaml P2 head rows), textured backgrounds,
    low-contrast distractors, occlusion allowed. This is the set the
    serving-family Pareto (throughput vs mAP) is measured on.

Usage:
    python tools/make_shapes_dataset.py --out datasets/shapes --n 64
    python tools/make_shapes_dataset.py --preset shapes1200 --out datasets/shapes1200
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np
import yaml

CLASSES3 = ["circle", "rectangle", "triangle"]
CLASSES10 = [
    "circle", "rectangle", "triangle", "ellipse", "ring",
    "cross", "diamond", "star", "hbar", "pentagon",
]


def make_image(rng, w=640, h=480, max_objects=6):
    """Round-1 smoke image: few large objects on flat noise (3 classes)."""
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


def _textured_background(rng, w, h):
    """Smooth low-frequency gradient + band-limited noise + dim distractor
    blobs: enough clutter that detection requires shape, not just contrast."""
    # low-frequency color field: upsample a tiny random grid
    grid = rng.integers(20, 120, (4, 4, 3)).astype(np.uint8)
    im = cv2.resize(grid, (w, h), interpolation=cv2.INTER_CUBIC)
    noise = rng.normal(0, 12, (h, w, 3))
    im = np.clip(im.astype(np.float32) + noise, 0, 255).astype(np.uint8)
    # low-contrast distractor blobs (NOT labeled): ~background texture
    for _ in range(int(rng.integers(4, 12))):
        cx, cy = int(rng.integers(0, w)), int(rng.integers(0, h))
        r = int(rng.integers(4, 40))
        base = im[min(cy, h - 1), min(cx, w - 1)].astype(int)
        color = tuple(int(np.clip(c + rng.integers(-25, 25), 0, 255)) for c in base)
        cv2.circle(im, (cx, cy), r, color, -1)
    return np.ascontiguousarray(im)


def _draw_shape(im, cls, cx, cy, bw, bh, color, rng):
    """Draw one of the 10 shapes2 classes centered at (cx,cy) inside a
    bw×bh box. Returns the tight bbox actually drawn."""
    x0, y0, x1, y1 = cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2
    if cls == 0:  # circle
        cv2.circle(im, (int(cx), int(cy)), max(1, int(min(bw, bh) / 2)), color, -1)
    elif cls == 1:  # rectangle
        cv2.rectangle(im, (int(x0), int(y0)), (int(x1), int(y1)), color, -1)
    elif cls == 2:  # triangle (up)
        pts = np.array([[cx, y0], [x0, y1], [x1, y1]], np.int32)
        cv2.fillPoly(im, [pts], color)
    elif cls == 3:  # ellipse (axis-aligned, distinct aspect)
        cv2.ellipse(im, (int(cx), int(cy)), (max(1, int(bw / 2)), max(1, int(bh / 2))),
                    0, 0, 360, color, -1)
    elif cls == 4:  # ring (annulus)
        r = max(2, int(min(bw, bh) / 2))
        thick = max(1, r // 3)
        cv2.circle(im, (int(cx), int(cy)), r, color, thick)
    elif cls == 5:  # cross (+)
        t = max(1, int(min(bw, bh) / 4))
        cv2.rectangle(im, (int(cx - t / 2), int(y0)), (int(cx + t / 2), int(y1)), color, -1)
        cv2.rectangle(im, (int(x0), int(cy - t / 2)), (int(x1), int(cy + t / 2)), color, -1)
    elif cls == 6:  # diamond (rotated square)
        pts = np.array([[cx, y0], [x1, cy], [cx, y1], [x0, cy]], np.int32)
        cv2.fillPoly(im, [pts], color)
    elif cls == 7:  # 5-point star
        ro, ri = min(bw, bh) / 2, min(bw, bh) / 5
        ang = -np.pi / 2
        pts = []
        for k in range(10):
            r = ro if k % 2 == 0 else ri
            pts.append([cx + r * np.cos(ang + k * np.pi / 5), cy + r * np.sin(ang + k * np.pi / 5)])
        cv2.fillPoly(im, [np.array(pts, np.int32)], color)
    elif cls == 8:  # thin horizontal bar (extreme aspect: tests wh regression)
        cv2.rectangle(im, (int(x0), int(cy - bh / 2)), (int(x1), int(cy + bh / 2)), color, -1)
    else:  # pentagon
        r = min(bw, bh) / 2
        ang = -np.pi / 2
        pts = [[cx + r * np.cos(ang + 2 * k * np.pi / 5), cy + r * np.sin(ang + 2 * k * np.pi / 5)]
               for k in range(5)]
        cv2.fillPoly(im, [np.array(pts, np.int32)], color)


def make_image_rich(rng, w=640, h=640, n_min=12, n_max=40, s_min=8.0, s_max=112.0):
    """shapes1200 image: many small objects, textured clutter, occlusion."""
    im = _textured_background(rng, w, h)
    labels = []
    n = int(rng.integers(n_min, n_max + 1))
    for _ in range(n):
        cls = int(rng.integers(0, 10))
        # log-uniform size, biased small (exercises the P2 stride-4 plane)
        size = float(np.exp(rng.uniform(np.log(s_min), np.log(s_max))))
        if cls == 3:       # ellipse: wide
            bw, bh = size, size * float(rng.uniform(0.45, 0.7))
        elif cls == 8:     # hbar: extreme aspect
            bw, bh = size * 2.0, max(2.0, size * 0.35)
        elif cls == 1:     # rectangle: mild aspect jitter
            bw, bh = size, size * float(rng.uniform(0.6, 1.0))
        else:
            bw = bh = size
        bw, bh = min(bw, w - 4), min(bh, h - 4)
        cx = float(rng.uniform(bw / 2 + 1, w - bw / 2 - 1))
        cy = float(rng.uniform(bh / 2 + 1, h - bh / 2 - 1))
        # object color must clear the background locally: sample bright/sat
        hue = rng.integers(0, 180)
        hsv = np.uint8([[[hue, rng.integers(140, 255), rng.integers(150, 255)]]])
        color = tuple(int(c) for c in cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0, 0])
        _draw_shape(im, cls, cx, cy, bw, bh, color, rng)
        labels.append((cls, cx / w, cy / h, bw / w, bh / h))
    # mild global photometric jitter so brightness isn't a constant
    alpha = float(rng.uniform(0.85, 1.15))
    beta = float(rng.uniform(-12, 12))
    im = np.clip(im.astype(np.float32) * alpha + beta, 0, 255).astype(np.uint8)
    return im, labels


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="datasets/shapes")
    parser.add_argument("--preset", default="shapes", choices=["shapes", "shapes1200"])
    parser.add_argument("--n", type=int, default=None, help="train images (preset default)")
    parser.add_argument("--val-n", type=int, default=None, help="val images (preset default)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    rich = args.preset == "shapes1200"
    n = args.n if args.n is not None else (1200 if rich else 64)
    val_n = args.val_n if args.val_n is not None else (240 if rich else 16)
    names = CLASSES10 if rich else CLASSES3

    rng = np.random.default_rng(args.seed)
    out = Path(args.out)
    for split, count in (("train", n), ("val", val_n)):
        (out / split / "images").mkdir(parents=True, exist_ok=True)
        (out / split / "labels").mkdir(parents=True, exist_ok=True)
        for i in range(count):
            im, labels = make_image_rich(rng) if rich else make_image(rng)
            cv2.imwrite(str(out / split / "images" / f"{split}{i:04d}.jpg"), im)
            with open(out / split / "labels" / f"{split}{i:04d}.txt", "w") as f:
                for row in labels:
                    f.write(" ".join(f"{v:.6f}" if isinstance(v, float) else str(v) for v in row) + "\n")
    yaml.safe_dump(
        {"path": str(out.resolve()), "train": "train/images", "val": "val/images",
         "nc": len(names), "names": names},
        open(out / "shapes.yaml", "w"),
    )
    print(f"wrote {n}+{val_n} images ({len(names)} classes) to {out}")


if __name__ == "__main__":
    main()
