"""Grad-CAM CLI (counterpart of reference yolo-gradcam/yolov5_heatmap.py).

Usage:
    python tools/gradcam.py --cfg yolo-somi --weights somi.msgpack \
        --source imgs/ --layer 17 --method gradcampp
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="yolo-somi")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--source", required=True)
    parser.add_argument("--layer", type=int, default=17)
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument("--method", choices=["gradcam", "gradcampp"], default="gradcam")
    parser.add_argument("--save-dir", default="runs/gradcam")
    args = parser.parse_args(argv)

    from yolosomi_tpu.explain import run_heatmaps

    run_heatmaps(args.cfg, args.weights, args.source, args.layer, args.imgsz, args.method, args.save_dir)


if __name__ == "__main__":
    main()
