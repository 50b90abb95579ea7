#!/usr/bin/env bash
# Eval launcher (reference: val.sh — test-split protocol settings)
python val.py --weights runs/train/YOLO-SOMI_640/weights/best.msgpack \
  --imgsz 640 --task test --conf-thres 0.001 --iou-thres 0.6 --batch-size 48 \
  --name YOLO-SOMI_640_test
