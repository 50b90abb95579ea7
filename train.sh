#!/usr/bin/env bash
# Flagship training launcher (reference: train.sh — same role, TPU flags)
python train.py --cfg configs/models/yolo-somi.yaml --name YOLO-SOMI_640 \
  --batch-size 24 --imgsz 640 --epochs 150
