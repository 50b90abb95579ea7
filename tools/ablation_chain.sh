#!/usr/bin/env bash
# F1PR ablation chain on shapes1200 (VERDICT r3 item 7): train the
# reference's own ablation progression (utils/F1PR.py:6-12) —
#   yolov5s -> +C2f -> +BiFPN/P2 -> +ODConv/Decoupled -> full SOMI —
# and publish the mAP progression. The full-SOMI point reuses the
# flagship1200 teacher run (same data/hyp/imgsz), so this script trains
# the four v5s-scale chain members only.
#
# Usage: nohup bash tools/ablation_chain.sh > /tmp/ablation_chain.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

DATA=datasets/shapes1200/shapes.yaml
EPOCHS=${EPOCHS:-60}

run_one() { # $1 = cfg, $2 = run name
  echo "[ablation] ===== $2 ($(date)) ====="
  timeout 2700 python train.py --cfg "$1" --data "$DATA" --hyp hyp.visdrone \
    --imgsz 640 --batch-size 24 --epochs "$EPOCHS" --name "$2" --cache device \
    --ckpt-period 20 --val-period 5 --exist-ok --noautoanchor \
    || echo "[ablation] $2 FAILED"
  local W=runs/train/$2/weights/best.msgpack
  [[ -f $W ]] || W=runs/train/$2/weights/last.msgpack
  [[ -f $W ]] || { echo "[ablation] $2: no weights"; return; }
  echo "[ablation] ===== val $2 ====="
  timeout 1800 python val.py --weights "$W" --cfg "$1" --data "$DATA" --imgsz 640 \
    --batch-size 24 --name "val-$2" --exist-ok 2>&1 | tail -4
}

run_one yolov5s            abl-v5s
run_one ablation/v5s-c2f   abl-v5s-c2f
run_one ablation/v5s-c2f-bifpn-p2 abl-v5s-c2f-bifpn-p2
run_one ablation/v5s-c2f-odconv-bifpn-p2-decoupled abl-v5s-c2f-od-dec

echo "[ablation] chain done at $(date). Full-SOMI point: runs/train/flagship1200."
