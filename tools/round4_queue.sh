#!/usr/bin/env bash
# Round-4 TPU work queue (single tunneled chip — one process at a time):
#   1. wait for the flagship teacher run (shapes1200)
#   2. perf probes on the idle chip (fold-conv, attention/BiFPN, e2e A/B)
#   3. distill the serving students from the teacher (mixup-free hyp:
#      one device-mosaic composite instead of two, PERF.md)
#   4. one from-scratch control
#   5. evaluate the whole family bf16 + int8(+head-excl) via val.py
#   6. automated int8 exclusion sweep on the fastest student
#
# Usage: nohup bash tools/round4_queue.sh > /tmp/round4_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

DATA=datasets/shapes1200/shapes.yaml
TEACHER_RUN=runs/train/flagship1200
TEACHER_PID_FILE=/tmp/train_teacher.pid

echo "[queue] waiting for teacher (pid $(cat $TEACHER_PID_FILE 2>/dev/null))"
while kill -0 "$(cat $TEACHER_PID_FILE 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo "[queue] teacher done at $(date)"

TEACHER_CKPT=$TEACHER_RUN/weights/best.ckpt
[[ -f $TEACHER_CKPT ]] || TEACHER_CKPT=$TEACHER_RUN/weights/last.ckpt
[[ -f $TEACHER_CKPT ]] || { echo "[queue] no teacher checkpoint; abort"; exit 1; }

# ---- perf probes on the idle chip (minutes; results -> /tmp/probe_*.log) --
echo "[queue] ===== perf probes ($(date)) ====="
timeout 1200 python tools/probe_fold_conv.py > /tmp/probe_fold.log 2>&1 \
  && tail -8 /tmp/probe_fold.log || echo "[queue] fold probe FAILED"
timeout 1800 python tools/probe_attention.py > /tmp/probe_attn.log 2>&1 \
  && tail -25 /tmp/probe_attn.log || echo "[queue] attention probe FAILED"
timeout 2400 python tools/bench_fold_ab.py > /tmp/bench_fold_ab.log 2>&1 \
  && tail -12 /tmp/bench_fold_ab.log || echo "[queue] fold A/B FAILED"
timeout 1800 python tools/probe_train_ledger.py > /tmp/probe_train_ledger.log 2>&1 \
  && tail -16 /tmp/probe_train_ledger.log || echo "[queue] train ledger FAILED"
# remat x batch sweep (verdict item 4): does recompute stop the b32/b64
# memory-bound backward regression?
for RB in "16 0" "16 3" "32 3"; do
  set -- $RB
  echo "[queue] bench_train b$1 remat=$2"
  timeout 1200 python tools/bench_train.py --batch "$1" --remat "$2" 2>&1 | tail -2
done > /tmp/bench_train_remat.log 2>&1 || echo "[queue] remat sweep FAILED"
tail -15 /tmp/bench_train_remat.log

# students: distill from the flagship (engine/distill.py level-mapped)
for S in yolo-somi-t yolo-somi-t-p3 yolo-somi-t-p3s yolo-somi-t-p3s8; do
  echo "[queue] ===== distill $S ($(date)) ====="
  timeout 3600 python train.py --cfg "$S" --data "$DATA" --hyp hyp.shapes-distill \
    --imgsz 640 --batch-size 24 --epochs 25 --name "${S}1200" --cache device \
    --ckpt-period 10 --val-period 5 --exist-ok --noautoanchor \
    --teacher "$TEACHER_CKPT" --teacher-cfg yolo-somi --distill 1.0 \
    || echo "[queue] $S distill FAILED"
done

# one from-scratch control on the fastest student (Pareto: distilled vs scratch)
echo "[queue] ===== scratch yolo-somi-t-p3s8 ($(date)) ====="
timeout 3600 python train.py --cfg yolo-somi-t-p3s8 --data "$DATA" --hyp hyp.shapes-distill \
  --imgsz 640 --batch-size 24 --epochs 15 --name somi-t-p3s8-scratch --cache device \
  --ckpt-period 10 --val-period 5 --exist-ok --noautoanchor || echo "[queue] scratch FAILED"

# evaluate the whole family: bf16 and int8 + head exclusion
eval_one() { # $1 = cfg, $2 = run name
  local W=runs/train/$2/weights/best.msgpack
  [[ -f $W ]] || W=runs/train/$2/weights/last.msgpack
  [[ -f $W ]] || { echo "[eval] $2: no weights"; return; }
  echo "[eval] ===== $2 bf16 ====="
  timeout 2400 python val.py --weights "$W" --cfg "$1" --data "$DATA" --imgsz 640 \
    --batch-size 24 --name "val-$2-bf16" --exist-ok 2>&1 | tail -8
  echo "[eval] ===== $2 int8+head-excl ====="
  timeout 2400 python val.py --weights "$W" --cfg "$1" --data "$DATA" --imgsz 640 \
    --batch-size 24 --int8 --int8-exclude head --name "val-$2-int8" --exist-ok 2>&1 | tail -8
}

eval_one yolo-somi flagship1200
eval_one yolo-somi-t yolo-somi-t1200
eval_one yolo-somi-t-p3 yolo-somi-t-p31200
eval_one yolo-somi-t-p3s yolo-somi-t-p3s1200
eval_one yolo-somi-t-p3s8 yolo-somi-t-p3s81200
eval_one yolo-somi-t-p3s8 somi-t-p3s8-scratch

# automated int8 exclusion on the fastest student (verdict item 8)
S8W=runs/train/yolo-somi-t-p3s81200/weights/best.msgpack
if [[ -f $S8W ]]; then
  echo "[queue] ===== quant sensitivity somi-t-p3s8 ($(date)) ====="
  timeout 3600 python tools/quant_sensitivity.py --weights "$S8W" \
    --cfg yolo-somi-t-p3s8 --data "$DATA" --imgsz 640 --batch-size 24 \
    --chunk 12 --max-rounds 1 --out runs/quant_sensitivity_p3s8.json \
    || echo "[queue] quant sweep FAILED"
fi

echo "[queue] all done at $(date)"
