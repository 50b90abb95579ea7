#!/usr/bin/env bash
# Round-5 TPU work queue (single tunneled chip — one process at a time):
#   1. wait for the flagship teacher resume (-> 150 epochs / plateau)
#   2. hint-vs-output distillation A/B on the fastest student (verdict r4
#      item 7) — equal budgets, measured keep-or-discard
#   3. re-distill the remaining serving students at the round-5 budget
#      (verdict item 1: the round-4 25-epoch checkpoints are replaced)
#   4. family eval bf16 + int8(+head-excl); -p3s additionally gets the
#      per-channel activation-scale answer (verdict item 5) and, only if
#      per-channel does NOT close the gap, the per-layer neck sweep
#   5. the F1PR ablation chain (verdict item 4)
#   6. full bench (flagship + family measured; verdict item 3)
#
# Usage: nohup bash tools/round5_queue.sh > /tmp/round5_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

DATA=datasets/shapes1200/shapes.yaml
TEACHER_RUN=runs/train/flagship1200
TEACHER_PID_FILE=/tmp/train_teacher.pid
EPOCHS=${QUEUE_STUDENT_EPOCHS:-45}
CHAIN_EPOCHS=${QUEUE_CHAIN_EPOCHS:-12}

echo "[queue] waiting for teacher (pid $(cat $TEACHER_PID_FILE 2>/dev/null))"
while kill -0 "$(cat $TEACHER_PID_FILE 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo "[queue] teacher done at $(date)"

TEACHER_CKPT=$TEACHER_RUN/weights/best.ckpt
[[ -f $TEACHER_CKPT ]] || TEACHER_CKPT=$TEACHER_RUN/weights/last.ckpt
[[ -f $TEACHER_CKPT ]] || { echo "[queue] no teacher checkpoint; abort"; exit 1; }

distill_one() { # $1 = cfg, $2 = run name, extra args after
  local cfg=$1 name=$2; shift 2
  echo "[queue] ===== distill $name ($(date)) ====="
  timeout 4500 python train.py --cfg "$cfg" --data "$DATA" --hyp hyp.shapes-distill \
    --imgsz 640 --batch-size 24 --epochs "$EPOCHS" --name "$name" --cache device \
    --ckpt-period 10 --val-period 5 --exist-ok --noautoanchor \
    --teacher "$TEACHER_CKPT" --teacher-cfg yolo-somi --distill 1.0 "$@" \
    || echo "[queue] $name FAILED"
}

# ---- hint A/B on the fastest student: identical budget, only the hint
# term differs. The winner's checkpoint becomes the published -p3s8.
distill_one yolo-somi-t-p3s8 yolo-somi-t-p3s81200
distill_one yolo-somi-t-p3s8 s8-hint --distill-hint 0.5

# ---- remaining students, output-only recipe
distill_one yolo-somi-t      yolo-somi-t1200
distill_one yolo-somi-t-p3   yolo-somi-t-p31200
distill_one yolo-somi-t-p3s  yolo-somi-t-p3s1200

# ---- family eval: bf16 and int8+head-excl (fresh checkpoints)
fit() { python - "$1" <<'EOF'
import json,sys
try: print(json.load(open(sys.argv[1]))["fitness"])
except Exception: print("nan")
EOF
}
eval_one() { # $1 = cfg, $2 = run name
  local W=runs/train/$2/weights/best.msgpack
  [[ -f $W ]] || W=runs/train/$2/weights/last.msgpack
  [[ -f $W ]] || { echo "[eval] $2: no weights"; return; }
  echo "[eval] ===== $2 bf16 ====="
  timeout 2400 python val.py --weights "$W" --cfg "$1" --data "$DATA" --imgsz 640 \
    --batch-size 24 --name "val-$2-bf16" --exist-ok 2>&1 | tail -6
  echo "[eval] ===== $2 int8+head-excl ====="
  timeout 2400 python val.py --weights "$W" --cfg "$1" --data "$DATA" --imgsz 640 \
    --batch-size 24 --int8 --int8-exclude head --name "val-$2-int8" --exist-ok 2>&1 | tail -6
}

eval_one yolo-somi-t-p3s8 yolo-somi-t-p3s81200
eval_one yolo-somi-t-p3s8 s8-hint
eval_one yolo-somi-t      yolo-somi-t1200
eval_one yolo-somi-t-p3   yolo-somi-t-p31200
eval_one yolo-somi-t-p3s  yolo-somi-t-p3s1200

# also refresh the teacher's own val rows at the final checkpoint
eval_one yolo-somi flagship1200

# ---- -p3s int8: the per-channel activation-scale answer (verdict item 5)
P3SW=runs/train/yolo-somi-t-p3s1200/weights/best.msgpack
if [[ -f $P3SW ]]; then
  echo "[queue] ===== p3s int8 per-channel ($(date)) ====="
  timeout 2400 python val.py --weights "$P3SW" --cfg yolo-somi-t-p3s --data "$DATA" \
    --imgsz 640 --batch-size 24 --int8 --int8-exclude head --int8-per-channel \
    --name val-p3s-int8-pc --exist-ok 2>&1 | tail -6
  BF=$(fit runs/val/val-yolo-somi-t-p3s1200-bf16/metrics.json)
  PC=$(fit runs/val/val-p3s-int8-pc/metrics.json)
  echo "[queue] p3s bf16 fitness=$BF vs int8-per-channel=$PC"
  CLOSE=$(python - "$BF" "$PC" <<'EOF'
import sys
bf, pc = float(sys.argv[1]), float(sys.argv[2])
print("yes" if pc >= bf - 0.005 else "no")
EOF
)
  if [[ "$CLOSE" != "yes" ]]; then
    echo "[queue] per-channel insufficient -> per-layer neck sweep (rows 10-19)"
    timeout 7200 python tools/quant_sensitivity.py --weights "$P3SW" \
      --cfg yolo-somi-t-p3s --data "$DATA" --imgsz 640 --batch-size 24 \
      --rows 10-19 --chunk 1 --base-exclude head --max-rounds 2 \
      --out runs/quant_sensitivity_p3s.json \
      || echo "[queue] p3s sweep FAILED"
  else
    echo "[queue] per-channel closes the p3s gap — sweep not needed"
  fi
fi

# ---- ablation chain (verdict item 4): v5s -> +C2f -> +BiFPN/P2 ->
# +ODConv/Decoupled -> SOMI, same data/budget/protocol
echo "[queue] ===== ablation chain ($(date)) ====="
EPOCHS=$CHAIN_EPOCHS bash tools/ablation_chain.sh \
  || echo "[queue] ablation chain FAILED"

# ---- final measured bench: flagship + whole family on THIS tree
echo "[queue] ===== bench ($(date)) ====="
timeout 4800 python bench.py 2>&1 | tail -12 || echo "[queue] bench FAILED"

# ---- Pareto table rebuild
python tools/pareto_table.py 2>/dev/null || true
echo "[queue] all done at $(date)"
