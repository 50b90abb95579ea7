#!/bin/bash
# Cloud-TPU VM startup script (reference: utils/aws/userdata.sh — same
# role: first-boot bootstrap + interrupted-run resume for spot/preemptible
# capacity). Attach as startup-script metadata on a TPU VM.
cd /home/$USER || cd /root
if [ ! -d yolosomi-tpu ]; then
  echo "First-boot: clone + deps + smoke test."
  git clone ${REPO_URL:-https://example.com/yolosomi-tpu} yolosomi-tpu
  cd yolosomi-tpu
  python -m pip install --upgrade pip
  pip install "jax[tpu]" flax optax opencv-python-headless pyyaml
  python detect.py --cfg configs/models/yolov5n.yaml \
      --source docs/ --imgsz 320 --conf-thres 0.9 || true
  echo "Bootstrap done."
else
  echo "Restart: resume interrupted runs."
  cd yolosomi-tpu
  # scan runs/train/*/weights/last.ckpt and relaunch each (the analogue of
  # utils/aws/resume.py; same logic lives in tools/resume_runs.py)
  python tools/resume_runs.py
fi
