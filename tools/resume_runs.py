"""Interrupted-run resume helper (counterpart of reference
utils/aws/resume.py:1-40): scan runs/**/last.ckpt, read the saved
opt.yaml, and relaunch (or print) the training commands.

Usage:
    python tools/resume_runs.py [--dir runs/train] [--dry-run]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", default="runs/train")
    parser.add_argument("--dry-run", action="store_true", help="print commands only")
    args = parser.parse_args(argv)

    for last in sorted(Path(args.dir).glob("**/weights/last.ckpt")):
        run_dir = last.parents[1]
        opt_yaml = run_dir / "opt.yaml"
        if not opt_yaml.exists():
            print(f"skip {run_dir}: no opt.yaml")
            continue
        opt = yaml.safe_load(opt_yaml.read_text())
        done = False
        results = run_dir / "results.csv"
        if results.exists():
            rows = results.read_text().strip().splitlines()
            if len(rows) > 1:
                last_epoch = int(rows[-1].split(",")[0])
                done = last_epoch >= int(opt.get("epochs", 0)) - 1
        if done:
            print(f"skip {run_dir}: finished")
            continue
        cmd = [
            sys.executable, "train.py",
            "--weights", str(last), "--resume",
            "--cfg", str(opt.get("cfg", "yolo-somi")),
            "--data", str(opt.get("data", "visdrone")),
            "--hyp", str(opt.get("hyp", "hyp.visdrone")),
            "--epochs", str(opt.get("epochs", 300)),
            "--batch-size", str(opt.get("batch_size", 16)),
            "--imgsz", str(opt.get("imgsz", 640)),
            "--project", str(Path(run_dir).parent),
            "--name", Path(run_dir).name, "--exist-ok",
        ]
        print(" ".join(cmd))
        if not args.dry_run:
            subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
