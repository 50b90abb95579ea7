"""Ablation curve comparison (counterpart of reference utils/F1PR.py):
overlays the PR_curve.csv / F1_curve.csv dumps of multiple runs on one
figure — the workflow the reference uses to produce its SOMI ablation
charts (F1PR.py:6-12 names the chain yolov5 -> +c2f -> bifpn+P2 ->
decoupled+odconv -> +cbam+seam).

Usage:
    python tools/compare_curves.py --runs runs/val/a runs/val/b \
        --labels baseline ours --curve PR --out compare_PR.png
"""

from __future__ import annotations

import argparse
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--runs", nargs="+", required=True, help="run dirs containing *_curve.csv")
    parser.add_argument("--labels", nargs="+", default=None)
    parser.add_argument("--curve", choices=["PR", "F1", "P", "R"], default="PR")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    labels = args.labels or [Path(r).name for r in args.runs]
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    for run, label in zip(args.runs, labels):
        csv = Path(run) / f"{args.curve}_curve.csv"
        if not csv.exists():
            print(f"skip {run}: no {csv.name}")
            continue
        df = pd.read_csv(csv)
        x = df["x"]
        ys = df.drop(columns=["x"])
        mean = ys.mean(axis=1)
        ax.plot(x, mean, linewidth=2, label=f"{label} ({mean.max():.3f} max)" if args.curve != "PR" else label)
    ax.set_xlabel("Recall" if args.curve == "PR" else "Confidence")
    ax.set_ylabel({"PR": "Precision", "F1": "F1", "P": "Precision", "R": "Recall"}[args.curve])
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend()
    out = args.out or f"compare_{args.curve}.png"
    fig.savefig(out, dpi=250)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
