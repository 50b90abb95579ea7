"""Assemble the serving-family Pareto table: img/s/chip vs measured mAP.

Round-3 verdict item 1: the 2,226 img/s (111% of north star) claim must
carry an accuracy column. This collects the val.py metrics.json files
written by tools/round4_queue.sh's eval stage (bf16 + int8 legs for the
flagship teacher, the four distilled students, and the from-scratch
control) and emits the PERF.md-ready markdown table. Throughput numbers
are quoted from PERF.md's round-3 serving-family measurements (marked as
such) unless a fresh bench log is supplied.

Usage:
    python tools/pareto_table.py [--val-root runs/val] [--out PARETO.md]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

# PERF.md round-3 serving-family throughput (int8 b128 / bf16 best), quoted.
THROUGHPUT = {
    "flagship1200": ("yolo-somi (flagship)", 286, 267),
    "yolo-somi-t1200": ("yolo-somi-t", 914, 790),
    "yolo-somi-t-p31200": ("yolo-somi-t-p3", 1645, 1396),
    "yolo-somi-t-p3s1200": ("yolo-somi-t-p3s", 1817, 1579),
    "yolo-somi-t-p3s81200": ("yolo-somi-t-p3s8", 2226, 1827),
    "somi-t-p3s8-scratch": ("yolo-somi-t-p3s8 (scratch ctrl)", 2226, 1827),
}


def load(val_root: Path, run: str, leg: str):
    d = val_root / f"val-{run}-{leg}"
    f = d / "metrics.json"
    if not f.exists():
        return None
    return json.loads(f.read_text())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--val-root", default="runs/val")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    root = Path(args.val_root)

    lines = [
        "| model | img/s/chip (int8, quoted PERF.md r3) | mAP@.5 bf16 | mAP@.5:.95 bf16 | mAP@.5 int8+head-excl | dmAP@.5 vs flagship |",
        "|---|---|---|---|---|---|",
    ]
    flagship50 = None
    rows = 0
    for run, (label, ips_int8, _ips_bf16) in THROUGHPUT.items():
        bf = load(root, run, "bf16")
        q = load(root, run, "int8")
        if bf is None:
            continue
        rows += 1
        if flagship50 is None and run == "flagship1200":
            flagship50 = bf["mAP50"]
        delta = f"{bf['mAP50'] - flagship50:+.3f}" if flagship50 is not None else "-"
        q50 = f"{q['mAP50']:.3f}" if q else "-"
        lines.append(
            f"| {label} | {ips_int8} | {bf['mAP50']:.3f} | {bf['mAP']:.3f} | {q50} | {delta} |"
        )
    table = "\n".join(lines)
    if rows == 0:
        print("no metrics.json found under", root)
        return 1
    print(table)
    if args.out:
        Path(args.out).write_text(
            "# Serving-family Pareto (shapes1200, 640px, val.py exact protocol)\n\n"
            + table + "\n\nThroughput column quoted from PERF.md round-3 measurements "
            "(int8 best batch); accuracy columns measured by the runs named in "
            "tools/round4_queue.sh on this image.\n"
        )
        print(f"\nwritten to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
