"""Assemble the serving-family Pareto table: img/s/chip vs measured mAP.

Round-3 verdict item 1 (and round-4 weak #1): the serving-family claim
must carry a measured accuracy column AND a throughput column measured
on the CURRENT tree. This collects:
  - accuracy: the val.py metrics.json files written by the round queue's
    eval stage (bf16 + int8 legs for the flagship teacher, the distilled
    students, the hint-distilled A/B, and the from-scratch control);
  - throughput: runs/bench_family.json, written by every bench.py run
    (bf16+int8 at the b128 operating point, pipelined scalar-fetch
    protocol). If absent, the column says "pending" — it is never quoted
    from an old round.

Usage:
    python tools/pareto_table.py [--val-root runs/val] [--out PARETO.md]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

# run-dir -> (label, bench_family model key)
RUNS = (
    ("flagship1200", "yolo-somi (flagship)", "__flagship__"),
    ("yolo-somi-t1200", "yolo-somi-t", "yolo-somi-t"),
    ("yolo-somi-t-p31200", "yolo-somi-t-p3", "yolo-somi-t-p3"),
    ("yolo-somi-t-p3s1200", "yolo-somi-t-p3s", "yolo-somi-t-p3s"),
    ("yolo-somi-t-p3s81200", "yolo-somi-t-p3s8", "yolo-somi-t-p3s8"),
    ("s8-hint", "yolo-somi-t-p3s8 (+hint distill)", "yolo-somi-t-p3s8"),
    ("somi-t-p3s8-scratch", "yolo-somi-t-p3s8 (scratch ctrl)", "yolo-somi-t-p3s8"),
)


def load(val_root: Path, run: str, leg: str):
    f = val_root / f"val-{run}-{leg}" / "metrics.json"
    return json.loads(f.read_text()) if f.exists() else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--val-root", default="runs/val")
    ap.add_argument("--bench", default="runs/bench_family.json")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    root = Path(args.val_root)

    bench = {}
    flagship_ips = None
    bpath = Path(args.bench)
    if bpath.exists():
        b = json.loads(bpath.read_text())
        flagship_ips = b.get("flagship_img_s")
        for row in b.get("family", []):
            bench[row["model"]] = row

    def ips_cell(key):
        if key == "__flagship__":
            return f"{flagship_ips:.0f}" if flagship_ips else "pending"
        r = bench.get(key)
        if not r or r.get("error"):
            return "pending"
        best = max(x for x in (r.get("int8_img_s"), r.get("bf16_img_s")) if x)
        return f"{best:.0f}"

    lines = [
        "| model | img/s/chip (measured this tree) | mAP@.5 bf16 | mAP@.5:.95 bf16 | mAP@.5 int8+head-excl | dmAP@.5 vs flagship |",
        "|---|---|---|---|---|---|",
    ]
    flagship50 = None
    rows = 0
    for run, label, bkey in RUNS:
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
            f"| {label} | {ips_cell(bkey)} | {bf['mAP50']:.3f} | {bf['mAP']:.3f} | {q50} | {delta} |"
        )
    table = "\n".join(lines)
    if rows == 0:
        print("no metrics.json found under", root)
        return 1
    print(table)
    if args.out:
        Path(args.out).write_text(
            "# Serving-family Pareto (shapes1200, 640px, val.py exact protocol)\n\n"
            + table
            + "\n\nThroughput measured by bench.py on the current tree "
            "(runs/bench_family.json; b128 int8-or-bf16 best, pipelined "
            "scalar-fetch protocol); accuracy measured by the round queue's "
            "val.py runs on this image.\n"
        )
        print(f"\nwritten to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
