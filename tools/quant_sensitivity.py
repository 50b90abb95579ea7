"""Automated int8 layer-exclusion search (round-3 verdict item 8).

Replaces the manual `val.py --int8 --int8-exclude head` guess with a
measured per-group sensitivity sweep: evaluate the checkpoint's fitness
(0.1*P + 0.1*R + 0.1*mAP50 + 0.7*mAP, reference utils/metrics.py:15-18)
under the EXACT val protocol for (a) bf16, (b) all-int8, then (c)
greedily exclude the graph-layer group whose float fallback recovers the
most fitness, until within --eps of the bf16 baseline (or the budget is
spent). Emits the exclusion regex set + the measured table as JSON and a
PERF.md-ready markdown block.

Each distinct exclusion set is a fresh XLA trace (the int8/float split is
a trace-time decision, ops/quant.py quant_mode), so compile count — not
eval time — is the budget; groups are therefore coarse structural chunks
(--chunk graph rows per group, head always its own group).

Usage:
    python tools/quant_sensitivity.py --weights runs/train/x/weights/best.msgpack \
        --cfg yolo-somi --data datasets/shapes1200/shapes.yaml --imgsz 640 \
        --out runs/quant_sensitivity.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _fitness(results) -> float:
    from yolosomi_tpu.utils.metrics import fitness

    return float(fitness(np.array(results[:4])))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True)
    parser.add_argument("--cfg", default="yolo-somi")
    parser.add_argument("--data", required=True)
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--eps", type=float, default=0.002,
                        help="stop when int8 fitness is within eps of bf16")
    parser.add_argument("--chunk", type=int, default=6,
                        help="graph rows per candidate group (head separate)")
    parser.add_argument("--rows", default=None, metavar="LO-HI",
                        help="restrict candidate groups to graph rows LO..HI inclusive "
                             "(e.g. 10-19 = the -p3s neck bisect, PARETO.md r4)")
    parser.add_argument("--base-exclude", nargs="+", default=[], metavar="REGEX",
                        help="exclusions applied to EVERY int8 eval including the "
                             "baseline ('head' = the detect head)")
    parser.add_argument("--max-rounds", type=int, default=3,
                        help="greedy rounds (each evaluates every remaining group)")
    parser.add_argument("--out", default="runs/quant_sensitivity.json")
    args = parser.parse_args(argv)

    import val as val_cli
    from yolosomi_tpu.data.datasets import DataLoader, DetectionDataset
    from yolosomi_tpu.engine.runner import Runner
    from yolosomi_tpu.utils.config import find_config, load_data_cfg

    data = load_data_cfg(find_config(args.data, "data"))
    runner = Runner(args.cfg, args.weights, nc=int(data["nc"]), imgsz=args.imgsz)
    n_layers = len(runner.model.layers)
    dataset = DetectionDataset(
        data["val"], img_size=args.imgsz, batch_size=args.batch_size,
        augment=False, rect=False, stride=runner.stride, pad=0.5,
    )
    dataloader = DataLoader(dataset, args.batch_size, shuffle=False)

    head = n_layers - 1
    base_exclude = tuple(
        rf"^layers_{head}/" if p == "head" else p for p in args.base_exclude
    )

    def evaluate(int8: bool, exclude=()):
        results, _, _ = val_cli.run(
            data=args.data, cfg=args.cfg, imgsz=args.imgsz, batch_size=args.batch_size,
            int8=int8, int8_exclude=base_exclude + tuple(exclude),
            runner=runner, dataloader=dataloader,
            names=data.get("names"), plots=False,
        )
        return _fitness(results)

    # candidate groups: contiguous row chunks + the head on its own
    # (--rows LO-HI restricts to a sub-range, e.g. the p3s neck bisect)
    groups = {}
    if args.rows:
        row_lo, row_hi = (int(v) for v in args.rows.split("-"))
        row_hi = min(row_hi + 1, head)
    else:
        row_lo, row_hi = 0, head
    for lo in range(row_lo, row_hi, args.chunk):
        hi = min(lo + args.chunk, row_hi)
        pat = rf"^layers_({'|'.join(str(i) for i in range(lo, hi))})/"
        groups[f"rows{lo}-{hi - 1}"] = pat
    if not args.rows and not base_exclude:
        groups["head"] = rf"^layers_{head}/"

    table = []
    f_bf16 = evaluate(False)
    f_all = evaluate(True)
    table.append({"config": "bf16", "fitness": f_bf16})
    table.append({"config": "int8-all", "fitness": f_all})
    print(f"bf16 fitness {f_bf16:.4f} | int8-all {f_all:.4f} (gap {f_bf16 - f_all:+.4f})")

    chosen: list[str] = []
    best = f_all
    remaining = dict(groups)
    rounds = 0
    while best < f_bf16 - args.eps and remaining and rounds < args.max_rounds:
        rounds += 1
        scores = {}
        for name, pat in remaining.items():
            f = evaluate(True, [groups[c] for c in chosen] + [pat])
            scores[name] = f
            table.append({"config": f"int8 - {'+'.join(chosen + [name])}", "fitness": f})
            print(f"  exclude {'+'.join(chosen + [name]):<28} fitness {f:.4f}")
        pick = max(scores, key=scores.get)
        if scores[pick] <= best:
            print("no group improves further; stopping")
            break
        chosen.append(pick)
        best = scores[pick]
        del remaining[pick]
        print(f"round {rounds}: exclude {pick} -> fitness {best:.4f}")

    exclusion = [groups[c] for c in chosen]
    result = {
        "bf16_fitness": f_bf16,
        "int8_all_fitness": f_all,
        "final_fitness": best,
        "eps": args.eps,
        "within_eps": bool(best >= f_bf16 - args.eps),
        "exclude_groups": chosen,
        "exclude_regexes": exclusion,
        "base_exclude": list(base_exclude),
        "cli": "--int8 " + (" ".join(f"--int8-exclude '{r}'" for r in exclusion) if exclusion else ""),
        "table": table,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(result, indent=2))

    print("\n| config | fitness |\n|---|---|")
    for row in table:
        print(f"| {row['config']} | {row['fitness']:.4f} |")
    print(f"\nexclusion set -> {args.out}\n  {result['cli']}")


if __name__ == "__main__":
    main()
