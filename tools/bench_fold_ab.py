"""A/B the W-parity fold on the real serving benchmark (bench.py protocol).

The only decider that round 3 validated is the e2e forward A/B —
isolated per-layer numbers are ~1.6x inflated and can invert verdicts
(PERF.md 'measurement-harness fixes'). This runs bench.bench() (full
detect path, pipelined, int8 leg included) with the fold disabled, then
enabled, on the same process/chip.

Run on the IDLE chip: python tools/bench_fold_ab.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import bench
    from yolosomi_tpu.ops.foldconv import fold_w_mode

    print("== base (fold off) ==")
    base = bench.bench()["best"]
    print("== fold_w_mode(64) ==")
    with fold_w_mode(64):
        fold = bench.bench()["best"]
    print(f"\nA/B: base {base:.1f} img/s vs fold {fold:.1f} img/s "
          f"({(fold / base - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
