"""Train-side speed-of-light ledger: per-block fwd AND fwd+bwd times.

The round-3 forward ledger settled the serving question; this is its
training twin (round-3 verdict item 4): for every flagship block class
at its site shape, measure isolated forward and forward+backward
(value_and_grad of a sum), so the training-step MFU (27% at b16) can be
compared against what the graph's own blocks allow, and the remat /
batch-size levers argued with data.

Run on the IDLE chip: python tools/probe_train_ledger.py [--b 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    # through the remote tunnel block_until_ready returns before remote
    # execution finishes (bench.py methodology note) — only a host fetch
    # of a data-dependent scalar gives honest wall times
    return float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])


def timed(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _fetch(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    # fetch only the LAST output: executables run in order on the chip's
    # stream, so its completion bounds them all — one RTT per loop, not per
    # iteration
    _fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    B = args.b
    rng = np.random.default_rng(0)

    from yolosomi_tpu.models.layers import (
        SEAM, C2fCBAM, Conv, EMACBAMBottleneck, ODConv_3rd, SPPF,
    )

    # flagship site map (configs/models/yolo-somi.yaml): block, input shape, ctor
    sites = [
        ("Conv stem s2", (640, 640, 3), lambda: Conv(64, 3, 2, dtype=dt)),
        ("ODConv P2", (320, 320, 64), lambda: ODConv_3rd(128, 3, 2, 4, dtype=dt)),
        ("C2fCBAM L2", (160, 160, 128), lambda: C2fCBAM(128, n=3, shortcut=True, dtype=dt)),
        ("C2fCBAM L4", (80, 80, 256), lambda: C2fCBAM(256, n=6, shortcut=True, dtype=dt)),
        ("C2fCBAM L6", (40, 40, 512), lambda: C2fCBAM(512, n=6, shortcut=True, dtype=dt)),
        ("C2fCBAM L8", (20, 20, 1024), lambda: C2fCBAM(1024, n=3, shortcut=True, dtype=dt)),
        ("SPPF", (20, 20, 1024), lambda: SPPF(1024, 5, dtype=dt)),
        ("SEAM 160", (160, 160, 256), lambda: SEAM(256, 1, 16, dtype=dt)),
        ("EMACBAM 80", (80, 80, 256), lambda: EMACBAMBottleneck(256, e=1.0, dtype=dt)),
        ("EMACBAM 40x512", (40, 40, 512), lambda: EMACBAMBottleneck(512, e=1.0, dtype=dt)),
    ]

    print(f"device={jax.devices()[0].platform} b={B} dtype={dt}")
    print(f"{'block':>16} {'fwd ms':>8} {'fwd+bwd ms':>11} {'bwd/fwd':>8}")
    tot_f = tot_fb = 0.0
    for name, (h, w, c), ctor in sites:
        x = jnp.asarray(rng.standard_normal((B, h, w, c)), dt)
        m = ctor()
        import inspect

        takes_train = "train" in inspect.signature(type(m).__call__).parameters
        kw = {"train": False} if takes_train else {}
        v = m.init(jax.random.PRNGKey(0), x, **kw)

        fwd = jax.jit(lambda v_, x_: jnp.sum(m.apply(v_, x_, **kw).astype(jnp.float32)))
        fb = jax.jit(jax.value_and_grad(
            lambda v_, x_: jnp.sum(m.apply(v_, x_, **kw).astype(jnp.float32))
        ))
        try:
            tf_ = timed(fwd, v, x)
            tfb = timed(fb, v, x)
        except Exception as e:  # OOM guard at the big sites
            print(f"{name:>16}  FAILED: {type(e).__name__}")
            continue
        tot_f += tf_
        tot_fb += tfb
        print(f"{name:>16} {tf_:8.3f} {tfb:11.3f} {tfb / tf_ - 1:8.2f}x")
    print(f"{'TOTAL':>16} {tot_f:8.2f} {tot_fb:11.2f}  "
          f"(bwd multiple {(tot_fb - tot_f) / tot_f:.2f}x of fwd)")


if __name__ == "__main__":
    main()
