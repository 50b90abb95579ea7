"""Microbenchmark: ODConv lowerings on the real TPU (PERF.md round-2 item:
ODConv costs ~15% of the flagship forward; is the batched-matmul lowering
faster than the batch-grouped conv?).

Run on TPU: python tools/bench_odconv.py
Timing uses the scalar-fetch data dependency (PERF.md methodology).
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolosomi_tpu.models.layers import ODConv2d


def timed(fn, args, iters=8):
    """Wall time per call with the scalar fetch overlapped (PERF.md)."""
    float(fn(*args))
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        cur = fn(*args)
        if prev is not None:
            float(prev)
        prev = cur
    float(prev)
    return (time.perf_counter() - t0) / iters * 1000


def timed_chained(apply_fn, v, x, chain=20, reps=3):
    """Compute-only time: chain `chain` applications inside ONE jit so the
    tunnel round-trip (~29 ms) amortizes away; report per-application ms."""
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def run(v_, x_):
        def body(i, acc):
            # perturb in the INPUT dtype: a f32 eps would promote bf16
            # operands to f32 and benchmark the wrong precision (the
            # bf16-rounded eps may equal 1.0, but it still depends on the
            # loop carry, so XLA cannot hoist the apply)
            y = apply_fn(v_, x_ * (1.0 + 1e-6 * acc).astype(x_.dtype))
            return acc + jnp.sum(y).astype(jnp.float32)
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0))

    float(run(v, x))
    best = min(
        (lambda t0: (float(run(v, x)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps)
    )
    return best / chain * 1000


def main():
    # the flagship's ODConv sites (yolo-somi.yaml): k3 s2 downsamples
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--impls", default="vmap,im2col")
    args = ap.parse_args()
    b = args.batch
    # the flagship's four ODConv sites (yolo-somi.yaml): k3 s2 downsamples
    cases = [
        ("P1 320->160 c64->128", (b, 320, 320, 64), 128),
        ("P2 160->80 c256->256", (b, 160, 160, 256), 256),
        ("P3 80->40 c256->256", (b, 80, 80, 256), 256),
        ("P4 40->20 c256->256", (b, 40, 40, 256), 256),
    ]
    for name, shape, c2 in cases:
        x = jnp.asarray(np.random.rand(*shape).astype(np.float32), jnp.bfloat16)
        for impl in args.impls.split(","):
            m = ODConv2d(c2, 3, 2, impl=impl, dtype=jnp.bfloat16)
            v = m.init(jax.random.PRNGKey(0), x)
            ms = timed_chained(lambda v_, x_, m=m: m.apply(v_, x_), v, x)
            print(f"{name:28s} {impl:12s} {ms:8.3f} ms/apply (compute-only)")


if __name__ == "__main__":
    main()
