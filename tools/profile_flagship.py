"""Per-layer TPU microprofile of the flagship graph.

For each layer in configs/models/yolo-somi.yaml, reconstruct its input
shapes from the compiled LayerSpecs, then time layer.apply on the real
TPU with the chained-fori_loop methodology (tunnel RTT amortized away,
see tools/bench_odconv.py). Prints a table sorted by total ms/batch so
the optimization queue (PERF.md) targets measured hot spots, not guesses.

Usage: python tools/profile_flagship.py [--batch 8] [--imgsz 640]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed_chained(apply_fn, args, chain=60, reps=2):
    import functools

    @jax.jit
    def run(a):
        def body(i, acc):
            # perturb the input by the carried scalar so XLA cannot hoist
            # the loop-invariant apply out of the fori_loop
            v, x = a
            eps = 1.0 + 1e-6 * acc
            xp = jax.tree_util.tree_map(lambda t: t * eps.astype(t.dtype), x)
            out = apply_fn(v, xp)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l).astype(jnp.float32) for l in leaves) * 1e-9
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0))

    float(run(args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / chain * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--cfg", default="yolo-somi")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument(
        "--flops",
        action="store_true",
        help="print per-layer GFLOP from XLA cost analysis instead of timing "
        "(run under JAX_PLATFORMS=cpu; feeds the PERF.md speed-of-light table)",
    )
    args = ap.parse_args()

    from yolosomi_tpu.models.yolo import build_model
    from yolosomi_tpu.utils.config import find_config, load_model_cfg

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = load_model_cfg(find_config(args.cfg))
    model, meta = build_model(cfg, dtype=dtype)
    b, sz = args.batch, args.imgsz
    rng = jax.random.PRNGKey(0)

    def shape_of(spec):
        side = int(round(sz / spec.stride)) if spec.stride else None
        return (b, side, side, spec.c2)

    rows = []
    total = 0.0
    for i, (mod, spec) in enumerate(zip(model.layers, meta.specs)):
        if i == len(model.layers) - 1:
            # head: list input from head_from
            ins = [jnp.zeros(shape_of(meta.specs[j]), dtype) for j in model.head_from]
            x_in = ins
        elif i == 0:
            x_in = jnp.asarray(np.random.rand(b, sz, sz, 3), dtype)
        elif isinstance(spec.f, int):
            src = meta.specs[spec.f if spec.f >= 0 else i + spec.f]
            x_in = jnp.asarray(np.random.rand(*shape_of(src)), dtype)
        else:
            x_in = [
                jnp.asarray(np.random.rand(*shape_of(meta.specs[j if j >= 0 else i + j])), dtype)
                for j in spec.f
            ]
        try:
            variables = jax.jit(lambda xi=x_in, m=mod: m.init(rng, xi, False))()
            if args.flops:
                cost = (
                    jax.jit(lambda v, xi, m=mod: m.apply(v, xi, False))
                    .lower(variables, x_in)
                    .compile()
                    .cost_analysis()
                )
                cost = cost[0] if isinstance(cost, list) else cost
                gf = float(cost.get("flops", 0.0)) / 1e9
                rows.append((gf, i, spec.name, shape_of(spec)))
                total += gf
                print(f"layer {i:3d} {spec.name:18s} out{shape_of(spec)!s:22s} {gf:9.2f} GF")
                continue
            ms = timed_chained(lambda v, xi, m=mod: m.apply(v, xi, False), (variables, x_in))
        except Exception as e:  # pragma: no cover
            print(f"# layer {i} {spec.name} failed: {type(e).__name__}: {str(e)[:120]}")
            continue
        rows.append((ms, i, spec.name, shape_of(spec)))
        total += ms
        print(f"layer {i:3d} {spec.name:18s} out{shape_of(spec)!s:22s} {ms:8.3f} ms")

    unit = "GF" if args.flops else "ms"
    print(f"\n# total (sum of isolated layers): {total:.1f} {unit}/batch of {b}")
    print(f"# top 12 by {unit}:")
    for v, i, name, shp in sorted(rows, reverse=True)[:12]:
        print(f"#   {v:9.3f} {unit}  layer {i:3d} {name:18s} out {shp} ({100*v/total:.1f}%)")


if __name__ == "__main__":
    main()
