"""Full-graph forward A/B at serving batch: e2e effect of one code-level
variant at a time (isolated per-layer numbers mislead — fusion and layout
change in-graph, see PERF.md round-3 notes).

Run on TPU, one variant per invocation (each is one remote compile):
    python tools/bench_forward_ab.py --variant base
    python tools/bench_forward_ab.py --variant odconv_vmap
Timing: chained fori_loop, input perturbed in its own dtype.
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


def timed_chained(apply_fn, v, x, chain=8, reps=3):
    @jax.jit
    def run(v_, x_):
        def body(i, acc):
            y = apply_fn(v_, x_ * (1.0 + 1e-6 * acc).astype(x_.dtype))
            return acc + sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree_util.tree_leaves(y))

        return jax.lax.fori_loop(0, chain, body, jnp.float32(0))

    float(run(v, x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(v, x))
        best = min(best, time.perf_counter() - t0)
    return best / chain * 1000


def apply_variant(name: str):
    import yolosomi_tpu.models.layers as L

    if name == "base":
        return
    if name == "odconv_vmap":
        L.ODConv2d.__dataclass_fields__["impl"].default = "vmap"
        return
    if name == "odconv_im2col":
        L.ODConv2d.__dataclass_fields__["impl"].default = "im2col"
        return
    if name == "odconv_pallas":
        L.ODConv2d.__dataclass_fields__["impl"].default = "pallas"
        return
    raise SystemExit(f"unknown variant {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=640)
    args = ap.parse_args()

    apply_variant(args.variant)

    from yolosomi_tpu.models.yolo import build_model
    from yolosomi_tpu.utils.config import find_config, load_model_cfg

    cfg = load_model_cfg(find_config("yolo-somi"))
    model, meta = build_model(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, args.imgsz, args.imgsz, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(rng)
    x = jnp.asarray(
        np.random.default_rng(0).random((args.batch, args.imgsz, args.imgsz, 3)), jnp.bfloat16
    )
    ms = timed_chained(lambda v, xi: model.apply(v, xi, train=False), variables, x)
    ips = args.batch / ms * 1000
    print(f"# forward-only {args.variant}: {ms:.1f} ms/b{args.batch} -> {ips:.1f} img/s")


if __name__ == "__main__":
    main()
