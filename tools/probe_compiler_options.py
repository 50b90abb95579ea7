"""Sweep per-compile XLA compiler options on the flagship forward (real TPU).

Round-2/3 note said XLA flag sweeps were impossible through the remote
tunnel because the LOCAL jaxlib is a CPU build that hard-rejects TPU
flags in XLA_FLAGS before the compile ships. This probe bypasses that:
`jit(f).lower(...).compile(compiler_options={...})` embeds the options
in the compile request itself, so the REMOTE TPU compiler parses them.

Timing: chained fori_loop with dtype-preserving input perturbation
(PERF.md methodology — the loop carry defeats hoisting; the scalar
fetch forces completion through the tunnel).

Run one option set per invocation (each is a fresh remote compile):
    python tools/probe_compiler_options.py --opts base
    python tools/probe_compiler_options.py --opts lhs
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

OPTION_SETS = {
    "base": {},
    # latency-hiding scheduler: overlaps HBM copies with compute
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    # larger scoped VMEM for fusion scratch (default is ~16MB class)
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "lhs_vmem": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "65536",
    },
    # async done-checks / multi-level scheduling knobs
    "flags_misc": {
        "xla_tpu_enable_data_parallel_all_reduce_opt": "true",
        "xla_tpu_data_parallel_opt_different_sized_ops": "true",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opts", default="base")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    opts = OPTION_SETS[args.opts]

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

    def run_fn(v_, x_):
        def body(i, acc):
            y = model.apply(v_, x_ * (1.0 + 1e-6 * acc).astype(x_.dtype), train=False)
            return acc + sum(jnp.sum(l).astype(jnp.float32) for l in jax.tree_util.tree_leaves(y))

        return jax.lax.fori_loop(0, args.chain, body, jnp.float32(0))

    lowered = jax.jit(run_fn).lower(variables, x)
    t0 = time.perf_counter()
    compiled = lowered.compile(compiler_options=opts) if opts else lowered.compile()
    print(f"# compile({args.opts}) ok in {time.perf_counter() - t0:.1f}s: {opts}")
    float(compiled(variables, x))
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(compiled(variables, x))
        best = min(best, time.perf_counter() - t0)
    ms = best / args.chain * 1000
    print(f"# forward {args.opts}: {ms:.1f} ms/b{args.batch} -> {args.batch / ms * 1000:.1f} img/s")


if __name__ == "__main__":
    main()
