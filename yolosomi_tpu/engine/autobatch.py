"""Automatic batch-size estimation (counterpart of reference
utils/autobatch.py:22-56).

The reference fits a linear CUDA-memory model over profiled batch sizes.
On TPU the compiled executable reports its memory footprint analytically
(compiled.memory_analysis()), so the probe compiles candidate batch sizes
and picks the largest fitting in `fraction` of device memory — no OOM
retries, no timing runs.
"""

from __future__ import annotations

import numpy as np

import jax

from yolosomi_tpu.utils.general import LOGGER


def device_memory_bytes(default_gb: float = 16.0) -> int:
    d = jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    return int(default_gb * (1 << 30))


def autobatch(make_step, example_batch_fn, batch_sizes=(1, 2, 4, 8, 16, 32, 64), fraction: float = 0.9) -> int:
    """Pick the largest batch whose compiled step fits `fraction` of device
    memory. `make_step(bs)` returns a jittable f; `example_batch_fn(bs)`
    returns its example args."""
    limit = device_memory_bytes() * fraction
    best = batch_sizes[0]
    for bs in batch_sizes:
        try:
            fn = make_step(bs)
            args = example_batch_fn(bs)
            compiled = jax.jit(fn).lower(*args).compile()
            ma = compiled.memory_analysis()
            used = (
                getattr(ma, "temp_size_in_bytes", 0)
                + getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0)
                + getattr(ma, "alias_size_in_bytes", 0)
            )
            LOGGER.info(f"autobatch: bs={bs} -> {used / 1e9:.2f} GB (limit {limit / 1e9:.1f} GB)")
            if used > limit:
                break
            best = bs
        except Exception as e:
            LOGGER.warning(f"autobatch: bs={bs} failed ({e}); keeping {best}")
            break
    LOGGER.info(f"autobatch: selected batch size {best}")
    return best
