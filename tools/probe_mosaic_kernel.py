"""A/B the device-mosaic composite lowerings on the real TPU.

Compares the flat 4-tap gather (jnp.take of 3-byte rows from the flat
slab) against the windowed single lax.gather (slice_sizes (1,2,2,3)) at
training shapes, chained per PERF.md methodology (loop-carried input
perturbation so XLA cannot hoist; scalar fetch for honest timing).

Run on an idle host: python tools/probe_mosaic_kernel.py [--batch 24]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--n-images", type=int, default=240)
    ap.add_argument("--chain", type=int, default=30)
    args = ap.parse_args()

    from yolosomi_tpu.ops.mosaic_device import _composite_single

    B, S, N = args.batch, args.imgsz, args.n_images
    rng = np.random.default_rng(0)
    slab = rng.integers(0, 255, (N, S, S, 3), np.uint8)
    cache_flat = jax.device_put(jnp.asarray(slab).reshape(-1, 3))

    idx = jnp.asarray(rng.integers(0, N, (B, 4)), jnp.int32)
    center = jnp.asarray(rng.uniform(S * 0.5, S * 1.5, (B, 2)), jnp.float32)
    offs = jnp.asarray(rng.uniform(-S, S, (B, 4, 2)), jnp.float32)
    srect = jnp.tile(jnp.asarray([0, 0, S, S], jnp.float32), (B, 4, 1))
    theta = rng.uniform(-0.2, 0.2, B)
    minv = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    minv[:, 0, 0] = np.cos(theta) * 2
    minv[:, 0, 1] = -np.sin(theta) * 2
    minv[:, 1, 0] = np.sin(theta) * 2
    minv[:, 1, 1] = np.cos(theta) * 2
    minv = jnp.asarray(minv)

    for name, tiles_first in (("flat-4tap", False), ("tiles-first", True)):

        @jax.jit
        def chained(cache, m0, _tf=tiles_first):
            def body(i, carry):
                m, acc = carry
                out = _composite_single(
                    cache, S, idx, m, center, offs, srect, S, tiles_first=_tf
                )
                d = out.mean()
                # perturb the matrix with the carry so nothing hoists
                m = m + (d * 0.0).astype(m.dtype)[None, None, None] + (
                    acc * 1e-20
                ).astype(m.dtype)
                return m, acc + d

            m, acc = jax.lax.fori_loop(0, args.chain, body, (m0, jnp.float32(0)))
            return acc

        float(chained(cache_flat, minv))  # compile + warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(chained(cache_flat, minv))
        dt = (time.perf_counter() - t0) / (reps * args.chain)
        print(f"{name}: {dt * 1000:.2f} ms/composite (b{B} {S}px)")


if __name__ == "__main__":
    main()
