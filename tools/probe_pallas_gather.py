"""Feasibility probes: dynamic gathers inside Pallas/Mosaic TPU kernels.

DCNv3's bilinear sampling needs per-output-pixel dynamic indexing (4
corner taps x 9 kernel points, indices computed from learned offsets).
These probes test every vectorized-gather form Mosaic could lower; the
results drive the documented decision (PARITY.md §2.9) to keep DCNv3 on
the XLA batched-gather path rather than a Pallas kernel.

Measured on TPU v5e / jax 0.9.0 (2026-08, this repo's round 2):
- jnp.take(src, idx, axis=0)           -> ValueError (shape mismatch check)
- take_along_axis(..., axis=0) sublane -> AssertionError in lowering
- take_along_axis(..., axis=1) lane    -> compile hangs >400 s (killed)
The remaining forms are scalar dynamic-slice loops (the Pallas-NMS
failure mode: measured 2.4x slower than XLA's fused while_loop, PERF.md)
and one-hot MXU gathers (HW x FLOPs per sampled point — 100-1000x the
arithmetic). XLA's native batched gather is the TPU-idiomatic lowering.

Run: python tools/probe_pallas_gather.py  (expect failures; that is the data)
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(name, kern, args, out_shape):
    try:
        out = pl.pallas_call(kern, out_shape=out_shape)(*args)
        print(f"{name}: OK {np.asarray(out).shape}")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")


def main():
    print("jax", jax.__version__, jax.devices())
    rng = np.random.default_rng(0)

    def k_take(idx_ref, src_ref, out_ref):
        out_ref[...] = jnp.take(src_ref[...], idx_ref[...], axis=0)

    probe(
        "take(axis=0) row gather",
        k_take,
        (jnp.asarray(rng.integers(0, 256, 128), jnp.int32),
         jnp.asarray(rng.random((256, 128)), jnp.float32)),
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )

    def k_tala0(idx_ref, src_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=0)

    probe(
        "take_along_axis(axis=0) sublane gather",
        k_tala0,
        (jnp.asarray(rng.integers(0, 256, (128, 128)), jnp.int32),
         jnp.asarray(rng.random((256, 128)), jnp.float32)),
        jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )

    # WARNING: the lane-axis variant has been observed to hang the Mosaic
    # compile for >400 s — run it last.
    def k_tala1(idx_ref, src_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=1)

    probe(
        "take_along_axis(axis=1) lane gather",
        k_tala1,
        (jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32),
         jnp.asarray(rng.random((8, 128)), jnp.float32)),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )


if __name__ == "__main__":
    main()
