"""Raw per-sample-weight conv kernel timing (no attention trunk, no
weight mix): odconv_s2_pallas vs vmap(conv), achieved TF/s per site."""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from yolosomi_tpu.ops.odconv_pallas import odconv_s2_pallas  # noqa: E402


def vmap_conv(x, w):
    def one(xi, wi):
        return jax.lax.conv_general_dilated(
            xi[None], wi, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    return jax.vmap(one)(x, w)


def timed(fn, x, w, chain=50, reps=3):
    @jax.jit
    def run(x_, w_):
        def body(i, acc):
            y = fn(x_ * (1.0 + 1e-6 * acc).astype(x_.dtype), w_)
            return acc + jnp.sum(y).astype(jnp.float32)

        return jax.lax.fori_loop(0, chain, body, jnp.float32(0))

    float(run(x, w))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, w))
        best = min(best, time.perf_counter() - t0)
    return best / chain * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    b = args.batch
    sites = [
        ("P1 320^2 c64->128", (b, 320, 320, 64), 128),
        ("P2 160^2 c256->256", (b, 160, 160, 256), 256),
        ("P3 80^2 c256->256", (b, 80, 80, 256), 256),
        ("P4 40^2 c256->256", (b, 40, 40, 256), 256),
    ]
    rng = np.random.default_rng(0)
    for name, shape, cout in sites:
        B, H, W, C = shape
        x = jnp.asarray(rng.random(shape), jnp.bfloat16)
        w = jnp.asarray(rng.random((B, 3, 3, C, cout)) * 0.1, jnp.bfloat16)
        gflop = 2 * B * (H // 2) * (W // 2) * 9 * C * cout / 1e9
        for label, fn in [("vmap", vmap_conv), ("pallas", odconv_s2_pallas)]:
            ms = timed(fn, x, w)
            print(f"{name:22s} {label:8s} {ms:7.3f} ms  {gflop / ms:6.1f} TF/s")


if __name__ == "__main__":
    main()
