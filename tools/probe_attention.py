"""Locate the headroom inside the attention + BiFPN/upsample block classes.

PERF.md round-3 speed-of-light table names three distributed headrooms:
  - SEAM (3 sites, 2.34 ms meas vs 1.17 SoL)
  - C2fEMACBAM (6 sites, 7.90 ms vs 5.41)
  - Upsample/BiFPN plumbing (13 sites, 6.2 ms vs 1.56 — pure bandwidth)
  - 1x1 laterals (1.85 ms vs 0.45)

This probe times each block at its real flagship site shapes with
surgical ablations, so the optimization lands where the milliseconds
are instead of where the speculation is.

Run on the IDLE TPU: python tools/probe_attention.py [--b 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    # tunnel-honest completion: fetch one data-dependent element to host
    # (block_until_ready can return early through the remote relay)
    return float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        _fetch(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)  # stream-ordered: last completion bounds all iterations
    return (time.perf_counter() - t0) / iters * 1e3


def bench_module(mod, x, train=False, **apply_kw):
    v = mod.init(jax.random.PRNGKey(0), x, train=train) if _takes_train(mod) else mod.init(jax.random.PRNGKey(0), x)
    if _takes_train(mod):
        f = jax.jit(lambda v_, x_: mod.apply(v_, x_, train=train))
    else:
        f = jax.jit(lambda v_, x_: mod.apply(v_, x_))
    return timed(f, v, x)


def _takes_train(mod):
    import inspect

    return "train" in inspect.signature(type(mod).__call__).parameters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    B = args.b

    from yolosomi_tpu.models.layers import (
        SEAM, BiFPN, C2fCBAM, Conv, ConvRaw, EMACBAMBottleneck, Upsample,
    )
    import flax.linen as nn

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape), dt)

    print(f"device={jax.devices()[0].platform} b={B} dtype={dt}\n")

    # ---- SEAM at its 3 sites (c=256 @ 160/80/40) -------------------------
    print("== SEAM (dw+pw stack, SE gate) ==")
    for hw in (160, 80, 40):
        x = arr((B, hw, hw, 256))
        full = bench_module(SEAM(256, 1, 16, dtype=dt), x, train=False)
        # pieces: dw convs only / pw conv only / gate only
        dw = bench_module(ConvRaw(256, 3, 1, g=256, use_bias=True, dtype=dt), x)
        pw = bench_module(ConvRaw(256, 1, 1, use_bias=True, dtype=dt), x)
        print(f"  {hw}^2x256: full {full:7.3f} ms | dw3x3 {dw:6.3f} | pw1x1 {pw:6.3f}")

    # ---- EMACBAM bottleneck at its site shapes ---------------------------
    print("\n== EMACBAMBottleneck (2 convs + channel gate + grouped spatial gate + GN) ==")

    class _NoSpatial(EMACBAMBottleneck):
        @nn.compact
        def __call__(self, x, train=False):  # type: ignore[override]
            import flax.linen as nn_

            c_ = int(self.c2 * self.e)
            y = ConvRaw(c_, 3, 1, use_bias=True, dtype=self.dtype, name="cv1")(x)
            y = ConvRaw(self.c2, 3, 1, use_bias=True, dtype=self.dtype, name="cv2")(y)
            avg = jnp.mean(y, axis=(1, 2))
            mx = jnp.max(y, axis=(1, 2))
            fc1 = nn_.Dense(max(y.shape[-1] // self.factor, 1), use_bias=False, dtype=self.dtype, name="fc1")
            fc2 = nn_.Dense(y.shape[-1], use_bias=False, dtype=self.dtype, name="fc2")
            gate_c = nn_.sigmoid(fc2(nn_.relu(fc1(avg))) + fc2(nn_.relu(fc1(mx))))
            return y * gate_c[:, None, None, :]

    class _ConvsOnly(EMACBAMBottleneck):
        @nn.compact
        def __call__(self, x, train=False):  # type: ignore[override]
            c_ = int(self.c2 * self.e)
            y = ConvRaw(c_, 3, 1, use_bias=True, dtype=self.dtype, name="cv1")(x)
            return ConvRaw(self.c2, 3, 1, use_bias=True, dtype=self.dtype, name="cv2")(y)

    for hw, c in ((160, 128), (80, 128), (40, 128), (40, 256), (20, 512)):
        x = arr((B, hw, hw, c))
        full = bench_module(EMACBAMBottleneck(c, e=1.0, dtype=dt), x, train=False)
        nos = bench_module(_NoSpatial(c, e=1.0, dtype=dt), x, train=False)
        convs = bench_module(_ConvsOnly(c, e=1.0, dtype=dt), x, train=False)
        print(
            f"  {hw}^2x{c:>4}: full {full:7.3f} ms | -spatial-GN {nos:7.3f} | convs-only {convs:7.3f}"
            f"  (gates+GN cost {full - nos + 0:.3f}+{nos - convs:.3f})"
        )

    # ---- upsample variants ----------------------------------------------
    print("\n== Upsample 2x nearest (pure bandwidth) ==")

    def up_repeat(x):
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    def up_bcast(x):
        b, h, w, c = x.shape
        return jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)

    for hw, c in ((80, 256), (40, 256), (20, 1024)):
        x = arr((B, hw, hw, c))
        r = timed(jax.jit(up_repeat), x)
        bc = timed(jax.jit(up_bcast), x)
        gb = 2 * B * hw * hw * 4 * c * x.dtype.itemsize / 1e9  # read + 4x write
        print(f"  {hw}^2x{c:>4} -> {2*hw}^2: repeat {r:6.3f} ms | bcast {bc:6.3f} ms ({gb:.2f} GB -> {gb/bc*1e3:.0f} GB/s)")

    # fused consumer chain: upsample -> concat -> 1x1 conv (the real graph shape)
    print("\n== upsample+concat+1x1 chain (lateral class) ==")
    for hw, c in ((80, 256), (40, 512)):
        lo, skip = arr((B, hw, hw, c)), arr((B, 2 * hw, 2 * hw, c))
        k = arr((1, 1, 2 * c, c)) * 0.05

        def chain_repeat(lo, skip, k):
            y = jnp.concatenate([up_repeat(lo), skip], -1)
            return jax.lax.conv_general_dilated(y, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def chain_bcast(lo, skip, k):
            y = jnp.concatenate([up_bcast(lo), skip], -1)
            return jax.lax.conv_general_dilated(y, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def chain_split(lo, skip, k):
            # concat+1x1 == sum of two half-kernel 1x1s: never materialize the concat
            k1, k2 = k[:, :, :c], k[:, :, c:]
            y1 = jax.lax.conv_general_dilated(up_bcast(lo), k1, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y2 = jax.lax.conv_general_dilated(skip, k2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y1 + y2

        cr = timed(jax.jit(chain_repeat), lo, skip, k)
        cb = timed(jax.jit(chain_bcast), lo, skip, k)
        cs = timed(jax.jit(chain_split), lo, skip, k)
        print(f"  up {hw}->{2*hw} c{c}: concat-repeat {cr:6.3f} | concat-bcast {cb:6.3f} | split-matmul {cs:6.3f} ms")

    # ---- BiFPN weighted add ---------------------------------------------
    print("\n== BiFPN weighted add (2 inputs) ==")
    for hw, c in ((160, 256), (80, 256)):
        xs = [arr((B, hw, hw, c)), arr((B, hw, hw, c))]
        m = BiFPN(2, dtype=dt)
        v = m.init(jax.random.PRNGKey(0), xs)
        t = timed(jax.jit(lambda v_, a, b_: m.apply(v_, [a, b_])), v, xs[0], xs[1])
        gb = 3 * B * hw * hw * c * xs[0].dtype.itemsize / 1e9
        print(f"  {hw}^2x{c}: {t:6.3f} ms ({gb:.2f} GB -> {gb/t*1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
