"""Measure the W-parity folded conv against the plain half-lane conv.

Targets PERF.md lever (2): the L2 C2fCBAM's internal 3x3 c64 convs at
160^2, measured at 27 TF/s achieved vs the 115 TF/s class ceiling. The
width-pad experiment showed the cost is layout-bound (c64 == c128 wall
time), so packing lanes via the exact W-parity fold
(ops/foldconv.py) should approach the full-lane rate even though it
executes 4x the nominal MACs.

Run on the TPU (idle chip!):
    python tools/probe_fold_conv.py            # timing sweep
    JAX_PLATFORMS=cpu python tools/probe_fold_conv.py --check  # parity only
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from yolosomi_tpu.ops.foldconv import conv3x3_w_folded, conv_folded, fold_kernel, fold_w, unfold_w


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


def plain_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def chain_plain(x, ks):
    for k in ks:
        x = jax.nn.silu(plain_conv(x, k))
    return x


def chain_folded(x, kfs):
    """Fold once, run the whole cascade folded, unfold once — the C2f
    bottleneck-chain usage pattern (SiLU is elementwise: commutes with
    the fold)."""
    xf = fold_w(x)
    for kf in kfs:
        xf = jax.nn.silu(conv_folded(xf, kf))
    return unfold_w(xf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="numerical parity only")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)

    # exact-parity check (f32, small)
    x = jnp.asarray(rng.standard_normal((2, 16, 20, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32) * 0.1
    want = plain_conv(x, k)
    got = conv3x3_w_folded(x, k)
    err = float(jnp.abs(want - got).max() / (jnp.abs(want).max() + 1e-9))
    print(f"parity rel-err {err:.2e}")
    assert err < 1e-5, "folded conv is not equivalent"
    if args.check:
        print("OK (parity only)")
        return

    print(f"device: {jax.devices()[0].platform}  b={args.b} dtype={dt}")
    print(f"{'shape':>22} {'plain ms':>9} {'folded ms':>10} {'chain3 plain':>13} {'chain3 fold':>12}")
    for h, w, c in ((160, 160, 64), (160, 160, 128), (80, 80, 128), (320, 320, 32)):
        x = jnp.asarray(rng.standard_normal((args.b, h, w, c)), dt)
        ks = [jnp.asarray(rng.standard_normal((3, 3, c, c)), dt) * 0.05 for _ in range(3)]
        kfs = [fold_kernel(k) for k in ks]

        p1 = timed(jax.jit(plain_conv), x, ks[0])
        f1 = timed(jax.jit(conv3x3_w_folded), x, ks[0])
        p3 = timed(jax.jit(chain_plain), x, ks)
        f3 = timed(jax.jit(chain_folded), x, kfs)
        gf = args.b * h * w * c * c * 9 * 2 / 1e9
        print(f"{args.b}x{h}x{w}x{c:>4} {p1:9.3f} {f1:10.3f} {p3:13.3f} {f3:12.3f}"
              f"   ({gf:.1f} GF/conv: plain {gf/p1:.0f} -> fold {gf/f1:.0f} TF/s)")


if __name__ == "__main__":
    main()
