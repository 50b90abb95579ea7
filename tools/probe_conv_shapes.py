"""Conv efficiency sweep: lax.conv vs im2col+matmul at flagship shapes.

tools/probe_int8.py found a 3x3 c256 conv running at ~10 TFLOP/s while a
same-FLOPs matmul hits ~92 TFLOP/s. This sweeps the flagship's actual
conv shapes to find where XLA's conv lowering leaves MXU throughput on
the table, and tests the im2col reformulation as a candidate fix.

Run: python tools/probe_conv_shapes.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed_chained(fn, args, chain=400, reps=3):
    @jax.jit
    def run(a):
        def body(i, acc):
            eps = (1.0 + 1e-6 * acc).astype(a[0].dtype)
            out = fn(a[0] * eps, *a[1:])
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0))

    float(run(args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / chain * 1000


def conv(x, w, s=1):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), ((1, 1), (1, 1)) if w.shape[0] == 3 else ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def im2col_conv(x, w, s=1):
    """3x3 stride-s conv as 9 shifted slices + one big matmul."""
    b, h, wd, c = x.shape
    kh, kw, _, co = w.shape
    p = 1 if kh == 3 else 0
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    oh = (h + 2 * p - kh) // s + 1
    ow = (wd + 2 * p - kw) // s + 1
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            cols.append(
                jax.lax.slice(
                    xp, (0, dy, dx, 0),
                    (b, dy + (oh - 1) * s + 1, dx + (ow - 1) * s + 1, c),
                    (1, s, s, 1),
                )
            )
    patches = jnp.concatenate(cols, axis=-1).reshape(b * oh * ow, kh * kw * c)
    y = patches @ w.reshape(kh * kw * c, co)
    return y.reshape(b, oh, ow, co)


def main():
    rng = np.random.default_rng(0)
    # (label, b, h, c_in, c_out, k, s) — the flagship's hot conv shapes
    cases = [
        ("P1 3x3 s1 320x320 c64", 8, 320, 64, 64, 3, 1),
        ("P2 3x3 s1 160x160 c64", 8, 160, 64, 64, 3, 1),
        ("P2 3x3 s1 160x160 c128", 8, 160, 128, 128, 3, 1),
        ("P3 3x3 s1 80x80 c128", 8, 80, 128, 128, 3, 1),
        ("P3 3x3 s1 80x80 c256", 8, 80, 256, 256, 3, 1),
        ("P4 3x3 s1 40x40 c256", 8, 40, 256, 256, 3, 1),
        ("P5 3x3 s1 20x20 c512", 8, 20, 512, 512, 3, 1),
        ("P2 1x1 160x160 c128->256", 8, 160, 128, 256, 1, 1),
        ("P4 1x1 40x40 c512->256", 8, 40, 512, 256, 1, 1),
        ("P1->P2 3x3 s2 320 c64->128", 8, 320, 64, 128, 3, 2),
    ]
    for label, b, h, ci, co, k, s in cases:
        x = jnp.asarray(rng.standard_normal((b, h, h, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.05, jnp.bfloat16)
        oh = h // s
        flops = 2 * b * oh * oh * ci * co * k * k
        ms1 = timed_chained(lambda xx, ww: conv(xx, ww, s), (x, w))
        ms2 = timed_chained(lambda xx, ww: im2col_conv(xx, ww, s), (x, w))
        print(
            f"{label:30s} conv {ms1:7.3f} ms {flops/ms1/1e9:6.1f} TF/s"
            f" | im2col {ms2:7.3f} ms {flops/ms2/1e9:6.1f} TF/s"
        )


if __name__ == "__main__":
    main()
