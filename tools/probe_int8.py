"""Does XLA hit the v5e int8 MXU path? Microbench bf16 vs int8 matmul and
conv at serving-relevant shapes (PERF.md round-2: the int8 serving path
measured no end-to-end win — this isolates whether the primitive itself
is faster, or whether quantize/dequantize overhead and non-MXU time
dominate).

Run: python tools/probe_int8.py
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
            # perturb the first operand with the carried value so XLA can
            # neither hoist the op out of the loop (LICM) nor CSE it
            x = a[0]
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x + (i % 2).astype(x.dtype)
            else:
                x = x * (1.0 + 1e-6 * acc).astype(x.dtype)
            out = fn(x, *a[1:])
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0))

    float(run(args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    return best / chain * 1000


def main():
    rng = np.random.default_rng(0)
    # matmul: 4096x4096x4096
    m = 4096
    a_bf = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
    b_bf = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
    a_i8 = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
    b_i8 = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
    flops = 2 * m**3
    ms = timed_chained(lambda x, y: jnp.dot(x, y), (a_bf, b_bf))
    print(f"matmul {m}^3 bf16: {ms:7.3f} ms  {flops/ms/1e9:7.1f} TFLOP/s")
    ms = timed_chained(
        lambda x, y: jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ),
        (a_i8, b_i8),
    )
    print(f"matmul {m}^3 int8: {ms:7.3f} ms  {flops/ms/1e9:7.1f} TOP/s")

    # conv: b8 40x40 c256->256 k3 (flagship P4-ish)
    x_bf = jnp.asarray(rng.standard_normal((8, 40, 40, 256)), jnp.bfloat16)
    w_bf = jnp.asarray(rng.standard_normal((3, 3, 256, 256)), jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 127, (8, 40, 40, 256)), jnp.int8)
    w_i8 = jnp.asarray(rng.integers(-127, 127, (3, 3, 256, 256)), jnp.int8)
    cflops = 2 * 8 * 40 * 40 * 256 * 256 * 9

    def conv(x, w, pt):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pt,
        )

    ms = timed_chained(lambda x, w: conv(x, w, jnp.float32), (x_bf, w_bf))
    print(f"conv3x3 c256 bf16: {ms:7.3f} ms  {cflops/ms/1e9:7.1f} TFLOP/s")
    ms = timed_chained(lambda x, w: conv(x, w, jnp.int32), (x_i8, w_i8))
    print(f"conv3x3 c256 int8: {ms:7.3f} ms  {cflops/ms/1e9:7.1f} TOP/s")

    # end-to-end int8 conv including quantize+dequantize (the serving form)
    xf = jnp.asarray(rng.standard_normal((8, 40, 40, 256)), jnp.float32)

    def conv_q(x, w):
        s = 0.03
        xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
        y = conv(xq, w, jnp.int32)
        return y.astype(jnp.float32) * (s * 0.02)

    ms = timed_chained(lambda x, w: conv_q(x, w), (xf, w_i8))
    print(f"conv3x3 c256 int8+q/dq: {ms:7.3f} ms  {cflops/ms/1e9:7.1f} TOP/s")


if __name__ == "__main__":
    main()
