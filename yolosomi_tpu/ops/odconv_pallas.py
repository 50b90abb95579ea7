"""Fused Pallas kernel for the per-sample-weight (dynamic) convolution at
the heart of ODConv (reference: common.py:4495-4610 runs it as a grouped
conv with groups=B, view(1, B*C, H, W)).

Why a kernel: every flagship ODConv site is k=3 s=2, and each batch
element carries its OWN mixed (3,3,cin,cout) kernel. XLA's lowerings all
lose (measured, PERF.md):
  - vmap(conv) -> batch-grouped conv: 10-15 TF/s vs the ~115 TF/s dense
    rate (MXU tiles poorly over the group dim);
  - im2col -> one batched matmul, but the (B, oh*ow, 9*cin) patch tensor
    round-trips HBM (~6x the input bytes);
  - 9-tap strided-slice einsums at the XLA level pay 9 separate
    kernel-launch + slice materializations (18.3 ms vs 3.9 at P1).

TPU-first formulation here: decompose the stride-2 input into its four
(2x2) parity planes ONCE (a layout pass XLA fuses into the producer),
then a single Pallas kernel keeps an input row-band of all four planes
resident in VMEM and runs the 9 taps as 9 MXU matmuls against the
per-sample tap weights, accumulating in f32 registers/VMEM — the input
is read from HBM exactly once and no patch tensor ever exists.

Each tap (dy, dx) of the s=2 conv reads input row 2y + dy - 1 =
plane[(dy+1) % 2] row y + (0 if dy == 0 else 1) - 1, so with a 1-row/col
leading pad the whole 3x3 window lives in a (4, rpt+1, ow+1, cin) band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tap table, 4-plane variant (cin lane-aligned): (plane, band row, band col)
# plane = ((dy+1) % 2) * 2 + (dx+1) % 2 ; offset = 0 for d==0 else 1
_TAPS_4P = tuple(
    (((dy + 1) % 2) * 2 + (dx + 1) % 2, 0 if dy == 0 else 1, 0 if dx == 0 else 1)
    for dy in range(3)
    for dx in range(3)
)
# 2-plane variant (cin < 128): the W-parity is packed into the channel
# dim (K = 2*cin, full-lane) so the HBM memref needs no sub-lane slicing;
# 6 taps (dy, rx) — rx=0 carries only the dx=-1 weight (dx=0/1 zeroed),
# rx=1 carries dx=0 (ix=0) and dx=+1 (ix=1).
_TAPS_2P = tuple(
    ((dy + 1) % 2, 0 if dy == 0 else 1, rx) for dy in range(3) for rx in range(2)
)


def _pick_rpt(oh: int, ow: int, target_rows: int = 640) -> int:
    """Rows of output per grid step: aim for ~target_rows MXU rows while
    dividing oh exactly (static shapes everywhere)."""
    want = max(1, min(oh, target_rows // max(ow, 1)))
    for rpt in range(want, 0, -1):
        if oh % rpt == 0:
            return rpt
    return 1


def _kernel(w_ref, x_hbm, o_ref, band, patches, sem, *, rpt, ow, taps, C):
    """Grid is (B, m_tiles, n_tiles), n innermost. Per (b, mi): the input
    row-band is DMA'd (double-buffered against the previous band's
    compute), the tap windows are gathered ONCE into a VMEM patch matrix
    (this is im2col, but the patch tensor never touches HBM), and each
    output-channel tile is then a single aligned MXU matmul."""
    b = pl.program_id(0)
    mi = pl.program_id(1)
    ni = pl.program_id(2)
    nb, nm = pl.num_programs(0), pl.num_programs(1)

    def band_dma(slot, bb, m):
        return pltpu.make_async_copy(
            x_hbm.at[bb, :, pl.ds(m * rpt, rpt + 1)], band.at[slot], sem.at[slot]
        )

    step = b * nm + mi
    slot = jax.lax.rem(step, 2)

    @pl.when(jnp.logical_and(step == 0, ni == 0))
    def _():
        band_dma(slot, b, mi).start()

    @pl.when(ni == 0)
    def _():
        band_dma(slot, b, mi).wait()
        last_m = mi + 1 == nm
        nxt_b = jnp.where(last_m, b + 1, b)
        nxt_m = jnp.where(last_m, 0, mi + 1)

        @pl.when(jnp.logical_or(mi + 1 < nm, b + 1 < nb))
        def _():
            band_dma(1 - slot, nxt_b, nxt_m).start()

        for t, (p, ry, rx) in enumerate(taps):
            patches[:, t * C : (t + 1) * C] = band[
                slot, p, ry : ry + rpt, rx : rx + ow, :
            ].reshape(rpt * ow, C)

    out = jax.lax.dot_general(
        patches[:],
        w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype).reshape(rpt, ow, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def odconv_s2_pallas(x: jax.Array, wmix: jax.Array, interpret: bool = False) -> jax.Array:
    """Per-sample-weight 3x3 stride-2 SAME conv.

    x: (B, H, W, Cin) with H, W even; wmix: (B, 3, 3, Cin, Cout) with
    Cout a multiple of 128. Returns (B, H//2, W//2, Cout) in x.dtype.
    Matches jax.lax.conv_general_dilated(x[i], wmix[i], strides 2,
    padding 1) for every sample i (tests/test_odconv_pallas.py).
    """
    B, H, W, C = x.shape
    Cout = wmix.shape[-1]
    assert H % 2 == 0 and W % 2 == 0 and wmix.shape[1:4] == (3, 3, C)
    oh, ow = H // 2, W // 2
    TN = 128 if Cout % 128 == 0 else Cout
    rpt = _pick_rpt(oh, ow)
    # the W axis is padded AFTER to a sublane multiple — Mosaic requires
    # 8-aligned extents on the tiled dims of a sliced HBM memref
    wb = ow + 1 + (-(ow + 1)) % 8

    xr = x.reshape(B, oh, 2, ow, 2, C)
    if C % 128 == 0:
        # 4 parity planes, 9 taps of K=C (lane-aligned HBM slices)
        planes = xr.transpose(0, 2, 4, 1, 3, 5).reshape(B, 4, oh, ow, C)
        wtaps = wmix.reshape(B, 9, C, Cout)
        taps = _TAPS_4P
    else:
        # 2 row-parity planes; W-parity packed into channels (K = 2C):
        # band col rx=0 sees input cols 2x'-2 (ix=0, unused) and 2x'-1;
        # rx=1 sees 2x' and 2x'+1.
        planes = xr.transpose(0, 2, 1, 3, 4, 5).reshape(B, 2, oh, ow, 2 * C)
        zeros = jnp.zeros_like(wmix[:, :, 0])
        w_rx0 = jnp.concatenate([zeros, wmix[:, :, 0]], axis=2)  # (B,3,2C,Cout)
        w_rx1 = jnp.concatenate([wmix[:, :, 1], wmix[:, :, 2]], axis=2)
        wtaps = jnp.stack([w_rx0, w_rx1], axis=2).reshape(B, 6, 2 * C, Cout)
        C = 2 * C
        taps = _TAPS_2P
    nplanes, ntaps = (4, 9) if taps is _TAPS_4P else (2, 6)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (1, 0), (1, wb - ow - 1), (0, 0)))
    wtaps = wtaps.astype(x.dtype)

    wtaps = wtaps.reshape(B, ntaps * C, Cout)
    grid = (B, oh // rpt, Cout // TN)
    out = pl.pallas_call(
        functools.partial(_kernel, rpt=rpt, ow=ow, taps=taps, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, ntaps * C, TN),
                lambda b, mi, ni: (b, 0, ni),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, rpt, ow, TN),
            lambda b, mi, ni: (b, mi, 0, ni),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, oh, ow, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nplanes, rpt + 1, wb, C), x.dtype),
            pltpu.VMEM((rpt * ow, ntaps * C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # planes stay in HBM; the kernel DMAs its own overlapping row-band
        # (BlockSpec blocked indexing cannot express the +1 halo row)
        interpret=interpret,
    )(wtaps, planes)
    return out


def supported(k: int, s: int, g: int, d: int, h: int, w: int, cout: int) -> bool:
    """Static predicate: the graph configurations this kernel covers
    (every flagship ODConv site is k=3 s=2; anything else falls back to
    the vmap lowering)."""
    return (
        k == 3 and s == 2 and g == 1 and d == 1
        and h % 2 == 0 and w % 2 == 0 and cout % 128 == 0
    )
