"""Pipeline parallelism: 2-stage GPipe-style microbatch inference over a
'stage' mesh axis.

The TPU-native form of pipeline parallelism (scaling-book recipe): each
device along the 'stage' axis owns one contiguous slice of the layer
list, activations hop stage->stage over ICI via `lax.ppermute`, and a
microbatch loop keeps both stages busy — device s computes microbatch t
while device s+1 computes microbatch t-1. The reference has no
counterpart (its only distribution is DDP); this is the pp leg of the
dp/sp/tp/pp set, built for graphs too deep/wide for one chip's HBM.

Mechanics (see pipeline_infer):
- the layer list splits at `split`; the inter-stage payload is the
  boundary activation plus exactly the skip-connection tensors
  (`DetectionModel.save`) that stage 1 consumes — computed statically
  from the graph's `froms`.
- inside `shard_map` every device runs the same program; `lax.cond` on
  `axis_index('stage')` dispatches each device to its stage only, so
  per-tick compute is one stage per device (the conditional is dynamic —
  TPU executes the taken branch, not both).
- the classic GPipe schedule: at tick t, stage 0 computes microbatch t
  and ppermutes the payload; stage 1 consumes the payload carried from
  tick t-1. M microbatches take M+1 ticks; steady-state both stages are
  busy.
- weights are replicated in this implementation (each stage reads only
  its slice; stage-partitioned weight placement is the follow-up that
  matters when params alone exceed one chip's HBM).

Parity is exact by construction — the same layer programs run in the
same order — and asserted in tests/test_sharding.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stage_payload_keys(model, split: int) -> Tuple[int, ...]:
    """The saved-layer indices stage 1 (layers [split:]) consumes from
    stage 0 (layers [:split]) — the skip tensors that must cross the
    stage boundary, derived statically from the graph."""
    needed = set()
    n = len(model.layers)
    for i in range(split, n):
        f = model.froms[i]
        srcs = [f] if isinstance(f, int) else list(f)
        if i == n - 1 and model.head_from:
            srcs = list(model.head_from)
        for j in srcs:
            if j == -1:
                continue
            j_abs = j if j >= 0 else i + j
            if j_abs < split:
                needed.add(j_abs)
    return tuple(sorted(needed))


def pipeline_infer(model, variables, mesh: Mesh, split: int, imgsz: int, microbatch: int):
    """Build fn(images (M*mb, H, W, 3)) -> list of per-level maps, computed
    as a 2-stage pipeline over mesh axis 'stage' (size 2). Shapes are
    static: M microbatches of `microbatch` images each."""
    assert mesh.shape["stage"] == 2, "2-stage pipeline"
    keys = stage_payload_keys(model, split)

    def stage0(v, x):
        out, saved = model.apply(
            v, x, {}, 0, split, method=type(model).run_range
        )
        return (out, {k: saved[k] for k in keys})

    def stage1(v, payload):
        out, _ = model.apply(
            v, payload[0], payload[1], split, len(model.layers), method=type(model).run_range
        )
        return out

    # trace once (outside shard_map) to learn the static payload/pred shapes
    dummy_x = jnp.zeros((microbatch, imgsz, imgsz, 3), jnp.float32)
    payload_shape = jax.eval_shape(stage0, variables, dummy_x)
    preds_shape = jax.eval_shape(stage1, variables, payload_shape)

    def zeros_like_shape(t):
        return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), t)

    def fn(variables, images):
        if images.shape[0] % microbatch:
            raise ValueError(
                f"batch ({images.shape[0]}) must be a multiple of microbatch ({microbatch})"
            )
        M = images.shape[0] // microbatch
        mbs = images.reshape(M, microbatch, *images.shape[1:])

        def device_fn(v, mbs_):
            idx = jax.lax.axis_index("stage")
            carry = zeros_like_shape(payload_shape)
            acc = [jnp.zeros((M,) + tuple(s.shape), s.dtype) for s in preds_shape]
            for t in range(M + 1):
                if t < M:
                    sent = jax.lax.cond(
                        idx == 0,
                        lambda: stage0(v, mbs_[t]),
                        lambda: zeros_like_shape(payload_shape),
                    )
                else:
                    sent = zeros_like_shape(payload_shape)
                recv = jax.lax.ppermute(sent, "stage", [(0, 1)])
                if t >= 1:
                    # stage 1 consumes the payload carried from tick t-1
                    preds_t = jax.lax.cond(
                        idx == 1,
                        lambda c=carry: stage1(v, c),
                        lambda: zeros_like_shape(preds_shape),
                    )
                    acc = [a.at[t - 1].set(p) for a, p in zip(acc, preds_t)]
                carry = recv
            # stage-0 devices hold zeros; the sum gathers stage 1's result
            return [jax.lax.psum(a, "stage") for a in acc]

        rep = P()
        out = shard_map(
            device_fn, mesh=mesh, in_specs=(rep, rep), out_specs=rep, check_rep=False
        )(variables, mbs)
        # (M, mb, ...) -> (M*mb, ...) per level
        return [o.reshape(o.shape[0] * o.shape[1], *o.shape[2:]) for o in out]

    return jax.jit(fn)
