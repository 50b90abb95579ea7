"""Device mesh + sharding helpers (TPU-native distribution layer).

Design (SURVEY.md §2.10 "TPU-native equivalent"): one
jax.sharding.Mesh('data', 'model') over all chips. The batch shards on
'data'; params/optimizer state replicate (pure data parallel — the
reference's only strategy, via DDP, train.py:207-209). XLA emits the
gradient all-reduce over ICI during backward — no NCCL, no explicit
collectives. BatchNorm statistics are computed over the *global* batch
under jit (mean over a sharded axis lowers to a psum), which reproduces
the reference's opt-in SyncBN (train.py:165-167) by construction.

The 'model' axis is reserved for spatially- or channel-sharded variants
(1280px+ drone frames; SURVEY.md §5.7) and has size 1 by default.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} mesh != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Leading-axis ('data') sharding for an ndim-array batch."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with the batch axis sharded on
    'data' (replaces DistributedSampler + .to(device), reference:
    datasets.py:113, train.py:249)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))), batch
    )


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def channel_shard_tree(tree, mesh: Mesh, min_channels: int = 64):
    """Tensor parallelism for a conv net: device_put a variables pytree
    with every weight whose LAST axis (out-channels for HWIO conv kernels
    and flax Dense kernels, the channel dim for their bias/BN vectors)
    is >= min_channels and divisible by the 'model' axis sharded on
    'model'; everything else replicates.

    Under jit, XLA's GSPMD partitioner propagates these shardings through
    the graph: each conv computes its own out-channel block, activations
    flow channel-sharded into elementwise/BN ops, and all-gathers are
    inserted exactly where a following conv needs every input channel —
    the conv analogue of Megatron-style column parallelism, with the
    collectives derived by the compiler instead of hand-placed (the
    scaling-book recipe). Composes with 'data' batch sharding on the
    same mesh. Output parity vs the replicated program is asserted in
    tests/test_sharding.py."""
    msize = mesh.shape["model"]
    rep = NamedSharding(mesh, P())

    def place(x):
        if (
            msize > 1
            and hasattr(x, "ndim")
            and x.ndim >= 1
            and x.shape[-1] >= min_channels
            and x.shape[-1] % msize == 0
        ):
            spec = P(*([None] * (x.ndim - 1)), "model")
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, tree)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard NHWC activations along H on the 'model' axis (SURVEY.md §5.7:
    the conv analogue of sequence parallelism for 1280px+ drone frames).
    XLA's SPMD partitioner inserts the halo exchanges convolutions need —
    no manual ppermute."""
    return NamedSharding(mesh, P("data", "model", None, None))


def shard_spatial(batch_images, mesh: Mesh):
    """device_put images with (data, model)-sharded (batch, height)."""
    return jax.device_put(batch_images, spatial_sharding(mesh))
