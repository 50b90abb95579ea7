"""SPMD parallelism (L1): mesh construction + sharding helpers.

Replaces the reference's torch.distributed/NCCL DDP stack entirely
(SURVEY.md §2.10): gradient all-reduce, SyncBN, DistributedSampler, and
rank gating all collapse into jax.sharding annotations on one Mesh.
"""

from yolosomi_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
