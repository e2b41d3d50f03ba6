"""Mesh construction and sharding rules (reference L5 / SURVEY.md §2.2).

The reference's only parallelism is DDP (Lightning/NCCL).  Here parallelism is
declarative: a `jax.sharding.Mesh` with axes
  'data'  — batch sharding (== the DDP replacement; gradient psum over ICI)
  'event' — event-capacity sharding within a sample (beyond-reference:
            the event-stream analog of sequence/context parallelism)
and `jit` with NamedSharding constraints; XLA inserts all collectives.
"""

from .mesh import make_mesh, batch_sharding, replicate, shard_batch, make_sharded_train_step
from .distributed import (initialize_distributed, process_batch_slice,
                          host_local_batch_to_global)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "make_sharded_train_step",
    "initialize_distributed",
    "process_batch_slice",
    "host_local_batch_to_global",
]
