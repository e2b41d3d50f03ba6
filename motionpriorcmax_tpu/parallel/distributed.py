"""Multi-host initialization and host-local batch utilities.

Reference parallelism is single-node DDP (SURVEY.md §2.2); here multi-host
runs follow the standard JAX recipe:
  1. `initialize_distributed()` on every host (DCN coordination)
  2. one global Mesh over all devices (`make_mesh`)
  3. host-local data loading: each process loads its own batch shard and
     `host_local_batch_to_global` assembles the global array view

Checkpointing stays process-0-coordinated through orbax (training/checkpoint).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var defaults; no-op if single
    process or already initialized."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def process_batch_slice(global_batch: int) -> slice:
    """The [start, stop) slice of the global batch this host should load."""
    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch // n
    assert per * n == global_batch, (global_batch, n)
    return slice(idx * per, (idx + 1) * per)


def host_local_batch_to_global(
        mesh, batch: Dict[str, Any],
        event_keys=("events", "pos_events", "neg_events")) -> Dict[str, Any]:
    """Assemble global device arrays from host-local numpy shards.

    Each process passes its local slice of the batch; the result is a global
    jax.Array sharded over the mesh ('data' on dim 0; 'event' on dim 1 for
    event tensors).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for key, val in batch.items():
        if isinstance(val, (int, float)):
            out[key] = val
            continue
        arr = np.asarray(val)
        if arr.dtype.kind in ("U", "S", "O"):
            continue
        if arr.ndim == 0:
            out[key] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), arr, arr.shape)
            continue
        spec = ["data"] + [None] * (arr.ndim - 1)
        if key in event_keys and arr.ndim >= 2:
            spec[1] = "event"
        sharding = NamedSharding(mesh, P(*spec))
        global_shape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
        out[key] = jax.make_array_from_process_local_data(
            sharding, arr, global_shape)
    return out
