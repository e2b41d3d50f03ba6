"""Device mesh + sharding helpers.

Replaces the reference's implicit Lightning-DDP layer
(scripts/flow_training.py:125-128; SURVEY.md §2.2-2.3) with an explicit
`Mesh(('data', 'event'))`:

  * parameters / optimizer state: fully replicated
  * batch tensors with a leading batch dim: sharded over 'data'
  * event tensors [B, M, 6]: sharded over ('data', 'event') — each chip holds
    an event shard, scatter-adds its partial IWE, and XLA psums the overlap
  * gradient all-reduce: inserted automatically by the SPMD partitioner
    (the NCCL all-reduce analog)

Multi-host: call `jax.distributed.initialize()` before `make_mesh`; the mesh
spans all processes' devices and data loading stays host-local.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, event: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'event') mesh over the available devices.

    Args:
      data: size of the data axis (defaults to n_devices // event).
      event: size of the event axis (1 = no event-axis sharding).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % event == 0, (n, event)
        data = n // event
    assert data * event <= n, (data, event, n)
    dev_array = np.asarray(devices[: data * event]).reshape(data, event)
    return Mesh(dev_array, ("data", "event"))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, ndim: int, event_axis: Optional[int] = None) -> NamedSharding:
    """NamedSharding for a batch tensor: dim 0 over 'data', optionally one dim
    over 'event'."""
    spec = ["data"] + [None] * (ndim - 1)
    if event_axis is not None:
        spec[event_axis] = "event"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a host batch dict on the mesh.

    'events' (and pos/neg event arrays) shard over ('data', 'event');
    other arrays with a batch dim shard over 'data'; scalars replicate.
    """
    out = {}
    for key, val in batch.items():
        if isinstance(val, (int, float)):
            out[key] = val
            continue
        arr = np.asarray(val)
        if arr.dtype.kind in ("U", "S", "O"):
            # Host-only metadata (sample names etc.) — not device data.
            continue
        if arr.ndim == 0:
            out[key] = jax.device_put(arr, NamedSharding(mesh, P()))
        elif key in ("events", "pos_events", "neg_events") and arr.ndim >= 2:
            out[key] = jax.device_put(arr, batch_sharding(mesh, arr.ndim, event_axis=1))
        else:
            out[key] = jax.device_put(arr, batch_sharding(mesh, arr.ndim))
    return out


def make_sharded_train_step(train_step_fn, mesh: Mesh, donate_state: bool = True):
    """jit-compile a train step with mesh shardings.

    The state is replicated, the batch arrives pre-sharded (shard_batch), and
    XLA emits the gradient psum over 'data'/'event' — no hand-written
    collectives (SURVEY.md §2.3 TPU-native equivalent).
    """
    state_sharding = NamedSharding(mesh, P())

    return jax.jit(
        train_step_fn,
        in_shardings=(state_sharding, None, None),
        out_shardings=(state_sharding, None),
        donate_argnums=(0,) if donate_state else (),
    )
