"""Profiling hooks (SURVEY.md §5.1): jax.profiler traces + named scopes +
an honest wall-clock timer for tunneled TPUs.

The reference has no profiling beyond a vestigial kwarg; here:
  * `trace(logdir)` — context manager around jax.profiler (Perfetto dump)
  * `scope(name)`   — jax.named_scope passthrough for annotating the
    warp/IWE/KNN regions in traces
  * `device_timer`  — times by materializing results to host (np.asarray),
    because `block_until_ready` has been observed not to actually block on
    experimental tunneled platforms
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax
import numpy as np

scope = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _materialize(tree: Any) -> None:
    """Force a host transfer of one leaf (guarantees device completion)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[-1])


def scalarize(fn: Callable) -> Callable:
    """Wrap fn so it returns a single on-device f32 scalar (sum of all
    output leaves).  For timing: materializing a 4-byte scalar forces
    device completion WITHOUT paying the tunnel transfer of large outputs
    (e.g. a [B, 20, 384, 512] upsampled-params tensor is ~100 MB at b6 —
    transferring it once dominated a 3-iteration forward timing)."""
    import jax.numpy as jnp

    @jax.jit
    def g(*args):
        tot = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(fn(*args)):
            tot = tot + jnp.sum(jnp.asarray(leaf).astype(jnp.float32))
        return tot

    return g


def device_timer(fn: Callable, *args, iters: int = 10,
                 warmup: int = 2, scalarized: bool = False) -> Tuple[float, Any]:
    """Median-free simple timer: returns (seconds_per_call, last_result).

    Synchronizes via host materialization, not block_until_ready.
    scalarized=True reduces the output to one f32 scalar on device first —
    pure device time, no output-transfer pollution (see `scalarize`).
    """
    if scalarized:
        fn = scalarize(fn)
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _materialize(out)
    dt = time.perf_counter() - t0
    return dt / iters, out
