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
    output leaves).  CAVEAT: this re-jits fn under a new trace with a
    scalar consumer, so XLA may compile a DIFFERENT program than the
    production fn (e.g. eliding the final output materialization) — for
    timing, prefer device_timer's default element sync, which times the
    original program and pays only a 4-byte transfer."""
    import jax.numpy as jnp

    @jax.jit
    def g(*args):
        tot = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(fn(*args)):
            tot = tot + jnp.sum(jnp.asarray(leaf).astype(jnp.float32))
        return tot

    return g


def _materialize_element(tree: Any) -> None:
    """Force device completion by pulling ONE element of one leaf to host.

    The [0,...,0] slice is a tiny cached jit program over the committed
    output buffer: it cannot run until the producing program finished, and
    the host transfer is 4 bytes — unlike `_materialize`, which ships the
    whole leaf over the (tunneled, slow) link (a [B, 20, 384, 512]
    upsampled-params output is ~100 MB at b6 and dominated a 3-iteration
    forward timing).  Unlike `scalarize`, the timed program is the
    unmodified production fn."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        leaf = leaves[-1]
        if hasattr(leaf, "ndim") and leaf.ndim:
            leaf = leaf[(0,) * leaf.ndim]
        np.asarray(leaf)


def device_timer(fn: Callable, *args, iters: int = 10,
                 warmup: int = 2, scalarized: bool = False,
                 sync: str = "element") -> Tuple[float, Any]:
    """Median-free simple timer: returns (seconds_per_call, last_result).

    Synchronizes via host materialization, not block_until_ready (which
    has been observed not to block on tunneled platforms).  sync modes:
      'element' (default): pull one scalar element of the last output leaf
        — times the production program, 4-byte transfer.
      'full': pull the whole last leaf — includes the output transfer once
        per timed loop (NOT per call); use when transfer is the point.
      'sum' (or scalarized=True): re-jit fn into an on-device scalar sum —
        smallest possible sync, but a DIFFERENT compiled program (see
        `scalarize`); last_result is then the f32 sum, not fn's output.
    """
    if scalarized:
        sync = "sum"
    if sync == "sum":
        fn = scalarize(fn)
        # The wrapper is a fresh jit: without a warmup call its
        # trace+compile would land inside the timed loop.
        warmup = max(warmup, 1)
    finish = _materialize if sync == "full" else _materialize_element
    out = None
    for _ in range(warmup):
        out = fn(*args)
    finish(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    finish(out)
    dt = time.perf_counter() - t0
    return dt / iters, out
