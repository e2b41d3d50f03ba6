"""High-throughput scatter-add for TPU.

XLA lowers a generic scatter-add with colliding indices to a serialized
update loop on TPU (~20M updates/s measured — benchmarks/components.py).
`scatter_add_sorted` replaces it with sort + segment reduction + two
UNIQUE-index scatters, which XLA parallelizes:

  1. key-value sort of (index, value)                  (vectorized bitonic)
  2. inclusive cumsum of sorted values
  3. per-segment total = csum[last] - csum[first] + val[first]
  4. scatter the two terms at unique positions (one is_last and one is_first
     per segment) with unique_indices=True

The result is bit-wise deterministic (fixed reduction order after sort).
Gradient: d out / d vals is a gather — defined via custom VJP so the
backward pass is exactly `g[idx]` (cheap), matching the direct scatter's VJP.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def scatter_add_1d(flat_size: int, idx: jnp.ndarray, vals: jnp.ndarray
                   ) -> jnp.ndarray:
    """out[j] = sum over i with idx[i] == j of vals[i].

    idx: [M] int32 in [0, flat_size) — out-of-range entries are dropped.
    vals: [M] float.
    """
    return _scatter_add_sorted(flat_size, idx, vals)


def _scatter_add_sorted(flat_size: int, idx: jnp.ndarray, vals: jnp.ndarray
                        ) -> jnp.ndarray:
    m = idx.shape[0]
    # Route out-of-range indices to a sentinel that sorts last and is dropped.
    oob = (idx < 0) | (idx >= flat_size)
    key = jnp.where(oob, flat_size, idx).astype(jnp.int32)
    key_s, val_s = jax.lax.sort((key, vals.astype(jnp.float32)), num_keys=1)

    csum = jnp.cumsum(val_s)
    nxt = jnp.concatenate([key_s[1:], jnp.full((1,), -1, key_s.dtype)])
    prv = jnp.concatenate([jnp.full((1,), -1, key_s.dtype), key_s[:-1]])
    is_last = key_s != nxt
    is_first = key_s != prv

    out = jnp.zeros((flat_size,), jnp.float32)
    drop = jnp.int32(flat_size)  # mode='drop' sentinel
    last_idx = jnp.where(is_last & (key_s < flat_size), key_s, drop)
    first_idx = jnp.where(is_first & (key_s < flat_size), key_s, drop)
    out = out.at[last_idx].add(csum, mode="drop", unique_indices=True)
    out = out.at[first_idx].add(val_s - csum, mode="drop",
                                unique_indices=True)
    return out


def _fwd(flat_size, idx, vals):
    return _scatter_add_sorted(flat_size, idx, vals), idx


def _bwd(flat_size, idx, g):
    # d/d vals = g gathered at idx (zero for dropped entries).
    oob = (idx < 0) | (idx >= flat_size)
    safe = jnp.where(oob, 0, idx)
    gv = jnp.where(oob, 0.0, g[safe])
    return None, gv


scatter_add_1d.defvjp(_fwd, _bwd)


def scatter_add_direct(flat_size: int, idx: jnp.ndarray, vals: jnp.ndarray
                       ) -> jnp.ndarray:
    """Plain XLA scatter-add (serialized on TPU) — the baseline path."""
    out = jnp.zeros((flat_size,), jnp.float32)
    safe = jnp.clip(idx, 0, flat_size - 1)
    keep = ((idx >= 0) & (idx < flat_size)).astype(vals.dtype)
    return out.at[safe].add(vals * keep, mode="drop")
