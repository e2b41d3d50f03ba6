"""Blocked K-nearest-neighbor search on TPU.

Replaces the reference's PyKeOps `LazyTensor.argKmin`/`Kmin` CUDA kernels
(src/losses/focus.py:129-137, 159) — the FocusLoss hot kernel (SURVEY.md §2.4
N1).  KeOps reduces a symbolic [Q, N] distance matrix without materializing
it; on TPU we tile the query axis into VMEM-sized chunks, compute each
[chunk, N] distance block densely (VPU/MXU-friendly), and reduce with
`lax.top_k`.  Shapes stay static; memory is O(chunk * N) instead of O(Q * N).

A Pallas fused distance+top-k kernel can swap in behind the same signature
(see motionpriorcmax_tpu/ops/pallas/).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_dist(q: jnp.ndarray, db: jnp.ndarray, norm: str) -> jnp.ndarray:
    """[Cq, D] x [N, D] -> [Cq, N] distances (squared-l2 or l1).

    Matches the reference distance definitions (focus.py:132-135): 'l2' is the
    *squared* euclidean distance (no sqrt), 'l1' the sum of absolute diffs.
    """
    if norm == "l2":
        # |q|^2 - 2 q.db + |db|^2 : the matmul rides the MXU.
        qq = jnp.sum(q * q, axis=-1, keepdims=True)          # [Cq, 1]
        dd = jnp.sum(db * db, axis=-1)[None, :]              # [1, N]
        cross = q @ db.T                                     # [Cq, N]
        return qq - 2.0 * cross + dd
    if norm == "l1":
        return jnp.sum(jnp.abs(q[:, None, :] - db[None, :, :]), axis=-1)
    raise ValueError(f"unknown dist norm {norm!r}")


def knn_blocked(
    queries: jnp.ndarray,
    database: jnp.ndarray,
    k: int,
    *,
    norm: str = "l2",
    block_size: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K nearest database points for each query point.

    Args:
      queries: [Q, D] query coordinates.
      database: [N, D] database coordinates.
      k: number of neighbors.
      norm: 'l2' (squared euclidean, reference default) or 'l1'.
      block_size: queries per block (VMEM working set = block_size * N floats).

    Returns:
      (indices [Q, K] int32, distances [Q, K] float32), nearest-first —
      equivalent to KeOps argKmin / Kmin (focus.py:137, 159).
    """
    q, d = queries.shape
    n = database.shape[0]
    assert database.shape[1] == d
    k = min(k, n)

    block = min(block_size, q)
    num_blocks = -(-q // block)
    q_pad = num_blocks * block
    if q_pad != q:
        queries = jnp.pad(queries, ((0, q_pad - q), (0, 0)))
    blocks = queries.reshape(num_blocks, block, d)

    def one_block(qb):
        dist = _pairwise_dist(qb, database, norm)
        neg_top, idx = jax.lax.top_k(-dist, k)
        return idx.astype(jnp.int32), -neg_top

    idx, dist = jax.lax.map(one_block, blocks)
    idx = idx.reshape(q_pad, k)[:q]
    dist = dist.reshape(q_pad, k)[:q]
    return idx, dist


def knn_batched(
    queries: jnp.ndarray,
    database: jnp.ndarray,
    k: int,
    *,
    norm: str = "l2",
    block_size: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN with leading batch dims: queries [..., Q, D], database [..., N, D]."""
    batch_shape = queries.shape[:-2]
    assert database.shape[:-2] == batch_shape
    fq = queries.reshape((-1,) + queries.shape[-2:])
    fd = database.reshape((-1,) + database.shape[-2:])
    idx, dist = jax.vmap(
        lambda a, b: knn_blocked(a, b, k, norm=norm, block_size=block_size)
    )(fq, fd)
    return (idx.reshape(batch_shape + idx.shape[-2:]),
            dist.reshape(batch_shape + dist.shape[-2:]))
