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
    method: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K nearest database points for each query point.

    Args:
      queries: [Q, D] query coordinates.
      database: [N, D] database coordinates.
      k: number of neighbors.
      norm: 'l2' (squared euclidean, reference default) or 'l1'.
      block_size: queries per block (VMEM working set = block_size * N floats).
      method: 'exact' (lax.top_k, sort-based — bit-equivalent to KeOps
        argKmin) or 'approx' (lax.approx_min_k — the TPU-native partial
        reduction, ~0.95 recall, far cheaper than the full sort).

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
        if method == "approx":
            nd, idx = jax.lax.approx_min_k(dist, k)
            idx = idx.astype(jnp.int32)
        else:
            neg_top, idx = jax.lax.top_k(-dist, k)
            idx, nd = idx.astype(jnp.int32), -neg_top
        if norm == "l2":
            # Ranking used the MXU-friendly expanded form |q|^2-2q.db+|db|^2,
            # which cancels catastrophically for near neighbors (abs error
            # ~|q|^2 * eps).  Refine the K selected distances by direct
            # subtraction so downstream 1/(d+eps) IWD weights match the
            # reference's Kmin values (focus.py:159).
            diffs = qb[:, None, :] - database[idx]
            nd = jnp.sum(diffs * diffs, axis=-1)
        return idx, nd

    idx, dist = jax.lax.map(one_block, blocks)
    idx = idx.reshape(q_pad, k)[:q]
    dist = dist.reshape(q_pad, k)[:q]
    return idx, dist


def knn_grid_window(
    queries: jnp.ndarray,
    database: jnp.ndarray,
    k: int,
    *,
    norm: str = "l2",
    cell_size: float = 4.0,
    grid_hw: Tuple[int, int] = (120, 160),
    window_radius: int = 8,
    cell_capacity: int = 8,
    method: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spatial-hash KNN: exact within a (2R+1)^2-cell window around each query.

    Exploits the FocusLoss structure (focus.py:115-137): queries are the
    regular superpixel grid and database points are tile trajectories whose
    displacement is bounded (DSEC caps flow at 60 px), so the true neighbors
    live in a local window.  Candidates drop from N (~19200) to
    (2R+1)^2 * capacity (~2312 at R=8, C=8) — an order of magnitude less
    distance + top-k work than the dense reduction.

    Database points are binned into grid cells (capacity-limited, overflow
    dropped), and each query searches the clipped window around its own cell.
    With R*cell_size >= the max displacement this returns the exact KNN; a
    sparser-than-capacity region or larger displacement degrades gracefully
    (missing candidates get +inf distance).

    Args:
      queries: [Q, 2] (y, x) — MUST be the row-major cell-center grid of
        shape grid_hw (one query per cell).
      database: [N, 2].
    Returns:
      (indices [Q, K] int32, distances [Q, K]); slots beyond the available
      candidates have distance +inf and index 0.
    """
    gh, gw = grid_hw
    q = queries.shape[0]
    n = database.shape[0]
    assert q == gh * gw, (q, gh, gw)
    c = cell_capacity
    r = window_radius

    cy = jnp.clip(jnp.floor(database[:, 0] / cell_size), 0, gh - 1)
    cx = jnp.clip(jnp.floor(database[:, 1] / cell_size), 0, gw - 1)
    cell = (cy * gw + cx).astype(jnp.int32)

    order = jnp.argsort(cell)
    cell_s = cell[order]
    # Rank within cell: position minus first occurrence (sorted array).
    rank = jnp.arange(n, dtype=jnp.int32) - jnp.searchsorted(
        cell_s, cell_s, side="left").astype(jnp.int32)
    # Cell table of database indices; overflow beyond capacity dropped.
    table = jnp.full((gh * gw, c), -1, jnp.int32)
    valid = rank < c
    # Route capacity-overflow entries to an out-of-range row so mode='drop'
    # discards them (clipping would clobber the last valid slot).
    table = table.at[jnp.where(valid, cell_s, gh * gw),
                     jnp.clip(rank, 0, c - 1)].set(
        order.astype(jnp.int32), mode="drop")
    table = table.reshape(gh, gw, c)

    # Window gather: pad the table with -1 borders, then take (2R+1)^2
    # shifted views -> [gh, gw, W2, C] candidate indices.
    padded = jnp.pad(table, ((r, r), (r, r), (0, 0)), constant_values=-1)
    views = [padded[dy:dy + gh, dx:dx + gw]
             for dy in range(2 * r + 1) for dx in range(2 * r + 1)]
    cand = jnp.stack(views, axis=2).reshape(q, (2 * r + 1) ** 2 * c)

    cand_valid = cand >= 0
    cand_idx = jnp.where(cand_valid, cand, 0)
    pts = database[cand_idx]                       # [Q, W2C, 2]
    diff = pts - queries[:, None, :]
    if norm == "l2":
        dist = jnp.sum(diff * diff, axis=-1)
    elif norm == "l1":
        dist = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        raise ValueError(norm)
    dist = jnp.where(cand_valid, dist, jnp.inf)

    if method == "approx":
        nd, pos = jax.lax.approx_min_k(dist, k)
    else:
        neg, pos = jax.lax.top_k(-dist, k)
        nd = -neg
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    return idx.astype(jnp.int32), nd


def knn_batched(
    queries: jnp.ndarray,
    database: jnp.ndarray,
    k: int,
    *,
    norm: str = "l2",
    block_size: int = 1024,
    method: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KNN with leading batch dims: queries [..., Q, D], database [..., N, D]."""
    batch_shape = queries.shape[:-2]
    assert database.shape[:-2] == batch_shape
    fq = queries.reshape((-1,) + queries.shape[-2:])
    fd = database.reshape((-1,) + database.shape[-2:])
    idx, dist = jax.vmap(
        lambda a, b: knn_blocked(a, b, k, norm=norm, block_size=block_size,
                                 method=method)
    )(fq, fd)
    return (idx.reshape(batch_shape + idx.shape[-2:]),
            dist.reshape(batch_shape + dist.shape[-2:]))
