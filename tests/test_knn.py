"""KNN correctness vs brute-force numpy (PyKeOps argKmin/Kmin replacement)."""

import numpy as np
import jax.numpy as jnp

from motionpriorcmax_tpu.ops.knn import knn_blocked, knn_batched


def brute_knn(q, db, k, norm):
    if norm == "l2":
        d = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    else:
        d = np.abs(q[:, None, :] - db[None, :, :]).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


def test_knn_l2_exact(rng):
    q = rng.normal(size=(97, 2)).astype(np.float32) * 10
    db = rng.normal(size=(55, 2)).astype(np.float32) * 10
    idx, dist = knn_blocked(jnp.asarray(q), jnp.asarray(db), 5, norm="l2",
                            block_size=16)
    widx, wdist = brute_knn(q, db, 5, "l2")
    # Distances must match exactly (indices can differ on ties).
    np.testing.assert_allclose(np.sort(np.asarray(dist), 1), np.sort(wdist, 1),
                               atol=1e-3)
    # Spot-check the neighbor sets.
    for i in range(0, 97, 13):
        assert set(np.asarray(idx)[i].tolist()) == set(widx[i].tolist())


def test_knn_l1_exact(rng):
    q = rng.normal(size=(33, 2)).astype(np.float32)
    db = rng.normal(size=(40, 2)).astype(np.float32)
    idx, dist = knn_blocked(jnp.asarray(q), jnp.asarray(db), 3, norm="l1",
                            block_size=8)
    widx, wdist = brute_knn(q, db, 3, "l1")
    np.testing.assert_allclose(np.sort(np.asarray(dist), 1), np.sort(wdist, 1),
                               atol=1e-5)


def test_knn_block_not_dividing(rng):
    q = rng.normal(size=(10, 2)).astype(np.float32)
    db = rng.normal(size=(20, 2)).astype(np.float32)
    idx_a, _ = knn_blocked(jnp.asarray(q), jnp.asarray(db), 4, block_size=3)
    idx_b, _ = knn_blocked(jnp.asarray(q), jnp.asarray(db), 4, block_size=1024)
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))


def test_knn_batched(rng):
    q = rng.normal(size=(2, 3, 12, 2)).astype(np.float32)
    db = rng.normal(size=(2, 3, 18, 2)).astype(np.float32)
    idx, dist = knn_batched(jnp.asarray(q), jnp.asarray(db), 4)
    assert idx.shape == (2, 3, 12, 4)
    widx, wdist = brute_knn(q[1, 2], db[1, 2], 4, "l2")
    np.testing.assert_allclose(np.sort(np.asarray(dist[1, 2]), 1),
                               np.sort(wdist, 1), atol=1e-3)
