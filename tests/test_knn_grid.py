"""Grid-hash windowed KNN: must match dense exact KNN when coverage holds."""

import jax.numpy as jnp
import numpy as np

from motionpriorcmax_tpu.ops.knn import knn_blocked, knn_grid_window


def grid_queries(gh, gw, s):
    mid = s / 2 - 0.5
    ys = np.arange(gh) * s + mid
    xs = np.arange(gw) * s + mid
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gy.reshape(-1), gx.reshape(-1)], -1).astype(np.float32)


def test_grid_knn_matches_dense(rng):
    gh, gw, s = 16, 20, 4.0
    q = grid_queries(gh, gw, s)
    # DB: one point per tile jittered by <= 6 px (within window coverage).
    base = grid_queries(gh, gw, s)
    db = base + rng.uniform(-6, 6, base.shape).astype(np.float32)
    db = np.clip(db, 0, [gh * s - 1e-3, gw * s - 1e-3]).astype(np.float32)

    k = 8
    idx_d, dist_d = knn_blocked(jnp.asarray(q), jnp.asarray(db), k,
                                block_size=64)
    idx_g, dist_g = knn_grid_window(jnp.asarray(q), jnp.asarray(db), k,
                                    cell_size=s, grid_hw=(gh, gw),
                                    window_radius=4, cell_capacity=8)
    # Same neighbor sets (distances identical up to ordering of ties).
    np.testing.assert_allclose(np.sort(np.asarray(dist_g), -1),
                               np.sort(np.asarray(dist_d), -1), atol=5e-3)
    same = [set(np.asarray(idx_g)[i].tolist()) == set(np.asarray(idx_d)[i].tolist())
            for i in range(0, q.shape[0], 37)]
    assert np.mean(same) > 0.98


def test_grid_knn_sparse_region_inf():
    # All db points in one corner: distant queries run out of candidates and
    # get +inf distances, not garbage.
    gh, gw, s = 8, 8, 4.0
    q = grid_queries(gh, gw, s)
    db = np.asarray([[1.0, 1.0], [2.0, 2.0], [3.0, 1.0]], np.float32)
    idx, dist = knn_grid_window(jnp.asarray(q), jnp.asarray(db), 4,
                                cell_size=s, grid_hw=(gh, gw),
                                window_radius=2, cell_capacity=4)
    far = np.asarray(dist)[-1]  # bottom-right query, far from all points
    assert np.isinf(far).all()
    near = np.asarray(dist)[0]  # top-left query sees all 3 points
    assert np.isfinite(near[:3]).all() and np.isinf(near[3])


def test_grid_knn_capacity_overflow():
    # More points in a cell than capacity: extra points dropped, no crash.
    gh, gw, s = 4, 4, 4.0
    q = grid_queries(gh, gw, s)
    db = np.full((20, 2), 2.0, np.float32)  # all in cell (0, 0)
    idx, dist = knn_grid_window(jnp.asarray(q), jnp.asarray(db), 4,
                                cell_size=s, grid_hw=(gh, gw),
                                window_radius=1, cell_capacity=4)
    assert np.isfinite(np.asarray(dist)[0]).sum() == 4
