"""Tests for basis evaluation, trajectory contraction, grid<->list packing."""

import numpy as np
import jax.numpy as jnp

from motionpriorcmax_tpu.ops.basis import (
    eval_basis,
    compute_trajectories,
    bernstein_basis,
)
from motionpriorcmax_tpu.ops.grids import (
    tile_mask_positions,
    coeffs_grid_to_list,
    list_to_grid,
    dense_flow_from_traj,
)


def test_polynomial_basis_values():
    t = jnp.array([0.0, 0.5, 1.0])
    b = np.asarray(eval_basis(t, 3, "polynomial"))
    want = np.stack([np.array([tt, tt**2, tt**3]) for tt in [0.0, 0.5, 1.0]])
    np.testing.assert_allclose(b, want, atol=1e-6)


def test_dct_basis_values():
    # b_k(t) = sqrt(2) cos(pi/2 (2t+1) k)  (src/utils/basis.py:18-24)
    t = np.array([0.3, 0.7])
    b = np.asarray(eval_basis(jnp.asarray(t), 2, "dct"))
    for i, tt in enumerate(t):
        for k in (1, 2):
            want = np.sqrt(2) * np.cos(np.pi / 2 * (2 * tt + 1) * k)
            assert np.isclose(b[i, k - 1], want, atol=1e-5)


def test_compute_trajectories_matches_naive(rng):
    b_, s, n, k, t_ = 2, 2, 5, 3, 4
    coeffs = rng.normal(size=(b_, s, 2, n, k)).astype(np.float32)
    basis = rng.normal(size=(t_, k)).astype(np.float32)
    got = np.asarray(compute_trajectories(jnp.asarray(coeffs), jnp.asarray(basis)))
    want = np.einsum("bsdnk,tk->btnd", coeffs, basis)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (b_, t_, n, 2)


def test_bernstein_endpoints():
    # P0 == 0 convention: flow(0) = 0, flow(1) = P_end
    # (src/models/raft_spline/curves/base.py:102-106).
    deg = 10
    b0 = np.asarray(bernstein_basis(jnp.array([0.0]), deg))
    b1 = np.asarray(bernstein_basis(jnp.array([1.0]), deg))
    np.testing.assert_allclose(b0, np.zeros((1, deg)), atol=1e-6)
    want = np.zeros((1, deg)); want[0, -1] = 1.0
    np.testing.assert_allclose(b1, want, atol=1e-6)


def test_bernstein_matches_scipy():
    from scipy import special

    deg, ts = 5, np.array([0.2, 0.5, 0.9])
    got = np.asarray(bernstein_basis(jnp.asarray(ts), deg))
    for ti, t in enumerate(ts):
        for i in range(1, deg + 1):
            want = special.binom(deg, i) * (1 - t) ** (deg - i) * t**i
            assert np.isclose(got[ti, i - 1], want, atol=1e-5)


def test_tile_mask_positions():
    pos = tile_mask_positions((8, 12), 4)
    # s = 2; active pixels at (2, 2), (2, 6), (2, 10), (6, 2), ...
    assert pos.shape == (2 * 3, 2)
    np.testing.assert_array_equal(pos[0], [2, 2])
    np.testing.assert_array_equal(pos[1], [2, 6])
    np.testing.assert_array_equal(pos[3], [6, 2])


def test_coeffs_grid_to_list_matches_mask_select(rng):
    b_, s, k, h, w = 2, 1, 2, 8, 12
    n = 4
    grid = rng.normal(size=(b_, s, 2 * k, h, w)).astype(np.float32)
    got = np.asarray(coeffs_grid_to_list(jnp.asarray(grid), n, k))
    # Naive: reference grid_to_list with tile mask then reshape/permute
    # (src/utils/trajectories.py:15-52).
    mask = np.zeros((h, w), bool); mask[2::4, 2::4] = True
    flat = grid.reshape(b_, s, 2 * k, -1)[..., mask.reshape(-1)]
    want = flat.reshape(b_, s, 2, k, -1).transpose(0, 1, 2, 4, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_list_to_grid_roundtrip(rng):
    feats = rng.normal(size=(2, 6, 3)).astype(np.float32)
    grid = np.asarray(list_to_grid(jnp.asarray(feats), (2, 3)))
    assert grid.shape == (2, 3, 2, 3)
    np.testing.assert_allclose(grid[1, :, 0, 1], feats[1, 1], atol=1e-6)


def test_dense_flow_constant_field():
    # A constant patch flow must upsample to (approximately) the same constant.
    traj_flow = jnp.ones((1, 4 * 6, 2)) * 3.0
    dense, patch = dense_flow_from_traj(traj_flow, 4, (16, 24))
    assert dense.shape == (1, 2, 16, 24)
    assert patch.shape == (1, 2, 4, 6)
    np.testing.assert_allclose(np.asarray(dense), 3.0, atol=1e-4)
