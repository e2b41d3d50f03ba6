"""Pallas corr-window kernel vs the one-hot einsum oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _numpy_windows(corr, rows0, cols0, win):
    n, h2, w2 = corr.shape
    out = np.zeros((n, win, win), np.float32)
    for m in range(n):
        for i in range(win):
            for j in range(win):
                y, x = rows0[m] + i, cols0[m] + j
                if 0 <= y < h2 and 0 <= x < w2:
                    out[m, i, j] = corr[m, y, x]
    return out


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_corr_window_matches_numpy(rng, dtype):
    from motionpriorcmax_tpu.ops.pallas.corr_window import corr_window_pallas

    n, h2, w2, win = 9, 7, 11, 4
    corr = rng.normal(size=(n, h2, w2)).astype(np.float32)
    corrj = jnp.asarray(corr).astype(dtype)
    # Origins including out-of-range (negative and beyond the map).
    rows0 = rng.integers(-3, h2 + 2, n).astype(np.int32)
    cols0 = rng.integers(-3, w2 + 2, n).astype(np.int32)

    got = np.asarray(corr_window_pallas(corrj, jnp.asarray(rows0),
                                        jnp.asarray(cols0), win, True))
    want = _numpy_windows(np.asarray(corrj, np.float32), rows0, cols0, win)
    np.testing.assert_array_equal(got, want)  # pure selection: exact


def test_corr_window_gradient_matches_einsum(rng):
    """d corr through the kernel == the einsum path's d corr (selection
    scatter), including out-of-range taps dropping their cotangent."""
    from motionpriorcmax_tpu.ops.pallas.corr_window import corr_window_pallas

    n, h2, w2, win = 6, 8, 10, 4
    corr = jnp.asarray(rng.normal(size=(n, h2, w2)).astype(np.float32))
    rows0 = jnp.asarray(rng.integers(-2, h2, n).astype(np.int32))
    cols0 = jnp.asarray(rng.integers(-2, w2, n).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(n, win, win)).astype(np.float32))

    def loss_kernel(c):
        return jnp.sum(corr_window_pallas(c, rows0, cols0, win, True) * cot)

    def loss_oracle(c):
        offs = jnp.arange(win, dtype=jnp.int32)
        rows = rows0[:, None] + offs[None, :]
        cols = cols0[:, None] + offs[None, :]
        h_oh = ((rows[:, :, None] == jnp.arange(h2))
                & (rows >= 0)[:, :, None] & (rows < h2)[:, :, None]
                ).astype(c.dtype)
        w_oh = ((cols[:, None, :] == jnp.arange(w2)[:, None])
                & (cols >= 0)[:, None, :] & (cols < w2)[:, None, :]
                ).astype(c.dtype)
        band = jnp.einsum("nih,nhw->niw", h_oh, c)
        return jnp.sum(jnp.einsum("niw,nwj->nij", band, w_oh) * cot)

    g_kernel = jax.grad(loss_kernel)(corr)
    g_oracle = jax.grad(loss_oracle)(corr)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_oracle),
                               atol=1e-6)


def test_window_lookup_pallas_impl_matches_einsum(rng):
    """Full lookup path parity: _window_lookup impl='pallas' (interpret) vs
    impl='einsum' — values and coords gradients (fractional weights)."""
    from motionpriorcmax_tpu.models.raft_spline.corr import _window_lookup

    n, h2, w2, r = 12, 9, 13, 2
    corr = jnp.asarray(rng.normal(size=(n, h2, w2)).astype(np.float32))
    cx = jnp.asarray(rng.uniform(-1, w2, n).astype(np.float32))
    cy = jnp.asarray(rng.uniform(-1, h2, n).astype(np.float32))

    def run(impl, c, x, y):
        return _window_lookup(c, x, y, r, impl)

    got = run("pallas", corr, cx, cy)
    want = run("einsum", corr, cx, cy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def s(impl):
        return lambda c, x, y: jnp.sum(run(impl, c, x, y) ** 2)

    gp = jax.grad(s("pallas"), argnums=(0, 1, 2))(corr, cx, cy)
    ge = jax.grad(s("einsum"), argnums=(0, 1, 2))(corr, cx, cy)
    for a, b in zip(gp, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_window_lookup_blocked_matches_einsum(rng):
    """impl='einsum_blocked' (block-diagonal dense matmuls) parity vs the
    per-map einsum path — values and all gradients, N not a multiple of
    the block size to exercise the padding path."""
    from motionpriorcmax_tpu.models.raft_spline.corr import _window_lookup

    n, h2, w2, r = 13, 9, 13, 2
    corr = jnp.asarray(rng.normal(size=(n, h2, w2)).astype(np.float32))
    cx = jnp.asarray(rng.uniform(-1, w2, n).astype(np.float32))
    cy = jnp.asarray(rng.uniform(-1, h2, n).astype(np.float32))

    got = _window_lookup(corr, cx, cy, r, "einsum_blocked")
    want = _window_lookup(corr, cx, cy, r, "einsum")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def s(impl):
        return lambda c, x, y: jnp.sum(
            _window_lookup(c, x, y, r, impl) ** 2)

    gb = jax.grad(s("einsum_blocked"), argnums=(0, 1, 2))(corr, cx, cy)
    ge = jax.grad(s("einsum"), argnums=(0, 1, 2))(corr, cx, cy)
    for a, b in zip(gb, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_corr_window_pads_nonmultiple_maps(rng):
    """N not a multiple of the program block still works (padding path)."""
    from motionpriorcmax_tpu.ops.pallas.corr_window import corr_window_pallas

    n, h2, w2, win = 3, 6, 8, 4
    corr = rng.normal(size=(n, h2, w2)).astype(np.float32)
    rows0 = rng.integers(0, h2 - win, n).astype(np.int32)
    cols0 = rng.integers(0, w2 - win, n).astype(np.int32)
    got = np.asarray(corr_window_pallas(
        jnp.asarray(corr), jnp.asarray(rows0), jnp.asarray(cols0), win, True))
    want = _numpy_windows(corr, rows0, cols0, win)
    np.testing.assert_array_equal(got, want)
