"""Sorted scatter-add vs direct scatter: values, OOB handling, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from motionpriorcmax_tpu.ops.scatter import (scatter_add_1d,
                                             scatter_add_direct)


def test_matches_direct(rng):
    n, m = 100, 5000
    idx = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=m).astype(np.float32))
    got = scatter_add_1d(n, idx, vals)
    want = scatter_add_direct(n, idx, vals)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_out_of_range_dropped(rng):
    idx = jnp.asarray(np.array([0, 5, -1, 10, 3], np.int32))
    vals = jnp.ones((5,), jnp.float32)
    got = np.asarray(scatter_add_1d(10, idx, vals))
    assert got[0] == 1 and got[5] == 1 and got[3] == 1
    assert got.sum() == 3  # -1 and 10 dropped


def test_heavy_collisions():
    idx = jnp.zeros((1000,), jnp.int32)
    vals = jnp.ones((1000,), jnp.float32)
    got = np.asarray(scatter_add_1d(4, idx, vals))
    assert got[0] == 1000 and got[1:].sum() == 0


def test_gradient_is_gather(rng):
    n, m = 50, 300
    idx = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=m).astype(np.float32))
    w = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def f(v):
        return jnp.sum(scatter_add_1d(n, idx, v) * w)

    g = jax.grad(f)(vals)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w)[np.asarray(idx)],
                               atol=1e-5)


def test_jit_and_vmap(rng):
    n, m = 64, 512
    idx = jnp.asarray(rng.integers(0, n, (4, m)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(4, m)).astype(np.float32))
    f = jax.jit(jax.vmap(lambda i, v: scatter_add_1d(n, i, v)))
    got = f(idx, vals)
    for b in range(4):
        want = scatter_add_direct(n, idx[b], vals[b])
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   atol=1e-3)
