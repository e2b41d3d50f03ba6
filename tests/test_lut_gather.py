"""Banded Pallas LUT gather vs plain indexing (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionpriorcmax_tpu.ops.pallas.lut_gather import lut_gather_sorted


@pytest.mark.parametrize("spread", [2, 200])
def test_lut_gather_sorted_matches_indexing(rng, spread):
    """spread=2 keeps sub-blocks in a 32-row band; spread=200 forces the
    full-height fallback branch."""
    b, r, wq, c, m = 2, 480, 160, 2, 3000
    lut = rng.normal(size=(b, r, wq, c)).astype(np.float32)
    base = np.sort(rng.integers(0, r - spread, (b, m)), axis=1)
    rows = base + rng.integers(0, spread, (b, m))
    rows = np.clip(rows, 0, r - 1).astype(np.int32)
    cols = rng.integers(0, wq, (b, m)).astype(np.int32)

    want = np.stack([lut[i, rows[i], cols[i]] for i in range(b)])
    got = np.asarray(lut_gather_sorted(jnp.asarray(lut), jnp.asarray(rows),
                                       jnp.asarray(cols), interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lut_gather_sorted_nonmultiple_m(rng):
    b, r, wq, c, m = 1, 64, 32, 4, 777
    lut = rng.normal(size=(b, r, wq, c)).astype(np.float32)
    rows = np.sort(rng.integers(0, r, (b, m)), axis=1).astype(np.int32)
    cols = rng.integers(0, wq, (b, m)).astype(np.int32)
    want = lut[0, rows[0], cols[0]][None]
    got = np.asarray(lut_gather_sorted(jnp.asarray(lut), jnp.asarray(rows),
                                       jnp.asarray(cols), interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_focus_loss_pallas_gather_matches(rng):
    """focus_loss with lut_gather_impl='pallas' (sorted) == default path."""
    import dataclasses

    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.losses import focus_loss
    from tests.test_focus_loss import (H, W, NBINS, make_cfg,
                                       make_translating_events,
                                       trajectories_for_flow)

    cfg = make_cfg(smooth_weight=0.01)
    ev = make_translating_events(rng, m=512)
    times = jnp.concatenate([jnp.asarray([0.4]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (2.0, 1.0))
    ev_sorted, ends = lut_cell_sort(ev[0], (H, W), NBINS,
                                    cfg.lut_superpixel_size)
    ev_sorted = jnp.asarray(ev_sorted[None])
    ends = jnp.asarray(ends[None])
    cfg_pal = dataclasses.replace(cfg, lut_gather_impl="pallas")

    l_ref, g_ref = jax.value_and_grad(
        lambda t: focus_loss(cfg, t, times, ev_sorted, cell_ends=ends)[0])(traj)
    l_pal, g_pal = jax.value_and_grad(
        lambda t: focus_loss(cfg_pal, t, times, ev_sorted,
                             cell_ends=ends)[0])(traj)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-4)


def test_segment_sum_sorted_pallas_matches(rng):
    """grid_gather bwd_impl='sorted_pallas' (banded MXU boundary gather at
    precision=HIGHEST over the csum table) == 'sorted' gradients exactly
    (interpret mode; the HIGHEST one-hot dot has one non-zero per column,
    so gathered values carry no rounding)."""
    from motionpriorcmax_tpu.ops import events as ev_ops

    b, r, x, c, m = 2, 60, 32, 2, 5000
    grid = rng.normal(size=(b, r, x, c)).astype(np.float32)
    flat = np.sort(rng.integers(0, r * x, (b, m)), axis=1).astype(np.int32)
    rows = (flat // x).astype(np.int32)
    cols = (flat % x).astype(np.int32)
    ends = np.stack([np.searchsorted(flat[i], np.arange(r * x), "right")
                     for i in range(b)]).astype(np.int32)

    def loss(g, impl):
        out = ev_ops.grid_gather(jnp.asarray(g), jnp.asarray(rows),
                                 jnp.asarray(cols), impl, jnp.asarray(ends))
        return jnp.sum(out ** 2)

    g_sorted = np.asarray(jax.grad(lambda g: loss(g, "sorted"))(grid))
    g_pallas = np.asarray(jax.grad(lambda g: loss(g, "sorted_pallas"))(grid))
    np.testing.assert_allclose(g_pallas, g_sorted, rtol=1e-6, atol=1e-5)
