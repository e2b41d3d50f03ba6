"""Train step with on-device voxelization (no host 'voxel' in the batch)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from motionpriorcmax_tpu.training import create_train_state, train_step
from motionpriorcmax_tpu.training.trajectory_net import voxelize_batch_on_device
from tests.test_training import H, W, M, NBINS, make_batch, small_cfgs


def test_voxelize_batch_matches_host(rng):
    cfg, _ = small_cfgs()
    batch = make_batch(rng, batch_size=2)
    got = np.asarray(voxelize_batch_on_device(cfg, batch["events"]))
    assert got.shape == (2, NBINS, H, W)

    from motionpriorcmax_tpu.data.host_ops import (norm_voxel_grid_numpy,
                                                   voxel_grid_numpy)

    ev = np.asarray(batch["events"][0])
    t_us = (ev[:, 2] * 1e6).astype(np.int64)
    # host twin normalizes t over [t0, t1] internally; feed a window with the
    # same normalization by spanning exactly [0, 1e6] us.
    t_us[0], t_us[-1] = 0, 10**6
    want = voxel_grid_numpy(ev[:, 1], ev[:, 0], ev[:, 3],
                            np.sort(t_us), NBINS, H, W)
    # Only the structure/normalization contract is identical (event t order
    # differs after the sort) — check normalization behavior instead.
    nz = got[0][got[0] != 0]
    assert abs(nz.mean()) < 0.2 and 0.5 < nz.std() < 2.0  # mean_std applied


def test_train_step_without_host_voxel(rng):
    cfg, loss_cfg = small_cfgs()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(rng)
    del batch["voxel"]
    step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg))
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["train_losses/total"]))
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_host_voxelize_matches_device(rng):
    """voxelize_normalized_host (the loader's C++/numpy vote + clamp + norm)
    == voxelize_batch_on_device on fractional rectified coords — the two
    production voxel sources must be interchangeable (the CLI defaults to
    host; bench/tests to device)."""
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.data.host_ops import voxelize_normalized_host
    from motionpriorcmax_tpu.training import TrajectoryNetConfig
    from motionpriorcmax_tpu.training.trajectory_net import (
        voxelize_batch_on_device)

    h, w, nbins, m = 24, 32, 5, 4000
    y = rng.uniform(-1, h, m).astype(np.float32)   # incl. out-of-range
    x = rng.uniform(-1, w, m).astype(np.float32)
    t = rng.uniform(0, 1, m).astype(np.float32)
    p = rng.integers(0, 2, m).astype(np.float32)
    b = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    valid = (rng.uniform(size=m) > 0.1).astype(np.float32)
    events = np.stack([y, x, t, p, b, valid], -1).astype(np.float32)

    for norm_type, quantile in (("mean_std", 0.0), ("mean_std", 0.02),
                                ("max", 0.0), (None, 0.0)):
        cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins,
                                  voxel_norm_type=norm_type,
                                  voxel_quantile=quantile)
        dev = np.asarray(voxelize_batch_on_device(
            cfg, jnp.asarray(events[None])))[0]
        host = voxelize_normalized_host(events, nbins, h, w, norm_type,
                                        quantile)
        np.testing.assert_allclose(host, dev, atol=2e-4, rtol=2e-4)


def test_voxel_vote_pallas_sorted_matches_scatter(rng):
    """Banded Pallas voxel vote (cell-sorted events, interleaved canvas,
    col-chunked out blocks) == the XLA scatter voxelizer, including
    out-of-range coords, invalid rows, and the t0/t1 concat-seam
    fallback.  Tolerance covers the bf16 tap tiles (~0.4% of the local
    vote magnitude, same as the IWE vote kernel)."""
    import jax.numpy as jnp

    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops.events import voxel_grid_from_events
    from motionpriorcmax_tpu.ops.pallas.voxel_vote import (
        voxel_vote_pallas_sorted)

    h, w, nbins, b, m, s = 32, 160, 5, 2, 6000, 4
    y = rng.uniform(-1, h, (b, m)).astype(np.float32)
    x = rng.uniform(-1, w, (b, m)).astype(np.float32)
    t = rng.uniform(0, 1, (b, m)).astype(np.float32)
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    valid = (rng.uniform(size=(b, m)) > 0.1).astype(np.float32)
    ev = np.stack([y, x, t, p, bi, valid], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, s) for e in ev]
    ev_sorted = jnp.asarray(np.stack([q[0] for q in pairs]))

    got = np.asarray(voxel_vote_pallas_sorted(
        ev_sorted, num_bins=nbins, height=h, width=w, cell_size=s,
        band=32, interpret=True))
    evs = np.asarray(ev_sorted)
    want = np.stack([np.asarray(voxel_grid_from_events(
        jnp.asarray(evs[i, :, 0]), jnp.asarray(evs[i, :, 1]),
        jnp.asarray(evs[i, :, 2] * (nbins - 1)), jnp.asarray(evs[i, :, 3]),
        jnp.asarray(evs[i, :, 5]), num_bins=nbins, height=h, width=w))
        for i in range(b)])
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.01 * scale + 1e-4, (
        np.abs(got - want).max(), scale)


def test_voxel_vote_pallas_unsorted_still_exact(rng):
    """UNSORTED events (every sub-block on the chunked fallback) must still
    be exact — the sort only buys speed."""
    import jax.numpy as jnp

    from motionpriorcmax_tpu.ops.events import voxel_grid_from_events
    from motionpriorcmax_tpu.ops.pallas.voxel_vote import (
        voxel_vote_pallas_sorted)

    h, w, nbins, m, s = 16, 130, 3, 3000, 4
    y = rng.uniform(0, h - 1, m).astype(np.float32)
    x = rng.uniform(0, w - 1, m).astype(np.float32)
    t = rng.uniform(0, 1, m).astype(np.float32)
    p = rng.integers(0, 2, m).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    ev = np.stack([y, x, t, p, bi, np.ones(m)], -1).astype(np.float32)[None]

    got = np.asarray(voxel_vote_pallas_sorted(
        jnp.asarray(ev), num_bins=nbins, height=h, width=w, cell_size=s,
        band=16, interpret=True))[0]
    want = np.asarray(voxel_grid_from_events(
        jnp.asarray(ev[0, :, 0]), jnp.asarray(ev[0, :, 1]),
        jnp.asarray(ev[0, :, 2] * (nbins - 1)), jnp.asarray(ev[0, :, 3]),
        jnp.asarray(ev[0, :, 5]), num_bins=nbins, height=h, width=w))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.01 * scale + 1e-4
