"""Explicit event-sharded focus loss == unsharded loss (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionpriorcmax_tpu.losses import focus_loss
from motionpriorcmax_tpu.parallel import make_mesh
from motionpriorcmax_tpu.parallel.event_parallel import focus_loss_event_sharded
from tests.test_focus_loss import (H, W, NBINS, make_cfg,
                                   make_translating_events,
                                   trajectories_for_flow)


def _setup(rng, polarity=False):
    ev = make_translating_events(rng, (3.0, 2.0), m=512)
    num_pos = -1
    if polarity:
        order = np.argsort(-ev[0, :, 3], kind="stable")
        ev = ev[:, order]
        # Pad to static pos/neg capacities divisible by the shard count.
        pos = ev[0][ev[0, :, 3] == 1]
        neg = ev[0][ev[0, :, 3] == 0]
        cap = 320
        def pad(x):
            out = np.zeros((cap, 6), np.float32)
            out[:len(x), :] = x[:cap]
            out[:min(len(x), cap), 5] = 1
            return out
        ev = np.concatenate([pad(pos), pad(neg)])[None]
        num_pos = cap
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (3.0, 2.0))
    return jnp.asarray(ev), times, traj, num_pos


@pytest.mark.parametrize("polarity", [False, True])
def test_sharded_matches_unsharded(rng, polarity):
    cfg = make_cfg(smooth_weight=0.01, polarity_aware_batching=polarity)
    events, times, traj, num_pos = _setup(rng, polarity)
    mesh = make_mesh(data=2, event=4)

    ref_loss, ref_logs, ref_misc = focus_loss(cfg, traj, times, events,
                                              num_pos_events=num_pos)
    loss, logs, misc = jax.jit(
        lambda t, ev: focus_loss_event_sharded(cfg, t, times, ev, mesh,
                                               num_pos_events=num_pos)
    )(traj, events)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(misc["iwes"]),
                               np.asarray(ref_misc["iwes"]), atol=1e-4)


def test_sharded_gradients_match(rng):
    cfg = make_cfg(smooth_weight=0.01)
    events, times, traj, _ = _setup(rng)
    mesh = make_mesh(data=2, event=4)

    g_ref = jax.grad(lambda t: focus_loss(cfg, t, times, events)[0])(traj)
    g_sh = jax.jit(jax.grad(
        lambda t: focus_loss_event_sharded(cfg, t, times, events, mesh)[0]
    ))(traj)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-3)


def test_sharded_with_matmul_iwe(rng):
    """The TPU production IWE path (one-hot matmul vote, a lax.scan) must
    compose with shard_map event sharding: partial IWEs stay linear, so the
    psum combine is unchanged."""
    cfg = make_cfg(smooth_weight=0.01, iwe_impl="matmul")
    events, times, traj, _ = _setup(rng)
    mesh = make_mesh(data=2, event=4)

    ref_loss, _, _ = focus_loss(cfg, traj, times, events)
    loss, _, _ = jax.jit(
        lambda t, ev: focus_loss_event_sharded(cfg, t, times, ev, mesh)
    )(traj, events)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


@pytest.mark.parametrize("polarity", [False, True])
def test_sharded_cell_sorted_matches_unsharded(rng, polarity):
    """Event-sharded loss with cell-sorted events + clipped global boundaries
    equals the single-device sorted loss, values and gradients."""
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort

    cfg = make_cfg(smooth_weight=0.01, polarity_aware_batching=polarity)
    events, times, traj, num_pos = _setup(rng, polarity)
    ev_sorted, ends = lut_cell_sort(np.asarray(events[0]), (H, W), NBINS,
                                    cfg.lut_superpixel_size,
                                    num_pos_events=num_pos)
    ev_sorted = jnp.asarray(ev_sorted[None])
    ends = jnp.asarray(ends[None])
    mesh = make_mesh(data=2, event=4)

    def f_ref(t):
        return focus_loss(cfg, t, times, ev_sorted, num_pos_events=num_pos,
                          cell_ends=ends)[0]

    def f_shard(t):
        return focus_loss_event_sharded(cfg, t, times, ev_sorted, mesh,
                                        num_pos_events=num_pos,
                                        cell_ends=ends)[0]

    l_ref, g_ref = jax.value_and_grad(f_ref)(traj)
    l_sh, g_sh = jax.jit(jax.value_and_grad(f_shard))(traj)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-3)
