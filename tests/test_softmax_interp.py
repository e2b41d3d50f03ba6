"""Softmax (dense-kernel) interpolation vs exact KNN-mean reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import dataclasses

from motionpriorcmax_tpu.losses import FocusLossConfig, focus_loss
from tests.test_focus_loss import (H, W, NBINS, make_cfg,
                                   make_translating_events,
                                   trajectories_for_flow)


def test_softmax_close_to_exact_on_smooth_field(rng):
    cfg_exact = make_cfg()
    cfg_soft = dataclasses.replace(cfg_exact, knn_method="softmax",
                                   softmax_temp=16.0)
    flow = (4.0, 6.0)
    events = jnp.asarray(make_translating_events(rng, flow))
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), flow)

    le, _, me = focus_loss(cfg_exact, traj, times, events)
    ls, _, ms = focus_loss(cfg_soft, traj, times, events)
    # A constant flow field interpolates identically under any weighting.
    np.testing.assert_allclose(float(ls), float(le), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ms["iwes"]), np.asarray(me["iwes"]),
                               atol=1e-3)


def test_softmax_gradients_flow(rng):
    cfg = make_cfg(knn_method="softmax", smooth_weight=0.01)
    events = jnp.asarray(make_translating_events(rng))
    times = jnp.concatenate([jnp.asarray([0.3]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (2.0, 3.0))
    g = jax.grad(lambda t: focus_loss(cfg, t, times, events)[0])(traj)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_softmax_on_flow_to_next(rng):
    cfg = make_cfg(knn_method="softmax", smooth_weight=0.06,
                   smooth_type="on_flow_to_next")
    events = jnp.asarray(make_translating_events(rng))
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (1.0, 2.0))
    loss, logs, _ = focus_loss(cfg, traj, times, events)
    assert np.isfinite(float(loss))
    assert "smoothness_loss" in logs


def test_dynamic_band_matches_static(rng):
    """interp_band_dynamic (on-device max-displacement margin) must match
    the full-scan pallas path bit-close: truncation is below float noise."""
    cfg_full = make_cfg(knn_method="softmax", use_pallas_interp=True,
                        interp_band_px=0.0)
    cfg_dyn = dataclasses.replace(cfg_full, interp_band_px=80.0,
                                  interp_band_dynamic=True)
    flow = (3.0, -2.0)
    events = jnp.asarray(make_translating_events(rng, flow))
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), flow)

    def loss(cfg, t):
        return focus_loss(cfg, t, times, events)[0]

    lf, gf = jax.value_and_grad(lambda t: loss(cfg_full, t))(traj)
    ld, gd = jax.value_and_grad(lambda t: loss(cfg_dyn, t))(traj)
    np.testing.assert_allclose(float(ld), float(lf), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gf),
                               atol=1e-5, rtol=1e-4)


def test_per_group_dynamic_band_matches_static(rng):
    """interp_band_dynamic='per_group' (one on-device margin per
    (batch, bin) group) must match the full-scan pallas path bit-close —
    the truncation argument is identical per group.  Trajectories get a
    time-GROWING displacement so late bins genuinely need wider margins
    than early ones (the case the per-group band exists for)."""
    cfg_full = make_cfg(knn_method="softmax", use_pallas_interp=True,
                        interp_band_px=0.0)
    cfg_pg = dataclasses.replace(cfg_full, interp_band_px=80.0,
                                 interp_band_dynamic="per_group")
    flow = (6.0, -4.0)
    events = jnp.asarray(make_translating_events(rng, flow))
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), flow)

    def loss(cfg, t):
        return focus_loss(cfg, t, times, events)[0]

    lf, gf = jax.value_and_grad(lambda t: loss(cfg_full, t))(traj)
    lp, gp = jax.value_and_grad(lambda t: loss(cfg_pg, t))(traj)
    np.testing.assert_allclose(float(lp), float(lf), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gf),
                               atol=1e-5, rtol=1e-4)


def test_softmax_true_flow_sharper(rng):
    cfg = make_cfg(knn_method="softmax")
    flow = (5.0, 7.0)
    events = jnp.asarray(make_translating_events(rng, flow))
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    lt, _, _ = focus_loss(cfg, trajectories_for_flow(np.asarray(times), flow),
                          times, events)
    lz, _, _ = focus_loss(cfg, trajectories_for_flow(np.asarray(times), (0, 0)),
                          times, events)
    assert float(lt) < float(lz)
