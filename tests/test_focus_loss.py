"""FocusLoss behavioral tests on a synthetic translating scene.

SURVEY.md §4 test plan item (4): warping events with the *true* flow must
produce a sharper IWE (lower focus loss) than zero flow, and gradients must
flow back to the trajectory coefficients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionpriorcmax_tpu.losses import FocusLossConfig, focus_loss, get_reconstruction_times


H, W = 32, 48
NBINS = 5


def make_translating_events(rng, flow_yx=(4.0, 6.0), n_lines=6, m=512):
    """Events from a few bright vertical/horizontal edges translating with a
    constant flow over t in [0, 1].  Returns [1, m, 6] (y, x, t, p, bin, valid)."""
    fy, fx = flow_yx
    base_y = rng.uniform(4, H - 12, n_lines)
    base_x = rng.uniform(4, W - 12, n_lines)
    ts = rng.uniform(0, 1, m)
    which = rng.integers(0, n_lines, m)
    jitter = rng.uniform(-0.5, 0.5, (m, 2))
    y = base_y[which] + fy * ts + jitter[:, 0]
    x = base_x[which] + fx * ts + jitter[:, 1]
    p = rng.integers(0, 2, m).astype(np.float32)
    bins = np.clip((ts * NBINS).astype(np.int32), 0, NBINS - 1)
    ev = np.stack([y, x, ts, p, bins, np.ones(m)], axis=-1).astype(np.float32)
    return ev[None]


def make_cfg(**kw):
    defaults = dict(
        image_shape=(H, W), num_tref=1, num_bins=NBINS, num_knn=4,
        smooth_weight=0.0, lut_superpixel_size=4, focus_loss_norm="l1",
        dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
        polarity_aware_batching=False, interpolation_scheme="mean",
        smooth_type="on_flow_to_tref", knn_block_size=64,
    )
    defaults.update(kw)
    return FocusLossConfig(**defaults)


def trajectories_for_flow(times, flow_yx, tile=4):
    """Absolute trajectory positions for constant flow: pos(t) = anchor + f*t."""
    from motionpriorcmax_tpu.ops.grids import tile_mask_positions

    pos = tile_mask_positions((H, W), tile).astype(np.float32)  # [N, 2]
    f = np.asarray(flow_yx, dtype=np.float32)
    t = np.asarray(times)[:, None, None]  # [T, 1, 1]
    traj = pos[None] + f[None, None] * t  # [T, N, 2]
    return jnp.asarray(traj[None])  # [1, T, N, 2]


def test_reconstruction_times_layout():
    cfg = make_cfg()
    times = get_reconstruction_times(cfg, jax.random.PRNGKey(0))
    assert times.shape == (1 + NBINS,)
    mids = np.asarray(times[1:])
    want = (np.linspace(0, 1, NBINS + 1)[:-1] + np.linspace(0, 1, NBINS + 1)[1:]) / 2
    np.testing.assert_allclose(mids, want, atol=1e-6)
    assert 0.0 <= float(times[0]) < 1.0


def test_true_flow_sharper_than_zero_flow(rng):
    cfg = make_cfg()
    flow = (5.0, 7.0)
    events = jnp.asarray(make_translating_events(rng, flow))
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])

    # Trajectories follow pos(t) = anchor + f * t; warping to t_ref then
    # collapses all events of an edge onto one line -> sharp IWE.
    traj_true = trajectories_for_flow(np.asarray(times), flow)
    traj_zero = trajectories_for_flow(np.asarray(times), (0.0, 0.0))

    loss_true, logs_true, misc = focus_loss(cfg, traj_true, times, events)
    loss_zero, logs_zero, _ = focus_loss(cfg, traj_zero, times, events)
    assert float(loss_true) < float(loss_zero), (
        f"true-flow loss {float(loss_true)} !< zero-flow loss {float(loss_zero)}")
    assert misc["iwes"].shape == (1, 1, H, W)


def test_gradients_flow_to_trajectories(rng):
    cfg = make_cfg(smooth_weight=0.01)
    events = jnp.asarray(make_translating_events(rng))
    times = jnp.concatenate([jnp.asarray([0.3]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (2.0, 3.0))

    def f(t):
        return focus_loss(cfg, t, times, events)[0]

    g = jax.grad(f)(traj)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_polarity_aware_batching(rng):
    cfg = make_cfg(polarity_aware_batching=True)
    ev = make_translating_events(rng)
    # Pack positives first (collate contract).
    order = np.argsort(-ev[0, :, 3], kind="stable")
    ev = ev[:, order]
    num_pos = int((ev[0, :, 3] > 0).sum())
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (1.0, 1.0))
    loss, logs, misc = focus_loss(cfg, traj, times, jnp.asarray(ev),
                                  num_pos_events=num_pos)
    assert misc["iwes"].shape == (1, 1, 2, H, W)
    assert np.isfinite(float(loss))


def test_padding_events_do_not_contribute(rng):
    cfg = make_cfg()
    ev = make_translating_events(rng, m=256)
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (2.0, 2.0))
    loss_a, _, misc_a = focus_loss(cfg, traj, times, jnp.asarray(ev))

    # Append garbage padding rows with valid=0: IWEs must be identical.
    pad = np.zeros((1, 64, 6), dtype=np.float32)
    pad[..., 0] = 11.0; pad[..., 1] = 22.0; pad[..., 5] = 0.0
    ev_padded = np.concatenate([ev, pad], axis=1)
    loss_b, _, misc_b = focus_loss(cfg, traj, times, jnp.asarray(ev_padded))
    np.testing.assert_allclose(np.asarray(misc_a["iwes"]),
                               np.asarray(misc_b["iwes"]), atol=1e-5)
    assert np.isclose(float(loss_a), float(loss_b), atol=1e-5)


def test_smoothness_constant_below_random(rng):
    """Constant flow is smoother than random flow.  (The absolute value is
    NOT ~0: the reference Sobel uses zero padding — src/utils/loss.py:84-85 —
    so a constant field still has border response, which we replicate.)"""
    cfg = make_cfg(smooth_weight=1.0)
    events = jnp.asarray(make_translating_events(rng))
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj_const = trajectories_for_flow(np.asarray(times), (3.0, 4.0))
    _, logs_const, _ = focus_loss(cfg, traj_const, times, events)

    noise = jnp.asarray(rng.normal(size=traj_const.shape).astype(np.float32)) * 5.0
    _, logs_rand, _ = focus_loss(cfg, traj_const + noise, times, events)
    assert (float(logs_const["smoothness_loss"])
            < float(logs_rand["smoothness_loss"]))


def test_iwd_interpolation_scheme(rng):
    cfg = make_cfg(interpolation_scheme="iwd")
    events = jnp.asarray(make_translating_events(rng))
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (2.0, 1.0))
    loss, _, _ = focus_loss(cfg, traj, times, events)
    assert np.isfinite(float(loss))


def test_focus_loss_epsilon_guards_empty_window(rng):
    """All-invalid events -> zero IWE -> inf loss in the reference
    (src/utils/loss.py:12, replicated at epsilon=0); focus_loss_epsilon > 0
    bounds the loss at 1/eps with finite gradients (DIVERGENCES.md item 3)."""
    ev = make_translating_events(rng, m=128)
    ev[..., 5] = 0.0  # every event padding
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (2.0, 2.0))

    loss_ref, _, _ = focus_loss(make_cfg(), traj, times, jnp.asarray(ev))
    assert np.isinf(float(loss_ref))

    cfg = make_cfg(focus_loss_epsilon=1e-3)
    loss, _, _ = focus_loss(cfg, traj, times, jnp.asarray(ev))
    np.testing.assert_allclose(float(loss), 1e3, rtol=1e-4)
    g = jax.grad(lambda t: focus_loss(cfg, t, times, jnp.asarray(ev))[0])(traj)
    assert np.isfinite(np.asarray(g)).all()

    # With real events the guard is a no-op at this magnitude.
    ev2 = jnp.asarray(make_translating_events(rng))
    l_a, _, _ = focus_loss(make_cfg(), traj, times, ev2)
    l_b, _, _ = focus_loss(cfg, traj, times, ev2)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=2e-2)


def test_matmul_iwe_grads_match_scatter(rng):
    """The production TPU IWE path (bf16 one-hot matmuls) must give the same
    descent direction as the scatter path through the WHOLE focus loss."""
    events = jnp.asarray(make_translating_events(rng, (5.0, 7.0)))
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    traj = trajectories_for_flow(np.asarray(times), (2.0, 3.0))

    def g(impl):
        cfg = make_cfg(smooth_weight=0.01, iwe_impl=impl)
        return np.asarray(jax.grad(
            lambda t: focus_loss(cfg, t, times, events)[0])(traj)).ravel()

    g_scatter = g("direct")
    g_matmul = g("matmul")          # bf16 taps, f32 accumulation
    cos = (g_scatter @ g_matmul /
           (np.linalg.norm(g_scatter) * np.linalg.norm(g_matmul) + 1e-12))
    assert cos > 0.995, cos
    loss_s = float(focus_loss(make_cfg(iwe_impl="direct"), traj, times,
                              events)[0])
    loss_m = float(focus_loss(make_cfg(iwe_impl="matmul"), traj, times,
                              events)[0])
    np.testing.assert_allclose(loss_m, loss_s, rtol=2e-2)


def test_multi_tref_linspace(rng):
    """num_tref > 1 uses linspace reference times and a multi-tref IWE stack
    (focus.py:54-55; requires dt-scaling/polarity/next-smooth disabled)."""
    cfg = make_cfg(num_tref=3, scale_iwe_by_dt=False,
                   polarity_aware_batching=False)
    events = jnp.asarray(make_translating_events(rng))
    times = get_reconstruction_times(cfg, jax.random.PRNGKey(0))
    assert times.shape == (3 + NBINS,)
    np.testing.assert_allclose(np.asarray(times[:3]), [0.0, 0.5, 1.0],
                               atol=1e-6)
    traj = trajectories_for_flow(np.asarray(times), (2.0, 1.0))
    loss, _, misc = focus_loss(cfg, traj, times, events)
    assert misc["iwes"].shape == (1, 3, H, W)
    assert np.isfinite(float(loss))


def test_cell_sorted_events_match_unsorted(rng):
    """lut_cell_sort + cell_ends (the O(M) sorted gather backward) gives the
    same loss and trajectory gradients as the unsorted default path."""
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort

    for polarity in (False, True):
        cfg = make_cfg(polarity_aware_batching=polarity, smooth_weight=0.01)
        ev = make_translating_events(rng, m=512)
        num_pos = -1
        if polarity:
            order = np.argsort(-ev[0, :, 3], kind="stable")
            ev = ev[:, order]
            num_pos = int((ev[0, :, 3] > 0).sum())
        # Mark a few rows invalid (padding) to cover the zero-weight rows.
        ev[0, -17:, 5] = 0.0
        times = jnp.concatenate([jnp.asarray([0.4]),
                                 jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
        traj = trajectories_for_flow(np.asarray(times), (2.0, 1.0))

        ev_sorted, ends = lut_cell_sort(
            ev[0], (H, W), NBINS, cfg.lut_superpixel_size,
            num_pos_events=num_pos)
        nq = (-(-H // cfg.lut_superpixel_size)) * (-(-W // cfg.lut_superpixel_size))
        assert ends.shape == ((2 if polarity else 1) * NBINS * nq,)
        assert (np.diff(ends) >= 0).all()

        def f_ref(t):
            return focus_loss(cfg, t, times, jnp.asarray(ev),
                              num_pos_events=num_pos)[0]

        def f_sorted(t):
            return focus_loss(cfg, t, times, jnp.asarray(ev_sorted[None]),
                              num_pos_events=num_pos,
                              cell_ends=jnp.asarray(ends[None]))[0]

        l_ref, g_ref = jax.value_and_grad(f_ref)(traj)
        l_sorted, g_sorted = jax.value_and_grad(f_sorted)(traj)
        np.testing.assert_allclose(float(l_sorted), float(l_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_sorted), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)


def test_cell_sorted_multi_tref(rng):
    """Sorted gather backward with num_tref > 1 (C = n_tref*2 channels)."""
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort

    cfg = make_cfg(num_tref=3, scale_iwe_by_dt=False, smooth_weight=0.01)
    ev = make_translating_events(rng, m=384)
    times = jnp.concatenate([jnp.linspace(0.0, 1.0, 3),
                             jnp.asarray((np.arange(NBINS) + 0.5) / NBINS)])
    pos = trajectories_for_flow(np.asarray(times), (2.0, 1.0))
    ev_sorted, ends = lut_cell_sort(ev[0], (H, W), NBINS,
                                    cfg.lut_superpixel_size)

    l_ref, g_ref = jax.value_and_grad(
        lambda t: focus_loss(cfg, t, times, jnp.asarray(ev))[0])(pos)
    l_s, g_s = jax.value_and_grad(
        lambda t: focus_loss(cfg, t, times, jnp.asarray(ev_sorted[None]),
                             cell_ends=jnp.asarray(ends[None]))[0])(pos)
    np.testing.assert_allclose(float(l_s), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-3)
