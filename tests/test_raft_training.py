"""RAFT-Spline validation/training step tests (tiny config) + EVIMO2 synthetic."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionpriorcmax_tpu.losses import FocusLossConfig
from motionpriorcmax_tpu.models.raft_spline import RAFTSplineConfig
from motionpriorcmax_tpu.training.raft_spline import (
    RAFTTrainConfig, create_raft_state, raft_train_step, raft_validation_step)

H, W = 32, 32


def tiny_cfg(**kw):
    defaults = dict(nbins_context=5, nbins_correlation=3, bezier_degree=2,
                    ev_target_indices=(2, 4), ev_levels=(1, 2), iters=2)
    defaults.update(kw)
    return RAFTSplineConfig(**defaults)


def test_raft_validation_step(rng):
    cfg = tiny_cfg()
    tc = RAFTTrainConfig(use_scheduler=False)
    state = create_raft_state(cfg, tc, jax.random.PRNGKey(0), (H, W))
    m = 3
    batch = {
        "ev_repr": jnp.asarray(rng.normal(size=(2, cfg.nbins_total, H, W))
                               .astype(np.float32)),
        "flow": jnp.asarray(rng.normal(size=(2, m, 2, H, W)).astype(np.float32)),
        "flow_valid": jnp.asarray(rng.uniform(size=(2, m, H, W)) > 0.3),
    }
    ts = tuple(np.linspace(0, 1, m + 1)[1:].tolist())
    logs = raft_validation_step(state, batch, cfg, ts)
    for key in ("val/epe", "val/masked_epe", "val/ev_masked_TEPE",
                "val/masked_TAE", "val/masked_T3PE", "val/epe_multi_lin",
                "val/EPE_STEP00"):
        assert key in logs, key
        assert np.isfinite(float(logs[key])), key


def test_raft_train_step_updates_params(rng):
    cfg = tiny_cfg()
    tc = RAFTTrainConfig(use_scheduler=False, learning_rate=1e-4)
    state = create_raft_state(cfg, tc, jax.random.PRNGKey(0), (H, W))
    loss_cfg = FocusLossConfig(
        image_shape=(H, W), num_tref=1, num_bins=5, num_knn=4,
        smooth_weight=0.01, lut_superpixel_size=4, focus_loss_norm="l1",
        polarity_aware_batching=False, interpolation_scheme="mean",
        knn_block_size=64)
    m_ev = 256
    y = rng.uniform(0, H - 1, (1, m_ev)); x = rng.uniform(0, W - 1, (1, m_ev))
    t = rng.uniform(0, 1, (1, m_ev))
    p = rng.integers(0, 2, (1, m_ev)).astype(np.float32)
    b = np.clip((t * 5).astype(np.int32), 0, 4)
    events = np.stack([y, x, t, p, b, np.ones((1, m_ev))], -1).astype(np.float32)
    batch = {
        "ev_repr": jnp.asarray(rng.normal(size=(1, cfg.nbins_total, H, W))
                               .astype(np.float32)),
        "events": jnp.asarray(events),
    }
    step = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                     loss_cfg=loss_cfg))
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["train_losses/total"]))
    a = jax.tree_util.tree_leaves(state.params)[0]
    bb = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(bb))


def test_raft_supervised_train_step_overfits_batch(rng):
    """Gamma-weighted supervised step (paper's MultiFlow recipe): loss is
    finite, params move, and repeating the same batch overfits (loss
    decreases)."""
    from motionpriorcmax_tpu.training.raft_spline import (
        raft_supervised_train_step)

    cfg = tiny_cfg()
    tc = RAFTTrainConfig(use_scheduler=False, learning_rate=1e-3)
    state = create_raft_state(cfg, tc, jax.random.PRNGKey(0), (H, W))
    t_steps = 3
    batch = {
        "ev_repr": jnp.asarray(rng.normal(size=(2, cfg.nbins_total, H, W))
                               .astype(np.float32)),
        "flow": jnp.asarray(np.broadcast_to(
            np.asarray([1.5, -0.5], np.float32)[None, None, :, None, None],
            (2, t_steps, 2, H, W)).copy()),
        "flow_timestamps": jnp.asarray(np.broadcast_to(
            np.linspace(0, 1, t_steps + 1)[1:].astype(np.float32),
            (2, t_steps)).copy()),
        "flow_valid": jnp.asarray(
            rng.uniform(size=(2, t_steps, H, W)) > 0.2),
    }
    step = jax.jit(functools.partial(raft_supervised_train_step, cfg=cfg))
    losses = []
    for i in range(6):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["train_losses/total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert "train_losses/l1_final" in logs


def test_raft_bf16_compute_close_to_f32(rng):
    """compute_dtype='bfloat16' (MXU conv path, f32 params/carry/heads):
    the forward stays finite and tracks the f32 forward — same params, same
    input, upsampled curve predictions within bf16 tolerance."""
    cfg32 = tiny_cfg()
    cfg16 = tiny_cfg(compute_dtype="bfloat16")
    tc = RAFTTrainConfig(use_scheduler=False)
    state = create_raft_state(cfg32, tc, jax.random.PRNGKey(0), (H, W))
    voxel = jnp.asarray(rng.normal(size=(1, cfg32.nbins_total, H, W))
                        .astype(np.float32))

    from motionpriorcmax_tpu.models.raft_spline import RAFTSpline

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # Identical param trees: the dtype knob must not change the module tree.
    _, up32 = RAFTSpline(cfg32).apply(variables, voxel, test_mode=True)
    _, up16 = RAFTSpline(cfg16).apply(variables, voxel, test_mode=True)
    assert up16.dtype == jnp.float32        # heads return f32
    assert np.isfinite(np.asarray(up16)).all()
    scale = np.abs(np.asarray(up32)).max() + 1e-3
    np.testing.assert_allclose(np.asarray(up16) / scale,
                               np.asarray(up32) / scale, atol=0.1)


def test_raft_train_step_gamma_weighted(rng):
    """gamma-weighted self-sup loss (RAFT-lineage all-iteration supervision):
    the path is live — finite loss, params move, and the update DIFFERS from
    the final-only default (the intermediate iterations' gradients flow)."""
    cfg = tiny_cfg()
    tc = RAFTTrainConfig(use_scheduler=False, learning_rate=1e-3)
    state = create_raft_state(cfg, tc, jax.random.PRNGKey(0), (H, W))
    loss_cfg = FocusLossConfig(
        image_shape=(H, W), num_tref=1, num_bins=5, num_knn=4,
        smooth_weight=0.01, lut_superpixel_size=4, focus_loss_norm="l1",
        polarity_aware_batching=False, interpolation_scheme="mean",
        knn_block_size=64)
    m_ev = 256
    y = rng.uniform(0, H - 1, (1, m_ev)); x = rng.uniform(0, W - 1, (1, m_ev))
    t = rng.uniform(0, 1, (1, m_ev))
    p = rng.integers(0, 2, (1, m_ev)).astype(np.float32)
    b = np.clip((t * 5).astype(np.int32), 0, 4)
    events = np.stack([y, x, t, p, b, np.ones((1, m_ev))], -1).astype(np.float32)
    batch = {
        "ev_repr": jnp.asarray(rng.normal(size=(1, cfg.nbins_total, H, W))
                               .astype(np.float32)),
        "events": jnp.asarray(events),
    }
    step_final = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                           loss_cfg=loss_cfg))
    step_gamma = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                           loss_cfg=loss_cfg, gamma=0.8))
    sf, logs_f = step_final(state, batch, jax.random.PRNGKey(1))
    sg, logs_g = step_gamma(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs_g["train_losses/total"]))
    assert np.isfinite(float(logs_g["train_losses/focus_final"]))
    pf = jax.tree_util.tree_leaves(sf.params)[0]
    pg = jax.tree_util.tree_leaves(sg.params)[0]
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(pg))
    assert not np.allclose(np.asarray(pf), np.asarray(pg))


def test_raft_train_step_gamma_subsample_unbiased(rng):
    """gamma_sample_k: (a) K = iters-1 reproduces the full gamma loss
    exactly; (b) with K=1 at iters=3 the estimator takes exactly the two
    analytic values 2*w_i*l_i + l_final whose uniform average IS the full
    gamma loss — exact unbiasedness, not a statistical bound."""
    cfg = tiny_cfg(iters=3)
    tc = RAFTTrainConfig(use_scheduler=False, learning_rate=1e-3)
    state = create_raft_state(cfg, tc, jax.random.PRNGKey(0), (H, W))
    # num_tref=2 -> DETERMINISTIC linspace reconstruction times (num_tref=1
    # draws a random t_ref from the same key, which would vary the loss
    # across seeds for reasons unrelated to the iteration choice).
    loss_cfg = FocusLossConfig(
        image_shape=(H, W), num_tref=2, num_bins=5, num_knn=4,
        smooth_weight=0.01, lut_superpixel_size=4, focus_loss_norm="l1",
        scale_iwe_by_dt=False, polarity_aware_batching=False,
        interpolation_scheme="mean", knn_block_size=64)
    m_ev = 256
    y = rng.uniform(0, H - 1, (1, m_ev)); x = rng.uniform(0, W - 1, (1, m_ev))
    t = rng.uniform(0, 1, (1, m_ev))
    p = rng.integers(0, 2, (1, m_ev)).astype(np.float32)
    b = np.clip((t * 5).astype(np.int32), 0, 4)
    events = np.stack([y, x, t, p, b, np.ones((1, m_ev))], -1).astype(np.float32)
    batch = {
        "ev_repr": jnp.asarray(rng.normal(size=(1, cfg.nbins_total, H, W))
                               .astype(np.float32)),
        "events": jnp.asarray(events),
    }

    def loss_at(k, key):
        step = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                         loss_cfg=loss_cfg, gamma=0.8,
                                         gamma_sample_k=k))
        _, logs = step(state, batch, key)
        return float(logs["train_losses/total"])

    # Exactness at K = iters - 1 (the rng choice reduces to a permutation).
    key = jax.random.PRNGKey(1)
    full = loss_at(None, key)
    np.testing.assert_allclose(loss_at(2, key), full, rtol=1e-5)

    # K=1: only two possible estimator values; their uniform mean == full.
    # The reconstruction-times draw is shared (fold_in keeps it intact), so
    # the per-iteration losses are identical across the sampled variants.
    vals = sorted({round(loss_at(1, jax.random.PRNGKey(s)), 5)
                   for s in range(16)})
    assert len(vals) == 2, vals
    np.testing.assert_allclose(np.mean(vals), full, rtol=1e-4)


def test_raft_train_gradient_accumulation(rng):
    """accumulate_steps=2: params frozen after the 1st microbatch, updated
    with the averaged gradient after the 2nd (single-chip effective batch
    2x without the memory)."""
    cfg = tiny_cfg()
    tc = RAFTTrainConfig(use_scheduler=False, learning_rate=1e-3,
                         accumulate_steps=2)
    state = create_raft_state(cfg, tc, jax.random.PRNGKey(0), (H, W))
    loss_cfg = FocusLossConfig(
        image_shape=(H, W), num_tref=1, num_bins=5, num_knn=4,
        smooth_weight=0.01, lut_superpixel_size=4,
        polarity_aware_batching=False, knn_block_size=64)

    def mk_batch(seed):
        r = np.random.default_rng(seed)
        m_ev = 256
        t = r.uniform(0, 1, (1, m_ev))
        ev = np.stack([r.uniform(0, H - 1, (1, m_ev)),
                       r.uniform(0, W - 1, (1, m_ev)), t,
                       r.integers(0, 2, (1, m_ev)).astype(np.float32),
                       np.clip((t * 5).astype(np.int32), 0, 4),
                       np.ones((1, m_ev))], -1).astype(np.float32)
        return {"ev_repr": jnp.asarray(
                    r.normal(size=(1, cfg.nbins_total, H, W))
                    .astype(np.float32)),
                "events": jnp.asarray(ev)}

    step = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                     loss_cfg=loss_cfg))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    state1, _ = step(state, mk_batch(1), jax.random.PRNGKey(1))
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))

    state2, logs = step(state1, mk_batch(2), jax.random.PRNGKey(2))
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))
    assert np.isfinite(float(logs["train_losses/total"]))


def make_synthetic_evimo2(root, n_events=4000, n_flows=8):
    import h5py

    seq = root / "imo" / "eval" / "seq_a"
    seq.mkdir(parents=True)
    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0.0, 5.0, n_events))
    xy = np.stack([rng.integers(0, 640, n_events),
                   rng.integers(0, 480, n_events)], axis=1).astype(np.int16)
    p = rng.integers(0, 2, n_events).astype(np.int8)
    np.save(seq / "dataset_events_t.npy", t)
    np.save(seq / "dataset_events_xy.npy", xy)
    np.save(seq / "dataset_events_p.npy", p)

    flow_time = np.linspace(1.0, 4.0, n_flows)
    multiflow = rng.normal(size=(n_flows, 10, 2, 480, 640)).astype(np.float32)
    multiflow[0, :, :, :8, :8] = np.nan  # some invalid pixels
    obj_id = rng.integers(0, 3, (n_flows, 480, 640)).astype(np.uint8)
    with h5py.File(seq / "dataset_multiflow_10steps_vis.h5", "w") as f:
        f.create_dataset("time", data=flow_time)
        f.create_dataset("multiflow", data=multiflow)
        f.create_dataset("obj_id_mask", data=obj_id)
    return root


@pytest.mark.filterwarnings("ignore")
def test_evimo2_datasubset(tmp_path):
    from motionpriorcmax_tpu.data.evimo2 import Evimo2Provider

    make_synthetic_evimo2(tmp_path)
    provider = Evimo2Provider(tmp_path, nbins_context=41, flow_time_ms=300,
                              provide_raw_events=True)
    assert len(provider) >= 1
    s = provider[0]
    assert s["ev_repr"].shape == (65, 384, 512)
    assert s["flow"].shape == (6, 2, 384, 512)          # 300ms / 50ms steps
    assert s["flow_valid"].shape == (6, 384, 512)
    np.testing.assert_allclose(
        s["flow_timestamps"], np.linspace(0, 1, 7)[1:], atol=1e-6)
    ev = s["events"]
    assert ev.shape[1] == 5
    assert 0 <= ev[:, 2].min() and ev[:, 2].max() <= 1
    assert ev[:, 4].max() <= 40
    assert s["bin_meta"]["nbins_total"] == 65


def test_raft_validation_step_pads_odd_resolution(rng):
    """Non-multiple-of-8 resolutions validate via InputPadder pad/unpad
    around the forward (reference src/modules/raft_spline.py:114-154)."""
    cfg = tiny_cfg()
    tc = RAFTTrainConfig(use_scheduler=False)
    h, w = 28, 30  # pads to 32x32
    state = create_raft_state(cfg, tc, jax.random.PRNGKey(0), (32, 32))
    m = 2
    batch = {
        "ev_repr": jnp.asarray(rng.normal(size=(1, cfg.nbins_total, h, w))
                               .astype(np.float32)),
        "flow": jnp.asarray(rng.normal(size=(1, m, 2, h, w)).astype(np.float32)),
        "flow_valid": jnp.asarray(rng.uniform(size=(1, m, h, w)) > 0.3),
    }
    ts = tuple(np.linspace(0, 1, m + 1)[1:].tolist())
    logs = raft_validation_step(state, batch, cfg, ts,
                                min_traj_len=0.1, max_traj_len=50.0)
    for key in ("val/epe", "val/masked_TEPE", "val/ev_masked_epe_multi"):
        assert key in logs and np.isfinite(float(logs[key])), key
