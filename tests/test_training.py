"""End-to-end train-step tests: single device, and sharded over a fake mesh.

SURVEY.md §4 item (3): multi-chip correctness is asserted as sharded-vs-
single-device numerical equality of loss/params on the 8-device CPU mesh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionpriorcmax_tpu.losses import FocusLossConfig
from motionpriorcmax_tpu.parallel import make_mesh, replicate, shard_batch, \
    make_sharded_train_step
from motionpriorcmax_tpu.training import (
    TrajectoryNetConfig,
    create_train_state,
    train_step,
    eval_step,
    predict_flow,
)

H, W, NBINS, M = 32, 48, 5, 256


def small_cfgs():
    cfg = TrajectoryNetConfig(image_shape=(H, W), num_bins=NBINS, num_basis=1,
                              patch_size=4, basis_type="polynomial")
    loss_cfg = FocusLossConfig(
        image_shape=(H, W), num_tref=1, num_bins=NBINS, num_knn=4,
        smooth_weight=0.003, lut_superpixel_size=4, focus_loss_norm="l1",
        dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
        polarity_aware_batching=False, interpolation_scheme="mean",
        knn_block_size=64,
    )
    return cfg, loss_cfg


def make_batch(rng, batch_size=2):
    y = rng.uniform(0, H - 1, (batch_size, M))
    x = rng.uniform(0, W - 1, (batch_size, M))
    t = rng.uniform(0, 1, (batch_size, M))
    p = rng.integers(0, 2, (batch_size, M)).astype(np.float32)
    b = np.clip((t * NBINS).astype(np.int32), 0, NBINS - 1)
    v = np.ones((batch_size, M), np.float32)
    events = np.stack([y, x, t, p, b, v], axis=-1).astype(np.float32)
    voxel = rng.normal(size=(batch_size, NBINS, H, W)).astype(np.float32)
    return {"voxel": jnp.asarray(voxel), "events": jnp.asarray(events)}


def test_train_step_updates_params(rng):
    cfg, loss_cfg = small_cfgs()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(rng)
    step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg))
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["train_losses/total"]))
    # Parameters changed.
    old = jax.tree_util.tree_leaves(state.params)[0]
    new = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(old), np.asarray(new))
    assert int(new_state.step) == 1
    # BatchNorm stats were updated.
    bs_old = jax.tree_util.tree_leaves(state.batch_stats)[0]
    bs_new = jax.tree_util.tree_leaves(new_state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs_old), np.asarray(bs_new))


def test_eval_step_with_gt_flow(rng):
    cfg, loss_cfg = small_cfgs()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(rng)
    batch["gt_flow"] = jnp.asarray(
        rng.normal(size=(2, 2, H, W)).astype(np.float32))
    logs = jax.jit(functools.partial(eval_step, cfg=cfg, loss_cfg=loss_cfg))(
        state, batch, jax.random.PRNGKey(1))
    for key in ("val_losses/total", "val_losses/EPE", "val_losses/AE",
                "val_losses/1PE"):
        assert key in logs and np.isfinite(float(logs[key])), key


def test_predict_flow_shape(rng):
    cfg, loss_cfg = small_cfgs()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    voxel = jnp.asarray(rng.normal(size=(2, NBINS, H, W)).astype(np.float32))
    flow = predict_flow(state, voxel, cfg)
    assert flow.shape == (2, 2, H, W)
    assert np.isfinite(np.asarray(flow)).all()


def test_sharded_train_step_matches_single_device(rng):
    """Loss/params after one step must agree between a (4 data x 2 event)
    sharded run and the unsharded run — this is the multi-node test."""
    cfg, loss_cfg = small_cfgs()
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"

    import optax

    batch = make_batch(rng, batch_size=4)
    # SGD keeps the update linear in the gradient: benign float reduction-order
    # noise from sharded scatter-adds stays ~1e-7, while a real sharding bug
    # (wrong psum, missing halo) still produces O(1) divergence.  (Adam's
    # g/|g| normalization would amplify tiny-gradient noise to 2*lr.)
    tx = optax.sgd(0.05)
    state = create_train_state(cfg, jax.random.PRNGKey(0), tx=tx)
    key = jax.random.PRNGKey(7)

    step_single = jax.jit(functools.partial(train_step, cfg=cfg,
                                            loss_cfg=loss_cfg))
    ref_state, ref_logs = step_single(state, batch, key)

    mesh = make_mesh(data=4, event=2)
    state_sh = replicate(mesh,
                         create_train_state(cfg, jax.random.PRNGKey(0), tx=tx))
    batch_sh = shard_batch(mesh, batch)
    step_sharded = make_sharded_train_step(
        functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg), mesh,
        donate_state=False)
    new_state, logs = step_sharded(state_sh, batch_sh, key)

    np.testing.assert_allclose(float(logs["train_losses/total"]),
                               float(ref_logs["train_losses/total"]),
                               rtol=2e-5)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    got_leaves = jax.tree_util.tree_leaves(new_state.params)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_train_step_cell_sorted_batch_matches_unsorted(rng):
    """A batch carrying loader-sorted events + 'lut_cell_ends' produces the
    same loss and parameter update as the unsorted batch (plumbing test for
    the sorted gather backward through train_step)."""
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort

    cfg, loss_cfg = small_cfgs()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(rng)
    ev = np.asarray(batch["events"])
    pairs = [lut_cell_sort(e, (H, W), NBINS, loss_cfg.lut_superpixel_size)
             for e in ev]
    sorted_batch = dict(batch)
    sorted_batch["events"] = jnp.asarray(np.stack([p[0] for p in pairs]))
    sorted_batch["lut_cell_ends"] = jnp.asarray(
        np.stack([p[1] for p in pairs]))

    step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg))
    s_ref, logs_ref = step(state, batch, jax.random.PRNGKey(1))
    s_sorted, logs_sorted = step(state, sorted_batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(logs_sorted["train_losses/total"]),
                               float(logs_ref["train_losses/total"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_sorted.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-3)
