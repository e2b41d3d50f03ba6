"""Checkpoint resume path: train -> save -> restore -> continue."""

import jax
import numpy as np
import pytest

from motionpriorcmax_tpu.losses import FocusLossConfig
from motionpriorcmax_tpu.training import TrajectoryNetConfig, create_train_state
from motionpriorcmax_tpu.training.checkpoint import (restore_checkpoint,
                                                     save_checkpoint)
from tests.test_training import make_batch, small_cfgs


def test_resume_continues_from_saved_state(tmp_path, rng):
    import functools

    from motionpriorcmax_tpu.training import train_step

    cfg, loss_cfg = small_cfgs()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(rng)
    step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg))

    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    save_checkpoint(str(tmp_path / "ckpt"), state, step=3, metric=1.0)

    # Restore into a freshly initialized template (the CLI --ckp_path path).
    template = create_train_state(cfg, jax.random.PRNGKey(99))
    restored, at_step = restore_checkpoint(str(tmp_path / "ckpt"), template)
    assert at_step == 3
    assert int(restored.step) == 3

    # Parameters and optimizer state match the saved state exactly.
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Training continues identically from the restored state.
    s1, l1 = step(state, batch, jax.random.PRNGKey(42))
    s2, l2 = step(restored, batch, jax.random.PRNGKey(42))
    np.testing.assert_allclose(float(l1["train_losses/total"]),
                               float(l2["train_losses/total"]), rtol=1e-6)


def test_best_k_retention(tmp_path, rng):
    cfg, _ = small_cfgs()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # Save 7 checkpoints with varying metrics; keep=5 best (min mode).
    metrics = [5.0, 3.0, 8.0, 1.0, 7.0, 2.0, 6.0]
    for i, m in enumerate(metrics):
        save_checkpoint(str(tmp_path / "ckpt"), state.replace(step=i),
                        step=i, keep=5, metric=m)
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(str((tmp_path / "ckpt").absolute())) as mgr:
        steps = sorted(mgr.all_steps())
    kept_metrics = sorted(metrics[s] for s in steps)
    # The 5 smallest metrics survive.
    assert kept_metrics == sorted(metrics)[:5], (steps, kept_metrics)
