"""Data-parallel RAFT-Spline training over the mesh == single device.

The trajectory-path analog of the flow path's DDP-replacement test
(tests/test_training.py): make_sharded_train_step is model-agnostic, so the
same mesh machinery shards RAFT training batches over 'data' (+ events over
'event').
"""

import functools

import jax
import numpy as np
import optax
import pytest

from motionpriorcmax_tpu.losses import FocusLossConfig
from motionpriorcmax_tpu.models.raft_spline import RAFTSplineConfig
from motionpriorcmax_tpu.parallel import (make_mesh, make_sharded_train_step,
                                          replicate, shard_batch)
from motionpriorcmax_tpu.training.raft_spline import (RAFTTrainConfig,
                                                      create_raft_state,
                                                      raft_train_step)

H, W = 32, 32


def make_raft_batch(rng, batch, m=256, nbins_total=7):
    t = rng.uniform(0, 1, (batch, m))
    bins = np.clip((t * 5).astype(np.int32), 0, 4).astype(np.float32)
    events = np.stack([
        rng.uniform(0, H - 1, (batch, m)), rng.uniform(0, W - 1, (batch, m)),
        t, rng.integers(0, 2, (batch, m)).astype(np.float32), bins,
        np.ones((batch, m))], -1).astype(np.float32)
    voxel = rng.normal(size=(batch, nbins_total, H, W)).astype(np.float32)
    return {"ev_repr": voxel, "events": events}


@pytest.mark.slow
def test_sharded_raft_train_matches_single(rng):
    cfg = RAFTSplineConfig(nbins_context=5, nbins_correlation=3,
                           bezier_degree=2, ev_target_indices=(2, 4),
                           ev_levels=(1, 2), iters=2)
    loss_cfg = FocusLossConfig(image_shape=(H, W), num_bins=5, num_knn=4,
                               smooth_weight=0.01,
                               polarity_aware_batching=False,
                               knn_block_size=64)
    tc = RAFTTrainConfig(use_scheduler=False)
    batch = make_raft_batch(rng, batch=4)
    key = jax.random.PRNGKey(7)

    # SGD: linear in the gradient (see tests/test_training.py rationale).
    def make_state():
        state = create_raft_state(cfg, tc, jax.random.PRNGKey(0), (H, W))
        return state.replace(tx=optax.sgd(0.05),
                             opt_state=optax.sgd(0.05).init(state.params))

    step_single = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                            loss_cfg=loss_cfg))
    ref_state, ref_logs = step_single(make_state(), batch, key)

    mesh = make_mesh(data=2, event=2)
    state_sh = replicate(mesh, make_state())
    step_sh = make_sharded_train_step(
        functools.partial(raft_train_step, cfg=cfg, loss_cfg=loss_cfg), mesh,
        donate_state=False)
    new_state, logs = step_sh(state_sh, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(logs["train_losses/total"]),
                               float(ref_logs["train_losses/total"]),
                               rtol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=2e-3)
