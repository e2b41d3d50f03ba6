"""End-to-end learning test: self-supervised UNet training recovers the flow.

The full production path — on-device voxelization -> UNet -> coefficients ->
trajectories -> CMax loss -> AdamW — must drive the predicted dense flow
toward the true translation of a synthetic scene.  (SURVEY.md §4 item 4 at
the system level; tests/test_flow_recovery.py covers the loss-only level.)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionpriorcmax_tpu.losses import FocusLossConfig
from motionpriorcmax_tpu.training import (TrajectoryNetConfig,
                                          create_train_state, train_step)
from motionpriorcmax_tpu.training.trajectory_net import (
    TrajectoryModel, _flow_from_coeffs, voxelize_batch_on_device)
from tests.test_focus_loss import H, W, NBINS, make_translating_events


@pytest.mark.slow
def test_unet_selfsup_recovers_flow(rng):
    true_flow = (5.0, 7.0)
    ev = make_translating_events(rng, true_flow, n_lines=10, m=2048)
    cfg = TrajectoryNetConfig(image_shape=(H, W), num_bins=NBINS, num_basis=1,
                              patch_size=4, lr=1e-3)
    loss_cfg = FocusLossConfig(image_shape=(H, W), num_bins=NBINS, num_knn=8,
                               smooth_weight=0.003,
                               polarity_aware_batching=False,
                               knn_block_size=64, knn_method="exact")
    batch = {"events": jnp.asarray(ev)}
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg))

    key = jax.random.PRNGKey(1)
    first_losses, last_losses = [], []
    for i in range(120):
        key, sub = jax.random.split(key)
        state, logs = step(state, batch, sub)
        (first_losses if i < 20 else last_losses).append(
            float(logs["train_losses/focus_loss"]))

    # Recovered dense flow ~ the true translation.
    model = TrajectoryModel(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    voxel = voxelize_batch_on_device(cfg, batch["events"])
    coeff = model.apply(variables, voxel, train=False)

    def basis_fn(t):
        return model.apply({"params": state.params}, t,
                           method=TrajectoryModel.basis)

    flow = np.asarray(_flow_from_coeffs(cfg, coeff, basis_fn))[0]
    est = np.array([flow[0].mean(), flow[1].mean()])
    err = np.linalg.norm(est - np.asarray(true_flow))
    assert err < 2.5, f"recovered {est} vs true {true_flow} (err {err:.2f})"
