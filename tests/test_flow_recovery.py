"""End-to-end optimization smoke: the CMax loss must RECOVER a known flow.

SURVEY.md §4 item (4): on a synthetic translating scene, optimizing
trajectory coefficients against the focus loss must drive the estimated
flow toward the true translation.  This validates the full gradient chain
(interpolation -> warp -> IWE -> sharpness) — not just loss ordering.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from motionpriorcmax_tpu.losses import focus_loss, get_reconstruction_times
from motionpriorcmax_tpu.ops.grids import tile_mask_positions
from tests.test_focus_loss import H, W, NBINS, make_cfg, make_translating_events


@pytest.mark.slow
@pytest.mark.parametrize("method", ["exact", "softmax"])
def test_optimization_recovers_translation(method, rng):
    true_flow = np.array([3.0, -4.0], np.float32)
    events = jnp.asarray(make_translating_events(rng, tuple(true_flow),
                                                 n_lines=8, m=1024))
    cfg = make_cfg(knn_method=method, num_knn=8, smooth_weight=0.02,
                   scale_iwe_by_dt=False)

    pos = jnp.asarray(tile_mask_positions((H, W), 4).astype(np.float32))
    n = pos.shape[0]
    # Parameterize a single constant flow coefficient per trajectory
    # (degree-1 polynomial): pos(t) = anchor + f * t.
    coeffs = jnp.zeros((1, n, 2))

    def loss_fn(c, key):
        times = get_reconstruction_times(cfg, key)
        traj = pos[None, None] + c[:, None] * times[None, :, None, None]
        return focus_loss(cfg, traj, times, events)[0]

    tx = optax.adam(0.5)
    opt_state = tx.init(coeffs)
    key = jax.random.PRNGKey(0)
    step = jax.jit(lambda c, s, k: _update(c, s, k, loss_fn, tx))

    for i in range(45):
        key, sub = jax.random.split(key)
        coeffs, opt_state = step(coeffs, opt_state, sub)

    # Tiles with no events receive (near-)zero gradient and stay at zero —
    # estimate the recovered flow from the trajectories that actually moved.
    c = np.asarray(coeffs)[0]
    moved = c[np.linalg.norm(c, axis=-1) > 1.0]
    assert len(moved) > 10, "optimization moved almost no trajectories"
    est = np.median(moved, axis=0)
    # The discrete objective (3x3 blur + bin quantization + point-cluster
    # scene) plateaus below the exact magnitude; require the recovered flow
    # to point the right way and carry most of the magnitude.  (The
    # reference's objective has the identical structure.)
    cos = float(est @ true_flow / (np.linalg.norm(est)
                                   * np.linalg.norm(true_flow)))
    mag_ratio = float(np.linalg.norm(est) / np.linalg.norm(true_flow))
    assert cos > 0.95, f"direction off: est {est} vs true {true_flow}"
    assert mag_ratio > 0.5, f"magnitude {mag_ratio:.2f} of true ({est})"


def _update(coeffs, opt_state, key, loss_fn, tx):
    grads = jax.grad(loss_fn)(coeffs, key)
    updates, opt_state = tx.update(grads, opt_state, coeffs)
    return optax.apply_updates(coeffs, updates), opt_state
