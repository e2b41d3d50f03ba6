"""Metric math parity tests (hand-computed values from the reference formulas)."""

import jax.numpy as jnp
import numpy as np

from motionpriorcmax_tpu.metrics import (
    epe_masked, ae_masked, n_pixel_error_masked, epe_masked_multi,
    trajectory_flow_metrics, predictions_from_lin_assumption, MetricBank)


def test_epe_masked_basic():
    src = jnp.zeros((1, 2, 2, 2))
    tgt = jnp.ones((1, 2, 2, 2)) * jnp.asarray([3.0, 4.0])[None, :, None, None]
    val, w = epe_masked(src, tgt)
    assert np.isclose(float(val), 5.0) and float(w) == 1.0


def test_epe_masked_with_mask_and_empty():
    src = jnp.zeros((1, 2, 2, 2))
    tgt = jnp.ones((1, 2, 2, 2))
    mask = jnp.asarray([[[True, False], [False, False]]])
    val, w = epe_masked(src, tgt, mask)
    assert np.isclose(float(val), np.sqrt(2.0), atol=1e-6)
    val2, w2 = epe_masked(src, tgt, jnp.zeros((1, 2, 2), bool))
    assert float(w2) == 0.0  # empty mask -> zero weight (reference: None)


def test_ae_masked_same_flow_is_zero(rng):
    f = jnp.asarray(rng.normal(size=(2, 2, 4, 4)).astype(np.float32))
    val, _ = ae_masked(f, f)
    # arccos near 1 is ill-conditioned in fp32: identical flows measure a few
    # millidegrees (torch behaves the same way).
    assert float(val) < 0.02


def test_ae_masked_extended_vector():
    # AE of pred=0 vs gt=(1,0): Middlebury 3-vector angle:
    # cos = 1 / (1 * sqrt(2)) -> 45 degrees.
    src = jnp.zeros((1, 2, 1, 1))
    tgt = jnp.zeros((1, 2, 1, 1)).at[:, 0].set(1.0)
    val, _ = ae_masked(src, tgt, degrees=True)
    assert np.isclose(float(val), 45.0, atol=1e-4)


def test_npe_gate():
    # error 2 px on gt of magnitude 100 -> rel err 2% < 5% -> NOT an error px.
    src = jnp.zeros((1, 2, 1, 2))
    tgt = jnp.zeros((1, 2, 1, 2))
    tgt = tgt.at[:, 0, 0, 0].set(100.0)
    src = src.at[:, 0, 0, 0].set(98.0)
    # second pixel: gt magnitude 1, error 2 -> both gates pass.
    tgt = tgt.at[:, 0, 0, 1].set(1.0)
    src = src.at[:, 0, 0, 1].set(3.0)
    val, _ = n_pixel_error_masked(src, tgt, None, 1.0)
    assert np.isclose(float(val), 50.0, atol=1e-4)  # 1 of 2 pixels -> 50%


def test_epe_multi_skips_empty_steps():
    src = jnp.zeros((2, 1, 2, 2, 2))
    tgt = jnp.ones((2, 1, 2, 2, 2))
    masks = jnp.stack([jnp.ones((1, 2, 2), bool), jnp.zeros((1, 2, 2), bool)])
    val, w = epe_masked_multi(src, tgt, masks)
    assert np.isclose(float(val), np.sqrt(2.0), atol=1e-6)
    assert float(w) == 1.0


def test_trajectory_metrics_keys(rng):
    m = 6
    src = jnp.asarray(rng.normal(size=(m, 1, 2, 8, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(m, 1, 2, 8, 8)).astype(np.float32))
    out = trajectory_flow_metrics(src, tgt)
    for key in ("TEPE", "TAE", "T3PE", "EPE_STEP00", "EPE_STEP05"):
        assert key in out and np.isfinite(float(out[key])), key


def test_lin_assumption():
    src = jnp.ones((1, 2, 2, 2))
    out = predictions_from_lin_assumption(src, [0.25, 1.0])
    assert out.shape == (2, 1, 2, 2, 2)
    assert np.isclose(float(out[0, 0, 0, 0, 0]), 0.25)


def test_metric_bank_accumulation():
    bank = MetricBank()
    bank.update({"epe": 2.0}, {"epe": 1.0})
    bank.update({"epe": 4.0}, {"epe": 1.0})
    bank.update({"epe": 100.0}, {"epe": 0.0})  # empty update ignored
    assert np.isclose(bank.compute()["epe"], 3.0)
