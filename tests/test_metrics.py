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


def test_traj_len_filter_parity_vs_reference(rng):
    """min/max_traj_len gating matches the LIVE reference EPE_MULTI /
    FLOW_METRICS_MULTI (src/modules/utils.py:357-393, 496-511), including
    the mask-cloning behavior when valid_mask is None."""
    import torch

    from motionpriorcmax_tpu.metrics import trajectory_flow_metrics
    from tests.ref_loader import load_ref_modules_utils

    ref = load_ref_modules_utils()

    m, n, h, w = 6, 2, 8, 8
    src = rng.normal(size=(m, n, 2, h, w)).astype(np.float32)
    tgt = (rng.normal(size=(m, n, 2, h, w)) * 2).astype(np.float32)
    mask = rng.uniform(size=(m, n, h, w)) < 0.8

    src_t = [torch.from_numpy(src[i]) for i in range(m)]
    tgt_t = [torch.from_numpy(tgt[i]) for i in range(m)]
    mask_t = [torch.from_numpy(mask[i]) for i in range(m)]

    cases = [(None, None), (jnp.asarray(mask), mask_t)]
    gates = [(2.0, None), (None, 9.0), (2.0, 9.0)]
    for vm_ours, vm_ref in cases:
        for lo, hi in gates:
            metric = ref.EPE_MULTI(min_traj_len=lo, max_traj_len=hi)
            metric.update(src_t, tgt_t,
                          None if vm_ref is None
                          else [t.clone() for t in vm_ref])
            want = float(metric.compute())
            got, wgt = epe_masked_multi(jnp.asarray(src), jnp.asarray(tgt),
                                        vm_ours, min_traj_len=lo,
                                        max_traj_len=hi)
            assert float(wgt) == 1.0
            assert np.isclose(float(got), want, atol=1e-4), (lo, hi, vm_ref is None)

            fm = ref.FLOW_METRICS_MULTI(min_traj_len=lo, max_traj_len=hi)
            fm.update(src_t, tgt_t,
                      None if vm_ref is None
                      else [t.clone() for t in vm_ref])
            want_d = {k: float(v) for k, v in fm.compute().items()}
            got_d = trajectory_flow_metrics(jnp.asarray(src), jnp.asarray(tgt),
                                            vm_ours, min_traj_len=lo,
                                            max_traj_len=hi)
            for key in ("TEPE", "TAE", "T3PE", "EPE_STEP00", "EPE_STEP05"):
                assert np.isclose(float(got_d[key]), want_d[key],
                                  atol=1e-3), key


def test_metric_bank_reduce_across_mesh():
    """reduce_across psums (sum, count) states over a mesh axis — the
    in-jit analog of torchmetrics dist_reduce_fx='sum'."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from motionpriorcmax_tpu.parallel import make_mesh

    mesh = make_mesh(data=8, event=1)
    per_device = jnp.arange(8, dtype=jnp.float32).reshape(8, 1)

    def body(x):
        state = {"epe": (x.sum(), jnp.asarray(1.0))}
        return MetricBank.reduce_across(state, "data")

    out = jax.jit(shard_map(body, mesh=mesh, in_specs=P("data"),
                            out_specs=P()))(per_device)
    s, c = out["epe"]
    assert float(s) == 28.0 and float(c) == 8.0
