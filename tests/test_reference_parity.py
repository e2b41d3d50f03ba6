"""Golden parity against the ACTUAL reference implementation.

These tests load individual reference modules straight from /root/reference
(read-only; loaded per-file to bypass package __init__ chains that need
uninstalled deps) and compare outputs bit-for-spec with ours.  Skipped when
the reference tree or torch is unavailable.
"""

import importlib.util
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference tree not mounted")


def load_ref(name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(name, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_voxel_grid_parity(rng):
    ref = load_ref("ref_dsec_utils", "src/loader/dsec/utils.py")
    from motionpriorcmax_tpu.ops.events import voxel_grid_from_events

    nb, h, w = 5, 24, 32
    m = 400
    x = rng.uniform(0, w - 1, m).astype(np.float32)
    y = rng.uniform(0, h - 1, m).astype(np.float32)
    t = np.sort(rng.integers(0, 10**6, m)).astype(np.int64)
    p = rng.integers(0, 2, m).astype(np.float32)

    vg = ref.VoxelGrid((nb, h, w), norm_type=None, quantile=0)
    events = {"x": torch.from_numpy(x), "y": torch.from_numpy(y),
              "t": torch.from_numpy(t), "p": torch.from_numpy(p)}
    want = vg.convert(events).numpy()

    t_norm = (nb - 1) * (t - t[0]) / (t[-1] - t[0])
    got = np.asarray(voxel_grid_from_events(
        jnp.asarray(y), jnp.asarray(x), jnp.asarray(t_norm.astype(np.float32)),
        jnp.asarray(p), jnp.ones(m), num_bins=nb, height=h, width=w))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_voxel_norm_parity(rng):
    ref = load_ref("ref_dsec_utils", "src/loader/dsec/utils.py")
    from motionpriorcmax_tpu.ops.events import normalize_voxel_grid

    grid = rng.normal(size=(4, 8, 8)).astype(np.float32)
    grid[rng.uniform(size=grid.shape) < 0.5] = 0.0

    vg = ref.VoxelGrid((4, 8, 8), norm_type="mean_std", quantile=0)
    # Reuse the reference's normalization branch by running convert on dummy
    # events then... simpler: replicate its masked-normalization inline.
    g = torch.from_numpy(grid.copy())
    mask = torch.nonzero(g, as_tuple=True)
    mean, std = g[mask].mean(), g[mask].std()
    want = g.clone()
    want[mask] = (g[mask] - mean) / std

    got = np.asarray(normalize_voxel_grid(jnp.asarray(grid), "mean_std"))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-4)


def test_focus_objective_parity(rng):
    ref = load_ref("ref_loss", "src/utils/loss.py")
    from motionpriorcmax_tpu.ops.gradients import focus_objective, \
        smoothness_loss

    iwes = rng.uniform(0, 3, (2, 16, 20)).astype(np.float32)
    for norm in ("l1", "l2"):
        want = ref.calculate_focus_loss(
            torch.from_numpy(iwes), loss_type="gradient_magnitude",
            norm=norm).item()
        got = float(focus_objective(jnp.asarray(iwes),
                                    "gradient_magnitude", norm))
        assert np.isclose(got, want, rtol=1e-5), (norm, got, want)

    want_var = ref.calculate_focus_loss(torch.from_numpy(iwes),
                                        loss_type="variance").item()
    got_var = float(focus_objective(jnp.asarray(iwes), "variance"))
    assert np.isclose(got_var, want_var, rtol=1e-5)

    flow = rng.normal(size=(3, 2, 12, 14)).astype(np.float32)
    want_s = ref.calculate_smoothness_loss(torch.from_numpy(flow)).item()
    got_s = float(smoothness_loss(jnp.asarray(flow)))
    assert np.isclose(got_s, want_s, rtol=1e-5)


def test_compute_basis_parity(rng):
    ref = load_ref("ref_basis", "src/utils/basis.py")
    from motionpriorcmax_tpu.ops.basis import compute_trajectories, eval_basis

    b, s, n, k, t_ = 2, 2, 6, 3, 4
    coeffs = rng.normal(size=(b, s, 2, n, k)).astype(np.float32)
    times = rng.uniform(0, 1, t_).astype(np.float32)

    for kind in ("dct", "polynomial"):
        want = ref.compute_basis(torch.from_numpy(coeffs),
                                 torch.from_numpy(times[None]), k,
                                 kind).numpy()
        basis = eval_basis(jnp.asarray(times), k, kind)
        got = np.asarray(compute_trajectories(jnp.asarray(coeffs), basis))
        # Reference returns [b, n, n_t, 2]; ours folds the downstream
        # calculate_coords permute (trajectory_net.py:111) -> [b, n_t, n, 2].
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 1, 3)),
                                   atol=1e-4)


def test_flow_valid_masked_error_parity(rng):
    """The DSEC val-metric path: reference OpticalFlowError.run feeds
    batch['flow_valid'] into calculate_flow_error (src/utils/metrics.py:50-57).
    Round-1 val numbers were unmasked (see DIVERGENCES.md)."""
    from tests.ref_loader import load_ref_metrics

    ref_metrics, _ = load_ref_metrics()
    from motionpriorcmax_tpu.ops.flow_error import calculate_flow_error

    b, h, w = 3, 20, 24
    gt = rng.normal(size=(b, 2, h, w)).astype(np.float32) * 4
    # Some GT-invalid pixels (zeros: the |u|>0 & |v|>0 gate).
    zero = rng.uniform(size=(b, h, w)) < 0.25
    gt[:, 0][zero] = 0.0
    gt[:, 1][zero] = 0.0
    pred = rng.normal(size=(b, 2, h, w)).astype(np.float32) * 4
    valid = rng.uniform(size=(b, h, w)) < 0.6

    want = ref_metrics.OpticalFlowError.run(
        {"flow": torch.from_numpy(pred)},
        {"forward_flow": torch.from_numpy(gt),
         "flow_valid": torch.from_numpy(valid)})

    got = calculate_flow_error(jnp.asarray(gt), jnp.asarray(pred),
                               event_mask=jnp.asarray(valid))
    for k in ("EPE", "1PE", "2PE", "3PE", "AE"):
        assert np.isclose(float(got[k]), want[k].item(), rtol=1e-5, atol=1e-6), (
            k, float(got[k]), want[k].item())


def test_eval_step_uses_flow_valid(rng):
    """Wiring regression: eval_step must intersect batch['flow_valid'] into
    the flow-error mask (round-1 bug: the mask was silently dropped, skewing
    best-checkpoint selection on val_losses/EPE)."""
    import jax

    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training.trajectory_net import (
        TrajectoryNetConfig, create_train_state, eval_step)

    h, w, nb, m = 32, 32, 4, 64
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nb, num_basis=1,
                              patch_size=4, basis_type="polynomial")
    loss_cfg = FocusLossConfig(image_shape=(h, w), num_bins=nb, num_tref=1,
                               num_knn=4, lut_superpixel_size=4,
                               knn_method="softmax",
                               polarity_aware_batching=False)
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    y = rng.uniform(0, h - 1, m)
    x = rng.uniform(0, w - 1, m)
    t = rng.uniform(0, 1, m)
    p = rng.integers(0, 2, m)
    bi = np.clip((t * nb).astype(int), 0, nb - 1)
    events = np.stack([y, x, t, p, bi, np.ones(m)], -1).astype(np.float32)[None]
    gt = rng.normal(size=(1, 2, h, w)).astype(np.float32)
    batch = {
        "events": jnp.asarray(events),
        "voxel": jnp.asarray(rng.normal(size=(1, nb, h, w)).astype(np.float32)),
        "gt_flow": jnp.asarray(gt),
    }
    key = jax.random.PRNGKey(1)

    # Restrictive mask must change EPE vs no mask (pred is deterministic).
    half = np.zeros((1, h, w), bool)
    half[:, :, : w // 2] = True
    logs_none = eval_step(state, batch, key, cfg, loss_cfg)
    logs_half = eval_step(state, {**batch, "flow_valid": jnp.asarray(half)},
                          key, cfg, loss_cfg)
    assert not np.isclose(float(logs_none["val_losses/EPE"]),
                          float(logs_half["val_losses/EPE"]))
    # flow_valid behaves exactly like the direct mask argument.
    logs_em = eval_step(state, {**batch, "event_mask": jnp.asarray(half)},
                        key, cfg, loss_cfg)
    assert np.isclose(float(logs_half["val_losses/EPE"]),
                      float(logs_em["val_losses/EPE"]), rtol=1e-6)
    # Intersection with event_mask.
    quarter = half.copy()
    quarter[:, : h // 2] = False
    logs_q = eval_step(
        state, {**batch, "flow_valid": jnp.asarray(half),
                "event_mask": jnp.asarray(quarter)}, key, cfg, loss_cfg)
    logs_q_direct = eval_step(
        state, {**batch, "flow_valid": jnp.asarray(quarter)}, key, cfg,
        loss_cfg)
    assert np.isclose(float(logs_q["val_losses/EPE"]),
                      float(logs_q_direct["val_losses/EPE"]), rtol=1e-6)


def test_flow_png_decode_parity(rng, tmp_path):
    ref = load_ref("ref_dsec_utils", "src/loader/dsec/utils.py")
    from motionpriorcmax_tpu.utils.png16 import read_png_rgb, write_png16_rgb

    raw = np.zeros((10, 12, 3), np.uint16)
    raw[..., 0] = rng.integers(0, 2**16, (10, 12))
    raw[..., 1] = rng.integers(0, 2**16, (10, 12))
    raw[..., 2] = rng.integers(0, 2, (10, 12))
    raw[raw[..., 2] == 0, 0] = 0
    raw[raw[..., 2] == 0, 1] = 0

    want_map, want_valid = ref.flow_16bit_to_float(raw)

    path = tmp_path / "f.png"
    write_png16_rgb(path, raw)
    back = read_png_rgb(path)
    np.testing.assert_array_equal(back, raw)
    got_map = np.zeros_like(want_map)
    got_map[..., 0] = (back[..., 0].astype(float) - 2**15) / 128
    got_map[..., 1] = (back[..., 1].astype(float) - 2**15) / 128
    got_map[~want_valid] = 0
    np.testing.assert_allclose(got_map, want_map, atol=1e-6)
