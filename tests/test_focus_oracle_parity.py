"""End-to-end FocusLoss parity against the ACTUAL reference loss.

The oracle is /root/reference/src/losses/focus.py (the paper's core
contribution, `FocusLoss.calc` :66-230) executed with a dense-torch pykeops
stub (tests/ref_loader.py::stub_pykeops — `LazyTensor.argKmin/Kmin` via
`topk(largest=False)`).  Our exact-KNN configuration must reproduce its loss
and IWEs on a random batch, across interpolation schemes (mean / iwd),
polarity-aware batching on/off, both distance norms, and both smoothness
types.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from tests.ref_loader import REF, load_ref_focus_loss

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference tree not mounted")


def _make_inputs(rng, h, w, nbins, m, n_tref=1, num_pos=None):
    """Random trajectories / times / events at test scale."""
    patch = 4
    ys, xs = np.meshgrid(np.arange(patch // 2, h, patch, dtype=np.float32),
                         np.arange(patch // 2, w, patch, dtype=np.float32),
                         indexing="ij")
    base = np.stack([ys.ravel(), xs.ravel()], -1)  # [N, 2] (y, x)
    n = base.shape[0]
    b = 2
    t_total = n_tref + nbins
    traj = (base[None, None] +
            rng.normal(size=(b, t_total, n, 2)).astype(np.float32) * 3.0)

    if n_tref == 1:
        t_ref = rng.uniform(0, 1, 1).astype(np.float32)
    else:
        t_ref = np.linspace(0, 1, n_tref, dtype=np.float32)
    edges = np.linspace(0, 1, nbins + 1, dtype=np.float32)
    times = np.concatenate([t_ref, (edges[:-1] + edges[1:]) / 2])

    y = rng.uniform(0, h - 1, (b, m))
    x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    if num_pos is not None:
        p = np.zeros((b, m))
        p[:, :num_pos] = 1.0
    else:
        p = rng.integers(0, 2, (b, m)).astype(np.float64)
    bi = np.clip((t * nbins).astype(np.int64), 0, nbins - 1)
    valid = (rng.uniform(size=(b, m)) > 0.1).astype(np.float64)
    events = np.stack([y, x, t, p, bi, valid], -1).astype(np.float32)
    return traj, times, events


CASES = [
    # (interp, polarity, dist_norm, smooth_type, smooth_weight)
    ("mean", False, "l2", "on_flow_to_tref", 0.003),
    ("iwd", False, "l2", "on_flow_to_tref", 0.003),
    ("mean", True, "l2", "on_flow_to_tref", 0.003),
    ("iwd", True, "l1", "on_flow_to_tref", 0.003),
    ("mean", False, "l1", "on_flow_to_next", 0.01),
    ("mean", False, "l2", "on_flow_to_tref", 0.0),
]


@pytest.mark.parametrize("interp,polarity,dist_norm,smooth_type,smooth_w",
                         CASES)
def test_focus_loss_full_parity(rng, interp, polarity, dist_norm, smooth_type,
                                smooth_w):
    from motionpriorcmax_tpu.losses import FocusLossConfig, focus_loss

    h, w, nbins, m = 32, 40, 5, 256
    knn = 4
    num_pos = 96 if polarity else None
    traj, times, events = _make_inputs(rng, h, w, nbins, m, num_pos=num_pos)

    RefFocusLoss = load_ref_focus_loss()
    ref = RefFocusLoss(
        image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=knn,
        smooth_weight=smooth_w, lut_superpixel_size=4,
        focus_loss_norm="l1", dist_norm=dist_norm, scale_iwe_by_dt=True,
        mask_image_border=True, polarity_aware_batching=polarity,
        interpolation_scheme=interp, smooth_type=smooth_type)
    batch = {"events": torch.from_numpy(events)}
    if polarity:
        batch["num_pos_events"] = num_pos
    want_loss, want_log, want_misc = ref.calc(
        torch.from_numpy(traj), torch.from_numpy(times), batch)

    cfg = FocusLossConfig(
        image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=knn,
        smooth_weight=smooth_w, lut_superpixel_size=4,
        focus_loss_norm="l1", dist_norm=dist_norm, scale_iwe_by_dt=True,
        mask_image_border=True, polarity_aware_batching=polarity,
        interpolation_scheme=interp, smooth_type=smooth_type,
        knn_method="exact", iwe_impl="direct")
    got_loss, got_log, got_misc = focus_loss(
        cfg, jnp.asarray(traj), jnp.asarray(times), jnp.asarray(events),
        num_pos_events=num_pos if polarity else -1)

    assert np.isclose(float(got_loss), want_loss.item(), rtol=1e-4), (
        float(got_loss), want_loss.item())
    for k in ("focus_loss", "smoothness_loss"):
        assert np.isclose(float(got_log[k]), want_log[k].item(),
                          rtol=1e-4, atol=1e-7), (
            k, float(got_log[k]), want_log[k].item())
    np.testing.assert_allclose(np.asarray(got_misc["iwes"]),
                               want_misc["iwes"].numpy(),
                               rtol=1e-4, atol=1e-4)


def test_focus_loss_multi_tref_parity(rng):
    """num_tref=3 (linspace reference times; no dt scaling/polarity, which the
    reference asserts require num_tref == 1)."""
    from motionpriorcmax_tpu.losses import FocusLossConfig, focus_loss

    h, w, nbins, m, knn, n_tref = 32, 40, 4, 200, 4, 3
    traj, times, events = _make_inputs(rng, h, w, nbins, m, n_tref=n_tref)

    RefFocusLoss = load_ref_focus_loss()
    kwargs = dict(image_shape=(h, w), num_tref=n_tref, num_bins=nbins,
                  num_knn=knn, smooth_weight=0.003, lut_superpixel_size=4,
                  focus_loss_norm="l2", dist_norm="l2", scale_iwe_by_dt=False,
                  mask_image_border=True, polarity_aware_batching=False,
                  interpolation_scheme="mean", smooth_type="on_flow_to_tref")
    ref = RefFocusLoss(**kwargs)
    want_loss, _, want_misc = ref.calc(
        torch.from_numpy(traj), torch.from_numpy(times),
        {"events": torch.from_numpy(events)})

    cfg = FocusLossConfig(knn_method="exact", iwe_impl="direct", **kwargs)
    got_loss, _, got_misc = focus_loss(
        cfg, jnp.asarray(traj), jnp.asarray(times), jnp.asarray(events))

    assert np.isclose(float(got_loss), want_loss.item(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_misc["iwes"]),
                               want_misc["iwes"].numpy(),
                               rtol=1e-4, atol=1e-4)
