"""Torch-checkpoint ingestion parity: converted weights must reproduce the
reference UNet's forward pass bit-for-spec (eval mode, running BN stats).

The conversion oracle is the GENUINE reference module
(/root/reference/src/models/unet/unet_model.py:6-48 + unet_parts.py:8-77),
loaded via tests.ref_loader — no hand-retyped twin.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

from tests.ref_loader import REF, load_ref_unet


def make_reference_unet(cin: int, cout: int):
    """Instantiate the actual reference UNet (bilinear=False, the
    configuration the published DSEC checkpoints use —
    src/modules/trajectory_net.py:27-28 passes no bilinear flag)."""
    if not REF.is_dir():
        pytest.skip("reference tree not mounted")
    return load_ref_unet()(cin, cout)


def test_unet_weight_conversion_parity():
    from motionpriorcmax_tpu.models.unet import UNet
    from motionpriorcmax_tpu.training.checkpoint import torch_unet_to_flax

    cin, cout = 5, 2
    tmodel = make_reference_unet(cin, cout)
    # Randomize BN running stats so the conversion of stats is exercised.
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    tmodel.eval()

    state_dict = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = torch_unet_to_flax(state_dict)

    x = np.random.default_rng(0).normal(size=(1, cin, 32, 48)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    model = UNet(cin, cout)
    got = np.asarray(model.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_extract_model_weights(tmp_path):
    from motionpriorcmax_tpu.training.checkpoint import extract_model_weights

    sd = {"model.layer.weight": torch.ones(3), "other.bias": torch.zeros(2)}
    p = tmp_path / "ckpt.ckpt"
    torch.save({"state_dict": sd}, p)
    out = extract_model_weights(str(p))
    assert set(out) == {"layer.weight", "other.bias"}
    np.testing.assert_allclose(out["layer.weight"], 1.0)


def test_orbax_save_restore(tmp_path):
    import optax

    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (TrajectoryNetConfig,
                                              create_train_state)
    from motionpriorcmax_tpu.training.checkpoint import (restore_checkpoint,
                                                         save_checkpoint)

    cfg = TrajectoryNetConfig(image_shape=(16, 16), num_bins=3)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(step=7)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=7)

    fresh = create_train_state(cfg, jax.random.PRNGKey(1))
    restored, step = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    assert step == 7
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_raft_spline_torch_conversion_roundtrip():
    """Build a torch-style state dict by inverting the key map from a real
    init tree, convert, and check every mapped leaf lands (values + layout).
    Validates the mapping is total over convs/batchnorms; true checkpoint
    parity awaits a published ckpt (the reference's parts/ module is absent,
    ROADMAP 'Fidelity')."""
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.models.raft_spline import (RAFTSpline,
                                                        RAFTSplineConfig)
    from motionpriorcmax_tpu.training.checkpoint import (
        raft_spline_torch_key, torch_raft_spline_to_flax)

    cfg = RAFTSplineConfig(nbins_context=5, nbins_correlation=3,
                           bezier_degree=2, ev_target_indices=(2, 4),
                           ev_levels=(1, 2), iters=1)
    model = RAFTSpline(cfg)
    voxel = jnp.zeros((1, cfg.nbins_total, 32, 32), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), voxel, test_mode=True)

    rng = np.random.default_rng(0)
    sd = {}
    n_mapped = 0
    for coll in ("params", "batch_stats"):
        if not template.get(coll):
            continue
        flat = jax.tree_util.tree_flatten_with_path(template[coll])[0]
        for keypath, val in flat:
            path = tuple(k.key for k in keypath)
            tk = raft_spline_torch_key(path[:-1], path[-1])
            if tk is None:
                continue
            n_mapped += 1
            w = rng.normal(size=np.shape(val)).astype(np.float32)
            if path[-1] == "var":            # variances must be positive
                w = np.abs(w) + 0.5
            if path[-1] == "kernel":
                sd[tk] = np.transpose(w, (3, 2, 0, 1))  # flax -> torch
            else:
                sd[tk] = w
    # Every conv/BN leaf must be mapped; instance norms have no params at all.
    assert n_mapped > 40, n_mapped

    variables = torch_raft_spline_to_flax(sd, template)

    # Loaded values differ from the template exactly where mapped.
    changed = 0
    flat_t = jax.tree_util.tree_flatten_with_path(template["params"])[0]
    flat_c = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for (kp, tv), (_, cv) in zip(flat_t, flat_c):
        path = tuple(k.key for k in kp)
        tk = raft_spline_torch_key(path[:-1], path[-1])
        if tk is not None:
            assert not np.allclose(tv, cv), path
            changed += 1
            if path[-1] == "kernel":
                np.testing.assert_allclose(
                    np.transpose(sd[tk], (2, 3, 1, 0)), cv)
    assert changed == sum(
        1 for kp, _ in flat_t
        if raft_spline_torch_key(tuple(k.key for k in kp)[:-1],
                                 tuple(k.key for k in kp)[-1]))

    # The converted tree drives the model.
    _, up = model.apply(variables, voxel, test_mode=True)
    assert np.isfinite(np.asarray(up)).all()

    # Missing keys are reported, not silently skipped.
    sd_missing = dict(sd)
    sd_missing.pop("update_block.gru.convz1.weight")
    with pytest.raises(KeyError, match="convz1"):
        torch_raft_spline_to_flax(sd_missing, template)


def test_conv_transpose_2x2_matches_flax():
    """ConvTranspose2x2 (1x1-conv + depth-to-space fast path) is numerically
    identical to flax nn.ConvTranspose(k=2, s=2) with the SAME param tree."""
    import flax.linen as nn
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.unet import ConvTranspose2x2

    rng = np.random.default_rng(7)
    for cin, cout, h, w in [(8, 4, 6, 10), (128, 64, 15, 20)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        fast = ConvTranspose2x2(cout)
        slow = nn.ConvTranspose(cout, (2, 2), strides=(2, 2))
        v = fast.init(jax.random.PRNGKey(0), x)
        # Same param names and shapes -> one tree drives both modules.
        y_fast = fast.apply(v, x)
        y_slow = slow.apply(v, x)
        assert y_fast.shape == (2, 2 * h, 2 * w, cout) == y_slow.shape
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_slow),
                                   rtol=0, atol=1e-5)
