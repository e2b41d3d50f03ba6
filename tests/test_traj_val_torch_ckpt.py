"""traj-val ingests a published-style torch Lightning checkpoint directly.

The reference's Tab2L5 parity run (scripts/trajectory_inference.py:65-70
loads a RAFTSplineModule Lightning ckpt whose model attr is 'net') must be a
single CLI invocation here — checkpoint=<.ckpt> converts through
torch_raft_spline_to_flax automatically (README 'Checkpoint parity').
"""

import numpy as np
import pytest

from tests.test_raft_training import make_synthetic_evimo2


def _fake_torch_lightning_ckpt(path, cfg, image_hw=(384, 512)):
    """Invert the flax->torch key map from a real init tree into a
    'net.'-prefixed Lightning state_dict (the converter's KeyError contract
    guarantees every mapped leaf must be present)."""
    import jax
    import jax.numpy as jnp
    import torch

    from motionpriorcmax_tpu.models.raft_spline import RAFTSpline
    from motionpriorcmax_tpu.training.checkpoint import raft_spline_torch_key

    model = RAFTSpline(cfg)
    h, w = image_hw
    voxel = jnp.zeros((1, cfg.nbins_total, h, w), jnp.float32)
    init = jax.jit(lambda r, v: model.init(r, v, test_mode=True))
    template = init(jax.random.PRNGKey(0), voxel)

    rng = np.random.default_rng(7)
    sd = {}
    for coll in ("params", "batch_stats"):
        if not template.get(coll):
            continue
        flat = jax.tree_util.tree_flatten_with_path(template[coll])[0]
        for keypath, val in flat:
            p = tuple(k.key for k in keypath)
            tk = raft_spline_torch_key(p[:-1], p[-1])
            if tk is None:
                continue
            arr = rng.normal(scale=0.05, size=np.shape(val)).astype(np.float32)
            if p[-1] == "var":
                arr = np.abs(arr) + 0.5
            if p[-1] == "kernel":
                arr = np.transpose(arr, (3, 2, 0, 1))
            sd[f"net.{tk}"] = torch.from_numpy(arr)
    assert len(sd) > 40
    torch.save({"state_dict": sd}, path)


@pytest.mark.slow
def test_traj_val_accepts_torch_ckpt(tmp_path, capsys):
    from motionpriorcmax_tpu.cli.main import main
    from motionpriorcmax_tpu.models.raft_spline import RAFTSplineConfig

    make_synthetic_evimo2(tmp_path / "data")
    cfg = RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                           bezier_degree=2,
                           ev_target_indices=(8, 16, 24, 32, 40),
                           ev_levels=(1, 1, 1, 1, 4), iters=1)
    ckpt = tmp_path / "Tab2L5.ckpt"
    _fake_torch_lightning_ckpt(ckpt, cfg)

    rc = main([
        "traj-val", "--config-dir", "config/trajectory_inference",
        "experiment=raft-spline_evimo2-300ms_ours-selfsup",
        f"checkpoint={ckpt}",
        f"dataset.path={tmp_path / 'data'}",
        "batch_size=1",
        "model.num_iter.test=1",
        "model.bezier_degree=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "val/masked_TEPE" in out
