"""traj-val CLI on synthetic MultiFlow data (events + boundary images)."""

import numpy as np
import pytest

from tests.test_multiflow import make_synthetic_multiflow


@pytest.mark.slow
def test_traj_val_multiflow_smoke(tmp_path, capsys):
    from motionpriorcmax_tpu.cli.main import main

    make_synthetic_multiflow(tmp_path / "mf", split="test")

    rc = main([
        "traj-val", "--config-dir", "config/trajectory_inference",
        "checkpoint=/unused",
        "dataset=multiflow_500ms",
        f"dataset.path={tmp_path / 'mf'}",
        "dataset.load_voxel_grid=false",
        "batch_size=1",
        "model.num_iter.test=1",
        "model.bezier_degree=2",
        "model.num_bins.correlation=25",
        "model.correlation.ev.target_indices=[20, 40]",
        "model.correlation.ev.levels=[1, 2]",
        "model.use_boundary_images=true",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "val/masked_TEPE" in out or "val/ev_masked_TEPE" in out or "val/epe" in out
