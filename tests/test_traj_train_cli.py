"""traj-train CLI smoke on synthetic EVIMO2 (tiny RAFT config, CPU)."""

import numpy as np
import pytest
import yaml

from tests.test_raft_training import make_synthetic_evimo2


@pytest.mark.slow
def test_traj_train_smoke(tmp_path):
    from motionpriorcmax_tpu.cli.main import main

    # Synthetic data in BOTH eval and train splits.
    make_synthetic_evimo2(tmp_path / "data")
    import shutil

    shutil.copytree(tmp_path / "data/imo/eval/seq_a",
                    tmp_path / "data/imo/train/seq_t")

    rc = main([
        "traj-train", "--config-dir", "config/trajectory_inference",
        "--workdir", str(tmp_path / "run"),
        "--max-steps", "1", "--log-every", "1", "--ckpt-every", "1",
        "--event-capacity", "4096",
        # Validation + best-k selection on the eval split every step
        # (reference ModelCheckpoint-on-val, scripts/flow_training.py:110-116
        # applied to the trajectory path).
        "--val-every", "1", "--val-batch-size", "1",
        "experiment=raft-spline_evimo2-300ms_ours-selfsup",
        "checkpoint=/unused",
        f"dataset.path={tmp_path / 'data'}",
        "training.batch_size=1",
        "model.num_iter.train=1",
        "model.num_iter.test=1",
        "model.bezier_degree=2",
        "model.num_bins.context=41",
        # The measured single-chip batch-6 recipe's knobs (CLAUDE.md) must be
        # reachable via dotted overrides (round-1 gap: RAFTTrainConfig /
        # RAFTSplineConfig were built without them).
        "model.corr_dtype=bfloat16",
        "model.freeze_bn=true",
        "model.remat_encoders=true",
        "training.accumulate_steps=2",
    ])
    assert rc == 0
    assert (tmp_path / "run" / "scalars.jsonl").exists()
    log = (tmp_path / "run" / "scalars.jsonl").read_text()
    assert "train_losses/total" in log
    # Val scalars and the best-metric retention markers made it to the log.
    assert "val/masked_TEPE" in log
    assert "val/masked_TEPE_at_best" in log
    ckpt_dir = tmp_path / "run" / "checkpoints"
    assert any(ckpt_dir.iterdir())
    # The retained checkpoint carries the monitored metric (orbax best-k).
    from motionpriorcmax_tpu.training.checkpoint import restore_raw_checkpoint

    tree, step = restore_raw_checkpoint(str(ckpt_dir), best=True)
    assert step == 1 and "params" in tree


@pytest.mark.slow
def test_traj_train_supervised_multiflow_smoke(tmp_path):
    """--loss supervised on synthetic MultiFlow: the paper's supervised
    recipe reaches the CLI end to end (gamma-weighted L1, no raw events)."""
    from motionpriorcmax_tpu.cli.main import main
    from tests.test_multiflow import make_synthetic_multiflow

    make_synthetic_multiflow(tmp_path / "mf", split="train")

    rc = main([
        "traj-train", "--config-dir", "config/trajectory_inference",
        "--workdir", str(tmp_path / "run"),
        "--max-steps", "1", "--log-every", "1", "--ckpt-every", "1",
        "--loss", "supervised",
        "experiment=raft-spline_multiflow-500ms_supervised",
        "checkpoint=/unused",
        f"dataset.path={tmp_path / 'mf'}",
        "training.batch_size=1",
        "model.num_iter.train=1",
        "model.bezier_degree=2",
        "model.num_bins.context=6",
        "model.num_bins.correlation=4",   # NBINS_CONTEXT2CORR[6]
        "model.correlation.ev.target_indices=[2,4]",
        "model.correlation.ev.levels=[1,2]",
    ])
    assert rc == 0
    log = (tmp_path / "run" / "scalars.jsonl").read_text()
    assert "train_losses/l1_final" in log
    assert any((tmp_path / "run" / "checkpoints").iterdir())


@pytest.mark.slow
def test_traj_train_sharded_matches_unsharded(tmp_path):
    """traj-train on the 8-virtual-device CPU mesh: a --mesh 4,2 run (DP x
    event sharding) logs the same train loss as --mesh 1,1 (seeded loaders,
    identical init keys) — the CLI-level twin of tests/test_raft_sharded.py,
    proving the reference batch-6 recipe path runs as DP on a pod slice."""
    import json

    from motionpriorcmax_tpu.cli.main import main

    make_synthetic_evimo2(tmp_path / "data")
    import shutil

    shutil.copytree(tmp_path / "data/imo/eval/seq_a",
                    tmp_path / "data/imo/train/seq_t")
    # Two distinct training sequences so batch_size=2 has a full batch.
    shutil.copytree(tmp_path / "data/imo/eval/seq_a",
                    tmp_path / "data/imo/train/seq_u")

    def run(name, mesh):
        rc = main([
            "traj-train", "--config-dir", "config/trajectory_inference",
            "--workdir", str(tmp_path / name),
            "--max-steps", "1", "--log-every", "1", "--ckpt-every", "1",
            "--event-capacity", "4096", "--val-every", "0",
            "--mesh", mesh,
            "experiment=raft-spline_evimo2-300ms_ours-selfsup",
            "checkpoint=/unused",
            f"dataset.path={tmp_path / 'data'}",
            "training.batch_size=2",
            "model.num_iter.train=1",
            "model.bezier_degree=2",
            "model.num_bins.context=41",
        ])
        assert rc == 0
        rec = json.loads(
            (tmp_path / name / "scalars.jsonl").read_text().splitlines()[0])
        return rec["train_losses/total"]

    loss_single = run("run_single", "1,1")
    loss_sharded = run("run_sharded", "2,2")
    assert loss_sharded == pytest.approx(loss_single, rel=2e-5)
