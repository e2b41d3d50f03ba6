"""traj-train CLI drive on the REAL TPU: self-sup CMax RAFT-Spline over a
synthetic EVIMO2 tree at the measured b-recipe knobs (bf16 corr,
remat encoders), full 12-iteration loop, a few steps + checkpoint.
Round 4: + validation/best-k every 2 steps (val/masked_TEPE monitor) and
the dots remat policy + bf16 compute production knobs."""
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/repo")

from tests.test_raft_training import make_synthetic_evimo2  # noqa: E402


def main():
    root = Path(tempfile.mkdtemp(prefix="evimo2_drive_"))
    make_synthetic_evimo2(root / "data")
    shutil.copytree(root / "data/imo/eval/seq_a", root / "data/imo/train/seq_t")

    from motionpriorcmax_tpu.cli.main import main as cli_main
    rc = cli_main([
        "traj-train", "--config-dir", "config/trajectory_inference",
        "--workdir", str(root / "run"),
        "--max-steps", "4", "--log-every", "1", "--ckpt-every", "2",
        "--val-every", "2", "--val-batch-size", "1",
        "--event-capacity", "65536",
        "experiment=raft-spline_evimo2-300ms_ours-selfsup",
        "checkpoint=/unused",
        f"dataset.path={root / 'data'}",
        "training.batch_size=1",
        "model.corr_dtype=bfloat16",
        "model.compute_dtype=bfloat16",
        "model.remat_policy=dots",
        "model.remat_encoders=true",
        "model.num_iter.test=2",
    ])
    print("rc =", rc, flush=True)
    print((root / "run" / "scalars.jsonl").read_text()[-800:], flush=True)
    print("ckpts:", [p.name for p in (root / "run" / "checkpoints").iterdir()],
          flush=True)
    from motionpriorcmax_tpu.training.checkpoint import restore_raw_checkpoint
    tree, step = restore_raw_checkpoint(str(root / "run" / "checkpoints"),
                                        best=True)
    print("best-metric checkpoint step:", step, flush=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
