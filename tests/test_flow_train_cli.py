"""End-to-end flow-train CLI drive on a synthetic DSEC tree.

Exercises the exact cmd_flow_train path (reference scripts/flow_training.py):
train + val providers, masked val flow-error, best-k checkpointing, and the
unconditionally-registered image-panel logging (round-1 gap: the callback was
built but never wired into the CLI)."""

import numpy as np
import pytest
import yaml

from motionpriorcmax_tpu.utils import save_flow_png
from tests.test_data_dsec import make_synthetic_dsec_sequence


def make_synthetic_dsec_val_sequence(root, name="zurich_city_05_b"):
    """A val-phase DSEC sequence: events + forward_timestamps.txt + GT flow
    PNGs with a validity channel (data/dsec.py:137-145, 208-213)."""
    rng = np.random.default_rng(7)
    seq = make_synthetic_dsec_sequence(root, name=name)
    flow_dir = seq / "flow/forward"
    flow_dir.mkdir(parents=True)
    with open(seq / "flow/forward_timestamps.txt", "w") as fh:
        fh.write("# from_timestamp_us, to_timestamp_us\n")
        fh.write("100000,200000\n")
        fh.write("200000,300000\n")
    for idx in (2, 4):
        flow = rng.normal(size=(2, 480, 640)).astype(np.float32) * 3
        valid = rng.uniform(size=(480, 640)) < 0.7
        save_flow_png(flow_dir / f"{idx:06d}.png", flow, valid)
    return seq


@pytest.mark.slow
def test_flow_train_cli_end_to_end(tmp_path):
    from motionpriorcmax_tpu.cli.main import main

    data = tmp_path / "dsec"
    data.mkdir()
    make_synthetic_dsec_sequence(data, name="zurich_city_04_d")
    make_synthetic_dsec_val_sequence(data)

    config = {
        "common": {"height": 480, "width": 640, "num_bins": 5,
                   "polarity_aware_batching": False, "patch_size": 8},
        "model": {"lr": 1e-4, "model_type": "default", "num_basis": 1,
                  "basis_type": "polynomial"},
        "loss": {"loss_name": "FOCUS", "num_tref": 1, "num_knn": 8,
                 "smooth_weight": 0.003, "lut_superpixel_size": 8,
                 "focus_loss_norm": "l1", "dist_norm": "l2",
                 "scale_iwe_by_dt": True, "mask_image_border": True,
                 "interpolation_scheme": "mean", "smooth_type": "on_flow_to_tref",
                 "knn_method": "softmax"},
        "data": {"dataset": "DSEC", "data_path": str(data), "num_workers": 2,
                 "batch_size": 2, "norm_type": "mean_std", "quantile": 0},
        "trainer": {"max_epochs": 1},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    workdir = tmp_path / "run"

    rc = main(["flow-train", "--config", str(cfg_path),
               "--workdir", str(workdir), "--event-capacity", "8192",
               "--log-every", "1"])
    assert rc == 0

    # Scalars: train loss + MASKED val flow metrics.
    log = (workdir / "scalars.jsonl").read_text()
    assert "train_losses/total" in log
    assert "val_losses/EPE" in log
    # Best-k checkpoint retained on val EPE.
    assert any((workdir / "checkpoints").iterdir())
    # The C23 image panel was rendered into workdir/images (5 samples; the
    # val set has 2, np.linspace repeats indices -> >= 2 distinct panels).
    pngs = list((workdir / "images").glob("*.png"))
    assert pngs, "image logging produced no panels"
    names = {p.name for p in pngs}
    assert any("0_unwarped" in n for n in names)
    assert any("2_iwe" in n for n in names)
    assert any("3_gt_flow" in n for n in names)
    assert any("4_flow" in n for n in names)
