"""End-to-end dsec-infer CLI test: torch .pth -> converted UNet -> benchmark
PNGs on a synthetic test sequence."""

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

from tests.test_checkpoint_convert import make_reference_unet
from tests.test_data_dsec import make_synthetic_dsec_sequence


@pytest.mark.slow
def test_dsec_infer_end_to_end(tmp_path):
    from motionpriorcmax_tpu.cli.main import main
    from motionpriorcmax_tpu.utils import load_flow_png

    # Synthetic test sequence + timestamp CSV.
    seq_name = "zurich_city_99_z"
    data_root = tmp_path / "dsec"
    (data_root / "test").mkdir(parents=True)
    make_synthetic_dsec_sequence(data_root / "test", name=seq_name)

    ts_dir = tmp_path / "timestamps"
    ts_dir.mkdir()
    with open(ts_dir / f"{seq_name}.csv", "w") as fh:
        fh.write("from_timestamp_us,to_timestamp_us,file_index\n")
        fh.write("100000,200000,42\n")
        fh.write("200000,300000,44\n")

    # Reference-format checkpoint.
    tmodel = make_reference_unet(15, 2)
    ckpt = tmp_path / "model.pth"
    torch.save(tmodel.state_dict(), ckpt)

    config = {
        "common": {"height": 480, "width": 640, "num_bins": 15,
                   "patch_size": 4},
        "model": {"num_basis": 1, "basis_type": "polynomial", "lr": 1e-4,
                  "model_type": "default", "ckpt_path": str(ckpt)},
        "data": {"root_dir": str(data_root), "norm_type": "mean_std"},
        "output_dir": str(tmp_path / "out"),
    }
    cfg_path = tmp_path / "infer.yaml"
    cfg_path.write_text(yaml.safe_dump(config))

    rc = main(["dsec-infer", "--config", str(cfg_path),
               "--timestamp-dir", str(ts_dir)])
    assert rc == 0

    pngs = sorted((tmp_path / "out").rglob("*.png"))
    assert len(pngs) == 2, pngs
    assert pngs[0].name == "000042.png"
    flow, _ = load_flow_png(pngs[0])
    assert flow.shape == (2, 480, 640)
    mag = np.sqrt(flow[0] ** 2 + flow[1] ** 2)
    assert mag.max() <= 60.0 + 0.02  # magnitude cap (+png quantization)
    assert np.isfinite(flow).all()


@pytest.mark.slow
def test_dsec_infer_from_own_training(tmp_path):
    """The full train->submit loop with zero torch in it: one flow-train
    epoch on a synthetic DSEC tree, then dsec-infer restores the resulting
    best orbax checkpoint and writes benchmark PNGs; the extract-weights
    npz detour produces identical flow maps (reference §3.1+§3.4 pipeline,
    scripts/extract_weights_from_checkpoint.py:7-22 ->
    scripts/dsec_inference.py:43-55)."""
    from motionpriorcmax_tpu.cli.main import main
    from motionpriorcmax_tpu.utils import load_flow_png
    from tests.test_flow_train_cli import make_synthetic_dsec_val_sequence

    data = tmp_path / "dsec"
    data.mkdir()
    make_synthetic_dsec_sequence(data, name="zurich_city_04_d")
    make_synthetic_dsec_val_sequence(data)

    train_cfg = {
        "common": {"height": 480, "width": 640, "num_bins": 5,
                   "polarity_aware_batching": False, "patch_size": 8},
        "model": {"lr": 1e-4, "model_type": "default", "num_basis": 1,
                  "basis_type": "polynomial"},
        "loss": {"loss_name": "FOCUS", "num_tref": 1, "num_knn": 8,
                 "smooth_weight": 0.003, "lut_superpixel_size": 8,
                 "focus_loss_norm": "l1", "dist_norm": "l2",
                 "scale_iwe_by_dt": True, "mask_image_border": True,
                 "interpolation_scheme": "mean",
                 "smooth_type": "on_flow_to_tref", "knn_method": "softmax"},
        "data": {"dataset": "DSEC", "data_path": str(data), "num_workers": 2,
                 "batch_size": 2, "norm_type": "mean_std", "quantile": 0},
        "trainer": {"max_epochs": 1},
    }
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(train_cfg))
    workdir = tmp_path / "run"
    rc = main(["flow-train", "--config", str(cfg_path),
               "--workdir", str(workdir), "--event-capacity", "8192",
               "--log-every", "10"])
    assert rc == 0
    ckpt_dir = workdir / "checkpoints"
    assert any(ckpt_dir.iterdir())

    # Synthetic test sequence + timestamp CSV for inference.
    seq_name = "zurich_city_99_z"
    (data / "test").mkdir()
    make_synthetic_dsec_sequence(data / "test", name=seq_name)
    ts_dir = tmp_path / "timestamps"
    ts_dir.mkdir()
    with open(ts_dir / f"{seq_name}.csv", "w") as fh:
        fh.write("from_timestamp_us,to_timestamp_us,file_index\n")
        fh.write("100000,200000,7\n")

    def run_infer(ckpt_path, out_name):
        infer_cfg = {
            "common": {"height": 480, "width": 640, "num_bins": 5,
                       "patch_size": 8},
            "model": {"num_basis": 1, "basis_type": "polynomial", "lr": 1e-4,
                      "model_type": "default", "ckpt_path": str(ckpt_path)},
            "data": {"root_dir": str(data), "norm_type": "mean_std"},
            "output_dir": str(tmp_path / out_name),
        }
        p = tmp_path / f"{out_name}.yaml"
        p.write_text(yaml.safe_dump(infer_cfg))
        assert main(["dsec-infer", "--config", str(p),
                     "--timestamp-dir", str(ts_dir)]) == 0
        pngs = sorted((tmp_path / out_name).rglob("*.png"))
        assert len(pngs) == 1 and pngs[0].name == "000007.png"
        flow, _ = load_flow_png(pngs[0])
        assert flow.shape == (2, 480, 640) and np.isfinite(flow).all()
        assert np.sqrt(flow[0] ** 2 + flow[1] ** 2).max() <= 60.0 + 0.02
        return flow

    flow_orbax = run_infer(ckpt_dir, "out_orbax")

    # extract-weights npz detour must reproduce the same flow maps.
    npz_path = tmp_path / "weights.npz"
    assert main(["extract-weights", str(ckpt_dir), str(npz_path)]) == 0
    flow_npz = run_infer(npz_path, "out_npz")
    np.testing.assert_allclose(flow_npz, flow_orbax, atol=1e-6)
