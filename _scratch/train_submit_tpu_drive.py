"""Round-4 train->submit loop on the REAL TPU: one flow-train epoch on a
synthetic DSEC tree, then dsec-infer restores the resulting BEST orbax
checkpoint and writes benchmark PNGs; the extract-weights npz detour must
reproduce identical flow maps.  Zero torch in the loop (the reference's
§3.1+§3.4 pipeline)."""
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, "/root/repo")

from tests.test_data_dsec import make_synthetic_dsec_sequence  # noqa: E402
from tests.test_flow_train_cli import make_synthetic_dsec_val_sequence  # noqa: E402


def main():
    from motionpriorcmax_tpu.cli.main import main as cli_main
    from motionpriorcmax_tpu.utils import load_flow_png

    root = Path(tempfile.mkdtemp(prefix="train_submit_"))
    data = root / "dsec"
    data.mkdir()
    make_synthetic_dsec_sequence(data, name="zurich_city_04_d",
                                 n_events=200000)
    make_synthetic_dsec_val_sequence(data)

    train_cfg = {
        "common": {"height": 480, "width": 640, "num_bins": 15,
                   "polarity_aware_batching": False, "patch_size": 4},
        "model": {"lr": 1e-4, "model_type": "default", "num_basis": 1,
                  "basis_type": "polynomial", "compute_dtype": "bfloat16"},
        "loss": {"loss_name": "FOCUS", "num_tref": 1, "num_knn": 32,
                 "smooth_weight": 0.003, "lut_superpixel_size": 4,
                 "focus_loss_norm": "l1", "dist_norm": "l2",
                 "scale_iwe_by_dt": True, "mask_image_border": True,
                 "interpolation_scheme": "mean",
                 "smooth_type": "on_flow_to_tref", "knn_method": "softmax"},
        "data": {"dataset": "DSEC", "data_path": str(data), "num_workers": 2,
                 "batch_size": 2, "norm_type": "mean_std", "quantile": 0},
        "trainer": {"max_epochs": 1},
    }
    cfg_path = root / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(train_cfg))
    workdir = root / "run"
    rc = cli_main(["flow-train", "--config", str(cfg_path),
                   "--workdir", str(workdir),
                   "--event-capacity", str(1 << 18), "--log-every", "5"])
    print("flow-train rc:", rc, flush=True)
    ckpt_dir = workdir / "checkpoints"

    seq_name = "zurich_city_99_z"
    (data / "test").mkdir()
    make_synthetic_dsec_sequence(data / "test", name=seq_name,
                                 n_events=200000)
    ts_dir = root / "timestamps"
    ts_dir.mkdir()
    with open(ts_dir / f"{seq_name}.csv", "w") as fh:
        fh.write("from_timestamp_us,to_timestamp_us,file_index\n")
        fh.write("100000,200000,7\n")

    def run_infer(ckpt_path, out_name):
        infer_cfg = {
            "common": {"height": 480, "width": 640, "num_bins": 15,
                       "patch_size": 4},
            "model": {"num_basis": 1, "basis_type": "polynomial",
                      "lr": 1e-4, "model_type": "default",
                      "ckpt_path": str(ckpt_path)},
            "data": {"root_dir": str(data), "norm_type": "mean_std"},
            "output_dir": str(root / out_name),
        }
        p = root / f"{out_name}.yaml"
        p.write_text(yaml.safe_dump(infer_cfg))
        rc = cli_main(["dsec-infer", "--config", str(p),
                       "--timestamp-dir", str(ts_dir)])
        assert rc == 0
        pngs = sorted((root / out_name).rglob("*.png"))
        assert len(pngs) == 1 and pngs[0].name == "000007.png", pngs
        flow, _ = load_flow_png(pngs[0])
        mag = np.sqrt(flow[0] ** 2 + flow[1] ** 2)
        print(f"{out_name}: flow {flow.shape} max|v|={mag.max():.2f}",
              flush=True)
        return flow

    flow_orbax = run_infer(ckpt_dir, "out_orbax")
    npz_path = root / "weights.npz"
    assert cli_main(["extract-weights", str(ckpt_dir), str(npz_path)]) == 0
    flow_npz = run_infer(npz_path, "out_npz")
    np.testing.assert_allclose(flow_npz, flow_orbax, atol=1e-6)
    print("train->submit loop OK on TPU: npz detour identical", flush=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
