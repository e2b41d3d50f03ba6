"""End-to-end flow-train CLI drive on the REAL TPU at production config
(15 bins, lut 4) over a synthetic DSEC tree — exercises the full
loader -> cell-sort -> train_step(vpu interp) -> val -> ckpt -> image-panel
path exactly as a user would."""
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, "/root/repo")

from motionpriorcmax_tpu.utils import save_flow_png  # noqa: E402
from tests.test_data_dsec import make_synthetic_dsec_sequence  # noqa: E402
from tests.test_flow_train_cli import make_synthetic_dsec_val_sequence  # noqa: E402


def main():
    root = Path(tempfile.mkdtemp(prefix="dsec_drive_"))
    data = root / "dsec"
    data.mkdir()
    make_synthetic_dsec_sequence(data, name="zurich_city_04_d",
                                 n_events=200000)
    make_synthetic_dsec_val_sequence(data)

    config = {
        "common": {"height": 480, "width": 640, "num_bins": 15,
                   "polarity_aware_batching": False, "patch_size": 4},
        "model": {"lr": 1e-4, "model_type": "default", "num_basis": 1,
                  "basis_type": "polynomial"},
        "loss": {"loss_name": "FOCUS", "num_tref": 1, "num_knn": 32,
                 "smooth_weight": 0.003, "lut_superpixel_size": 4,
                 "focus_loss_norm": "l1", "dist_norm": "l2",
                 "scale_iwe_by_dt": True, "mask_image_border": True,
                 "interpolation_scheme": "mean",
                 "smooth_type": "on_flow_to_tref",
                 "knn_method": "softmax"},
        "data": {"dataset": "DSEC", "data_path": str(data),
                 "num_workers": 2, "batch_size": 2,
                 "norm_type": "mean_std", "quantile": 0},
        "trainer": {"max_epochs": 2},
    }
    cfg_path = root / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    workdir = root / "run"

    from motionpriorcmax_tpu.cli.main import main as cli_main
    rc = cli_main(["flow-train", "--config", str(cfg_path),
                   "--workdir", str(workdir), "--event-capacity", "262144",
                   "--log-every", "1"])
    print("rc =", rc, flush=True)
    print((workdir / "scalars.jsonl").read_text()[-2000:], flush=True)
    print("ckpts:", [p.name for p in (workdir / "checkpoints").iterdir()],
          flush=True)
    print("panels:", len(list((workdir / "images").glob("*.png"))), flush=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
