"""Drive the remaining two CLI entry points on the REAL TPU:
dsec-infer (torch .pth ingest -> UNet -> 60px cap -> 16-bit PNGs) and
traj-val (RAFT-Spline validation, masked TEPE/TAE/T3PE printout)."""
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, "/root/repo")


def dsec_infer():
    import torch
    from tests.test_checkpoint_convert import make_reference_unet
    from tests.test_data_dsec import make_synthetic_dsec_sequence
    from motionpriorcmax_tpu.cli.main import main as cli_main
    from motionpriorcmax_tpu.utils import load_flow_png

    root = Path(tempfile.mkdtemp(prefix="dsec_infer_"))
    seq_name = "zurich_city_99_z"
    data_root = root / "dsec"
    (data_root / "test").mkdir(parents=True)
    make_synthetic_dsec_sequence(data_root / "test", name=seq_name,
                                 n_events=100000)
    ts_dir = root / "timestamps"
    ts_dir.mkdir()
    with open(ts_dir / f"{seq_name}.csv", "w") as fh:
        fh.write("from_timestamp_us,to_timestamp_us,file_index\n")
        fh.write("100000,200000,42\n")
        fh.write("200000,300000,44\n")
    tmodel = make_reference_unet(15, 2)
    ckpt = root / "model.pth"
    torch.save(tmodel.state_dict(), ckpt)
    config = {
        "common": {"height": 480, "width": 640, "num_bins": 15,
                   "patch_size": 4},
        "model": {"num_basis": 1, "basis_type": "polynomial", "lr": 1e-4,
                  "model_type": "default", "ckpt_path": str(ckpt)},
        "data": {"root_dir": str(data_root), "norm_type": "mean_std"},
        "output_dir": str(root / "out"),
    }
    cfg_path = root / "infer.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    rc = cli_main(["dsec-infer", "--config", str(cfg_path),
                   "--timestamp-dir", str(ts_dir)])
    pngs = sorted((root / "out").rglob("*.png"))
    flow, _ = load_flow_png(pngs[0])
    mag = float(np.sqrt(flow[0] ** 2 + flow[1] ** 2).max())
    print(f"dsec-infer: rc={rc} pngs={[p.name for p in pngs]} "
          f"max|flow|={mag:.2f} finite={bool(np.isfinite(flow).all())}",
          flush=True)
    shutil.rmtree(root, ignore_errors=True)
    assert rc == 0 and len(pngs) == 2 and mag <= 60.02


def traj_val():
    from tests.test_multiflow import make_synthetic_multiflow
    from motionpriorcmax_tpu.cli.main import main as cli_main

    root = Path(tempfile.mkdtemp(prefix="mf_val_"))
    make_synthetic_multiflow(root / "mf", split="test")
    rc = cli_main([
        "traj-val", "--config-dir", "config/trajectory_inference",
        "checkpoint=/unused",
        "dataset=multiflow_500ms",
        f"dataset.path={root / 'mf'}",
        "dataset.load_voxel_grid=false",
        "batch_size=1",
        "model.bezier_degree=10",
        "model.num_bins.correlation=25",
        "model.correlation.ev.target_indices=[20, 40]",
        "model.correlation.ev.levels=[1, 2]",
        "model.use_boundary_images=true",
    ])
    print(f"traj-val: rc={rc}", flush=True)
    shutil.rmtree(root, ignore_errors=True)
    assert rc == 0


if __name__ == "__main__":
    dsec_infer()
    traj_val()
