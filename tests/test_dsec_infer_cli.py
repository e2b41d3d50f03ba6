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
