"""Flow PNG encode/decode roundtrip + magnitude cap + visualization."""

import numpy as np

from motionpriorcmax_tpu.utils import (
    save_flow_png, load_flow_png, scale_optical_flow, flow_to_rgb, normalize_iwe)


def test_flow_png_roundtrip(tmp_path, rng):
    flow = rng.uniform(-50, 50, (2, 12, 16)).astype(np.float32)
    path = tmp_path / "000001.png"
    save_flow_png(path, flow, valid=np.ones((12, 16), bool))
    got, valid = load_flow_png(path)
    # Quantization step of the encoding is 1/128.
    np.testing.assert_allclose(got, flow, atol=1.0 / 128 + 1e-6)
    assert valid.all()


def test_scale_optical_flow():
    flow = np.zeros((2, 4, 4), np.float32)
    flow[0, 0, 0] = 120.0  # magnitude 120 > 60 -> scaled to 60
    flow[1, 1, 1] = 30.0   # below cap -> untouched
    out = scale_optical_flow(flow, 60)
    assert np.isclose(out[0, 0, 0], 60.0)
    assert np.isclose(out[1, 1, 1], 30.0)


def test_flow_to_rgb_shapes(rng):
    flow = rng.normal(size=(2, 8, 10)).astype(np.float32)
    rgb = flow_to_rgb(flow)
    assert rgb.shape == (8, 10, 3) and rgb.dtype == np.uint8


def test_normalize_iwe(rng):
    img = rng.uniform(size=(3, 5, 5)).astype(np.float32)
    out = normalize_iwe(img)
    assert out.dtype == np.uint8
    assert out.max() >= 250
