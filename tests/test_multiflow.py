"""MultiFlow loader tests on a synthetic on-disk sequence."""

import numpy as np
import pytest


def make_synthetic_multiflow(root, split="train", n_events=3000):
    import h5py

    from motionpriorcmax_tpu.utils.png16 import write_png16_rgb

    seq = root / split / "seq_0001"
    (seq / "events").mkdir(parents=True)
    (seq / "flow").mkdir()
    (seq / "images").mkdir()

    rng = np.random.default_rng(7)
    t = np.sort(rng.integers(0, 1_000_000, n_events)).astype("int64")
    with h5py.File(seq / "events/events.h5", "w") as f:
        f.create_dataset("t", data=t)
        f.create_dataset("x", data=rng.integers(0, 512, n_events).astype("uint16"))
        f.create_dataset("y", data=rng.integers(0, 384, n_events).astype("uint16"))
        f.create_dataset("p", data=rng.integers(0, 2, n_events).astype("uint8"))

    for ts in range(500_000, 950_000, 100_000):
        with h5py.File(seq / "flow" / f"{ts:07d}.h5", "w") as f:
            f.create_dataset(
                "flow", data=rng.normal(size=(384, 512, 2)).astype(np.float32))

    for ts in (400_000, 900_000):
        img = rng.integers(0, 65535, (384, 512, 3)).astype(np.uint16)
        write_png16_rgb(seq / "images" / f"{ts:07d}.png", img)
    return root


def test_multiflow_sample(tmp_path):
    from motionpriorcmax_tpu.data.multiflow import MultiflowDatasubset

    make_synthetic_multiflow(tmp_path)
    ds = MultiflowDatasubset(tmp_path / "train", num_bins_context=41,
                             flow_every_n_ms=100, load_voxel_grid=False,
                             provide_raw_events=True)
    assert len(ds) == 1
    s = ds[0]
    assert s["ev_repr"].shape == (65, 384, 512)
    assert s["flow"].shape == (5, 2, 384, 512)
    ts = s["flow_timestamps"]
    assert abs(ts[-1] - 1.0) < 1e-6 and ts[0] > 0
    assert len(s["img"]) == 2 and s["img"][0].shape == (3, 384, 512)
    ev = s["events"]
    assert ev.shape[1] == 5
    assert ev[:, 4].max() <= 40
    assert s["bin_meta"]["nbins_correlation"] == 25


def test_multiflow_voxel_cache(tmp_path):
    from motionpriorcmax_tpu.data.multiflow import MultiflowDatasubset

    make_synthetic_multiflow(tmp_path)
    ds = MultiflowDatasubset(tmp_path / "train", num_bins_context=6,
                             flow_every_n_ms=100, load_voxel_grid=True)
    v1 = ds[0]["ev_repr"]
    cache = list((tmp_path / "train" / "seq_0001" / "events").glob("voxel_grid_*.h5"))
    assert len(cache) == 1, cache
    v2 = ds[0]["ev_repr"]  # second read comes from the cache
    np.testing.assert_allclose(v1, v2, atol=1e-6)
