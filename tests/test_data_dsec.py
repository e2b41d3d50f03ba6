"""DSEC pipeline tests on a synthetic on-disk sequence (no real data needed)."""

import numpy as np
import pytest

from motionpriorcmax_tpu.data import (
    DsecSequence, pad_events, collate_fixed_capacity)
from motionpriorcmax_tpu.data.collate import round_up_capacity


def make_synthetic_dsec_sequence(root, name="zurich_city_99_z", n_events=5000,
                                 duration_ms=400):
    """Create a minimal DSEC-format sequence directory."""
    import h5py

    seq = root / name
    (seq / "events/left").mkdir(parents=True)
    (seq / "images").mkdir(parents=True)

    rng = np.random.default_rng(42)
    t = np.sort(rng.integers(0, duration_ms * 1000, n_events)).astype("int64")
    x = rng.integers(0, 640, n_events).astype("uint16")
    y = rng.integers(0, 480, n_events).astype("uint16")
    p = rng.integers(0, 2, n_events).astype("uint8")

    ms_to_idx = np.searchsorted(t, np.arange(duration_ms + 1) * 1000).astype("int64")

    with h5py.File(seq / "events/left/events.h5", "w") as f:
        f.create_dataset("events/t", data=t)
        f.create_dataset("events/x", data=x)
        f.create_dataset("events/y", data=y)
        f.create_dataset("events/p", data=p)
        f.create_dataset("ms_to_idx", data=ms_to_idx)
        f.create_dataset("t_offset", data=np.int64(0))

    # Identity rectify map.
    gx, gy = np.meshgrid(np.arange(640), np.arange(480))
    rect = np.stack([gx, gy], axis=-1).astype("float32")
    with h5py.File(seq / "events/left/rectify_map.h5", "w") as f:
        f.create_dataset("rectify_map", data=rect)

    # Image timestamps every 50 ms -> train windows [::2][1:-1].
    ts_img = (np.arange(0, duration_ms + 1, 50) * 1000).astype("int64")
    np.savetxt(seq / "images/timestamps.txt", ts_img, fmt="%d")
    return seq


def test_dsec_sequence_train(tmp_path):
    seq_path = make_synthetic_dsec_sequence(tmp_path)
    seq = DsecSequence(seq_path, phase="train", num_bins=5)
    assert len(seq) >= 1
    sample = seq[0]
    ev = sample["events"]
    assert ev.ndim == 2 and ev.shape[1] == 5
    # (y, x, t, p, bin): t normalized to [0, 1]; bins in range.
    assert ev[:, 2].min() >= 0 and ev[:, 2].max() <= 1
    assert ev[:, 4].min() >= 0 and ev[:, 4].max() <= 4
    assert ev[:, 0].max() < 480 and ev[:, 1].max() < 640
    # Events within the window only (100 ms).
    t0, t1 = sample["timestamp"]
    assert t1 - t0 == 100_000


def test_dsec_sequence_polarity_split(tmp_path):
    seq_path = make_synthetic_dsec_sequence(tmp_path)
    seq = DsecSequence(seq_path, phase="train", num_bins=5,
                       polarity_aware_batching=True)
    s = seq[0]
    assert (s["pos_events"][:, 3] == 1).all()
    assert (s["neg_events"][:, 3] == 0).all()


def test_event_slicer_window_semantics(tmp_path):
    import h5py

    seq_path = make_synthetic_dsec_sequence(tmp_path)
    from motionpriorcmax_tpu.data.dsec import EventSlicer

    with h5py.File(seq_path / "events/left/events.h5", "r") as f:
        slicer = EventSlicer(f)
        t_all = np.asarray(f["events/t"])
        ev = slicer.get_events(50_000, 150_000)
        # t0 <= t < t1 exactly (loader.py:316).
        assert (ev["t"] >= 50_000).all() and (ev["t"] < 150_000).all()
        want = ((t_all >= 50_000) & (t_all < 150_000)).sum()
        assert len(ev["t"]) == want


def test_pad_events_and_collate():
    ev_a = np.random.default_rng(0).uniform(size=(10, 5)).astype(np.float32)
    padded = pad_events(ev_a, 16)
    assert padded.shape == (16, 6)
    assert padded[:10, 5].sum() == 10 and padded[10:, 5].sum() == 0
    # Truncation at capacity.
    trunc = pad_events(ev_a, 4)
    assert trunc.shape == (4, 6) and trunc[:, 5].sum() == 4

    samples = [
        {"events": ev_a, "voxel": np.zeros((5, 4, 4), np.float32)},
        {"events": ev_a[:6], "voxel": np.ones((5, 4, 4), np.float32)},
    ]
    batch = collate_fixed_capacity(samples, capacity=16)
    assert batch["events"].shape == (2, 16, 6)
    assert batch["voxel"].shape == (2, 5, 4, 4)


def test_collate_polarity_packs_pos_first():
    rng = np.random.default_rng(1)
    pos = rng.uniform(size=(7, 5)).astype(np.float32); pos[:, 3] = 1
    neg = rng.uniform(size=(5, 5)).astype(np.float32); neg[:, 3] = 0
    batch = collate_fixed_capacity(
        [{"pos_events": pos, "neg_events": neg}], capacity=32,
        polarity_aware=True, pos_capacity=16)
    assert batch["num_pos_events"] == 16
    ev = batch["events"][0]
    assert ev.shape == (32, 6)
    # First 16 rows: positives then padding; last 16: negatives then padding.
    assert (ev[:7, 3] == 1).all() and ev[7:16, 5].sum() == 0
    assert (ev[16:21, 3] == 0).all() and (ev[16:21, 5] == 1).all()


def test_round_up_capacity():
    buckets = (1024, 4096, 16384)
    assert round_up_capacity(10, buckets) == 1024
    assert round_up_capacity(2000, buckets) == 4096
    assert round_up_capacity(10**6, buckets) == 16384


def test_collate_capacity_buckets():
    rng = np.random.default_rng(2)
    mk = lambda n: rng.uniform(size=(n, 5)).astype(np.float32)
    buckets = (64, 256, 1024)

    # Batch max (200) picks the 256 bucket, not full capacity.
    batch = collate_fixed_capacity([{"events": mk(200)}, {"events": mk(30)}],
                                   capacity=1024, capacity_buckets=buckets)
    assert batch["events"].shape == (2, 256, 6)
    assert batch["events"][0, :, 5].sum() == 200
    assert batch["events"][1, :, 5].sum() == 30

    # Overflow beyond the last bucket tail-truncates (pad_events contract).
    batch = collate_fixed_capacity([{"events": mk(3000)}], capacity=1024,
                                   capacity_buckets=buckets)
    assert batch["events"].shape == (1, 1024, 6)
    assert batch["events"][0, :, 5].sum() == 1024

    # Polarity-aware: per-polarity sub-buckets (b // 2), positives first.
    pos = mk(100); pos[:, 3] = 1
    neg = mk(20); neg[:, 3] = 0
    batch = collate_fixed_capacity(
        [{"pos_events": pos, "neg_events": neg}], capacity=1024,
        polarity_aware=True, capacity_buckets=buckets)
    assert batch["num_pos_events"] == 128          # round_up(100, b//2)
    ev = batch["events"][0]
    assert ev.shape == (128 + 32, 6)               # pos 128 + neg 32 buckets
    assert (ev[:100, 3] == 1).all() and ev[100:128, 5].sum() == 0
    assert (ev[128:148, 5] == 1).all() and (ev[128:148, 3] == 0).all()


def test_collate_lut_cell_sort():
    """lut_cell_sort_params sorts events by y-major LUT cell per polarity
    segment and emits consistent 'lut_cell_ends' boundaries."""
    from motionpriorcmax_tpu.data.host_ops import lut_cell_keys

    rng = np.random.default_rng(3)
    h, w, nbins, s = 32, 48, 5, 4

    def mk(n):
        ev = np.zeros((n, 5), np.float32)
        ev[:, 0] = rng.uniform(0, h - 1, n)
        ev[:, 1] = rng.uniform(0, w - 1, n)
        ev[:, 2] = np.sort(rng.uniform(0, 1, n))
        ev[:, 3] = rng.integers(0, 2, n)
        ev[:, 4] = rng.integers(0, nbins, n)
        return ev

    batch = collate_fixed_capacity(
        [{"events": mk(200)}, {"events": mk(150)}], capacity=256,
        lut_cell_sort_params=((h, w), nbins, s))
    ev = batch["events"]
    ends = batch["lut_cell_ends"]
    hq, wq = -(-h // s), -(-w // s)
    assert ends.shape == (2, nbins * hq * wq)
    for i in range(2):
        keys, ncells = lut_cell_keys(ev[i], (h, w), nbins, s)
        assert (np.diff(keys) >= 0).all()
        np.testing.assert_array_equal(
            ends[i], np.searchsorted(keys, np.arange(ncells), side="right"))
        # Sorting preserves the multiset of valid rows.
        assert int(ev[i, :, 5].sum()) == (200 if i == 0 else 150)

    # Polarity-aware: each half sorted separately, boundaries segmented.
    pos, neg = mk(90), mk(110)
    pos[:, 3], neg[:, 3] = 1.0, 0.0
    sample = {"pos_events": pos, "neg_events": neg}
    batch = collate_fixed_capacity(
        [sample], capacity=256, polarity_aware=True,
        lut_cell_sort_params=((h, w), nbins, s))
    npos = batch["num_pos_events"]
    ev = batch["events"][0]
    ends = batch["lut_cell_ends"][0]
    assert ends.shape == (2 * nbins * hq * wq,)
    k1, _ = lut_cell_keys(ev[:npos], (h, w), nbins, s)
    k2, _ = lut_cell_keys(ev[npos:], (h, w), nbins, s)
    assert (np.diff(k1) >= 0).all() and (np.diff(k2) >= 0).all()
    assert (np.diff(ends) >= 0).all()
    # Positives stayed in the first segment.
    assert (ev[:npos, 3][ev[:npos, 5] > 0] == 1).all()
