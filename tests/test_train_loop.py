"""Integration smoke: full flow-training loop on a synthetic DSEC tree."""

import numpy as np
import pytest

from motionpriorcmax_tpu.data import DsecSequence
from motionpriorcmax_tpu.data.loader import DataLoader
from motionpriorcmax_tpu.losses import FocusLossConfig
from motionpriorcmax_tpu.training import TrajectoryNetConfig
from motionpriorcmax_tpu.training.loop import train_flow
from tests.test_data_dsec import make_synthetic_dsec_sequence


class _VoxelizingView:
    """Adds a device-free 'voxel' via the host twin so the step's input
    contract (batch['voxel']) is met on CPU."""

    def __init__(self, seq, num_bins, hw):
        self.seq = seq
        self.num_bins = num_bins
        self.hw = hw

    def __len__(self):
        return len(self.seq)

    def __getitem__(self, i):
        from motionpriorcmax_tpu.data.host_ops import voxel_grid_numpy

        s = self.seq[i]
        ev = s["events"]
        h, w = self.hw
        # Downscale coords into the tiny test resolution.
        ev = ev.copy()
        ev[:, 0] *= (h - 1) / 479.0
        ev[:, 1] *= (w - 1) / 639.0
        s["events"] = ev
        t_us = (ev[:, 2] * 1e5).astype(np.int64)
        s["voxel"] = voxel_grid_numpy(ev[:, 1], ev[:, 0], ev[:, 3], t_us,
                                      self.num_bins, h, w)
        # Rescale bins for the smaller bin count.
        s["events"][:, 4] = np.clip(ev[:, 2] * self.num_bins, 0,
                                    self.num_bins - 1).astype(np.int32)
        return s


@pytest.mark.slow
def test_train_flow_smoke(tmp_path, rng):
    h, w, nbins = 32, 48, 5
    seq_path = make_synthetic_dsec_sequence(tmp_path / "data")
    seq = DsecSequence(seq_path, phase="train", num_bins=nbins)
    ds = _VoxelizingView(seq, nbins, (h, w))

    loader = DataLoader(ds, batch_size=2, capacity=2048, shuffle=True,
                        num_workers=2)
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins,
                              num_basis=1, patch_size=4)
    loss_cfg = FocusLossConfig(
        image_shape=(h, w), num_bins=nbins, num_knn=4,
        polarity_aware_batching=False, knn_block_size=64)

    from motionpriorcmax_tpu.parallel import make_mesh

    out = train_flow(cfg, loss_cfg, loader, None, str(tmp_path / "run"),
                     max_epochs=1, log_every=1, mesh=make_mesh(data=2, event=1))
    assert out["steps"] >= 1
    # Scalars were logged.
    log = (tmp_path / "run" / "scalars.jsonl").read_text().strip()
    assert "train_losses/total" in log
    # A checkpoint was written.
    assert any((tmp_path / "run" / "checkpoints").iterdir())


@pytest.mark.slow
def test_train_flow_bucketed_capacities(tmp_path, rng):
    """Bucketed collate feeds the loop batches of different static event
    capacities; the per-bucket jit cache (loop.py step_for) must absorb the
    shape changes within one epoch."""
    h, w, nbins = 32, 48, 5
    seq_path = make_synthetic_dsec_sequence(tmp_path / "data")
    seq = DsecSequence(seq_path, phase="train", num_bins=nbins)
    ds = _VoxelizingView(seq, nbins, (h, w))

    loader = DataLoader(ds, batch_size=2, capacity=2048, shuffle=True,
                        num_workers=2, capacity_buckets=(256, 512, 2048))
    seen = set()
    for batch in loader:
        seen.add(batch["events"].shape[1])
    assert seen <= {256, 512, 2048} and seen

    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins,
                              num_basis=1, patch_size=4)
    loss_cfg = FocusLossConfig(
        image_shape=(h, w), num_bins=nbins, num_knn=4,
        polarity_aware_batching=False, knn_block_size=64)

    from motionpriorcmax_tpu.parallel import make_mesh

    out = train_flow(cfg, loss_cfg, loader, None, str(tmp_path / "run"),
                     max_epochs=1, log_every=1,
                     mesh=make_mesh(data=2, event=1))
    assert out["steps"] >= 1
