"""Image-panel logging: render + write the C23 panel for a tiny flow model."""

import numpy as np
import jax

from motionpriorcmax_tpu.losses import FocusLossConfig
from motionpriorcmax_tpu.training import TrajectoryNetConfig, create_train_state
from motionpriorcmax_tpu.training.loop import make_flow_render_fn
from motionpriorcmax_tpu.utils.image_logging import (ImagePanelLogger,
                                                     log_flow_epoch_images)

H, W, NBINS, M = 32, 48, 5, 128


def test_render_and_write_panel(tmp_path, rng):
    cfg = TrajectoryNetConfig(image_shape=(H, W), num_bins=NBINS,
                              num_basis=1, patch_size=4)
    loss_cfg = FocusLossConfig(image_shape=(H, W), num_bins=NBINS, num_knn=4,
                               polarity_aware_batching=False,
                               knn_block_size=64)
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    def make_sample(_):
        y = rng.uniform(0, H - 1, M); x = rng.uniform(0, W - 1, M)
        t = rng.uniform(0, 1, M)
        p = rng.integers(0, 2, M).astype(np.float32)
        b = np.clip((t * NBINS).astype(np.int32), 0, NBINS - 1)
        ev = np.stack([y, x, t, p, b, np.ones(M)], -1).astype(np.float32)
        return {
            "events": ev[None],
            "voxel": rng.normal(size=(1, NBINS, H, W)).astype(np.float32),
            "forward_flow": rng.normal(size=(1, 2, H, W)).astype(np.float32),
        }

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return i

    panel = ImagePanelLogger(str(tmp_path))
    render = make_flow_render_fn(state, cfg, loss_cfg)
    log_flow_epoch_images(panel, DS(), lambda samples: make_sample(samples[0]),
                          render, step=3, split="val/", n_samples=2)

    pngs = list((tmp_path / "images").glob("*.png"))
    names = {p.name for p in pngs}
    # 5 panel images x 2 samples.
    assert len(pngs) == 10, sorted(names)
    assert any("0_unwarped" in n for n in names)
    assert any("1_gt_iwe" in n for n in names)
    assert any("2_iwe" in n for n in names)
    assert any("4_flow" in n for n in names)
