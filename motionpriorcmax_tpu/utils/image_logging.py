"""Epoch-end image logging: unwarped events, predicted IWE, flow maps, GT IWE.

Reference: src/utils/logging.py (C23) — DsecImageLoggingCallback logs 5
evenly-spaced samples per epoch: the unwarped event image, the predicted IWE,
the flow colorization, the GT flow, and the GT-flow-warped IWE (a visual
sanity check that warping with GT flow sharpens the image).

TPU-native shape: a pure function that takes the step functions and a
dataset, renders the panel for N samples, and hands images to a writer
callback (TensorBoard writer or a PNG dump into the workdir).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np

from .visualization import flow_to_rgb, normalize_iwe

N_SAMPLES = 5


class ImagePanelLogger:
    """Renders and writes the C23 image panel for flow training runs."""

    def __init__(self, workdir: str, tb_writer=None):
        self.dir = Path(workdir) / "images"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.tb = tb_writer

    def _write(self, name: str, step: int, image_hwc: np.ndarray) -> None:
        """image_hwc: [H, W, 3] uint8 or [H, W] uint8."""
        if image_hwc.ndim == 2:
            image_hwc = np.stack([image_hwc] * 3, axis=-1)
        if self.tb is not None:
            self.tb.add_image(name.replace("/", "_"), image_hwc, step,
                              dataformats="HWC")
        try:
            import imageio.v2 as iio

            iio.imwrite(self.dir / f"{step:06d}_{name.replace('/', '_')}.png",
                        image_hwc)
        except Exception:
            pass

    def log_panel(self, step: int, split: str, index: int, *,
                  unwarped_iwe: Optional[np.ndarray] = None,
                  pred_iwe: Optional[np.ndarray] = None,
                  gt_iwe: Optional[np.ndarray] = None,
                  pred_flow: Optional[np.ndarray] = None,
                  gt_flow: Optional[np.ndarray] = None) -> None:
        """Write one sample's panel.  Names/order match the reference
        (logging.py:58-120): 0_unwarped, 1_gt_iwe, 2_iwe, 3_gt_flow, 4_flow.
        IWE images are min-max normalized and inverted (:146)."""
        prefix = f"{index:02d}_{split}"
        if unwarped_iwe is not None:
            self._write(f"{prefix}0_unwarped", step,
                        normalize_iwe(unwarped_iwe, invert=True))
        if gt_iwe is not None:
            self._write(f"{prefix}1_gt_iwe", step,
                        normalize_iwe(gt_iwe, invert=True))
        if pred_iwe is not None:
            self._write(f"{prefix}2_iwe", step,
                        normalize_iwe(pred_iwe, invert=True))
        if gt_flow is not None:
            self._write(f"{prefix}3_gt_flow", step, flow_to_rgb(gt_flow))
        if pred_flow is not None:
            self._write(f"{prefix}4_flow", step, flow_to_rgb(pred_flow))


def log_flow_epoch_images(panel: ImagePanelLogger, dataset, collate_fn,
                          render_fn: Callable[[Dict], Dict[str, np.ndarray]],
                          step: int, split: str,
                          n_samples: int = N_SAMPLES) -> None:
    """Render N evenly-spaced dataset samples (logging.py:33-47).

    render_fn(batch) -> dict with optional keys unwarped_iwe / pred_iwe /
    gt_iwe / pred_flow / gt_flow (numpy, [H,W] or [2,H,W]).
    """
    n = len(dataset)
    indices = np.linspace(0, n - 1, n_samples, dtype=int)
    for i, data_idx in enumerate(indices):
        batch = collate_fn([dataset[int(data_idx)]])
        images = render_fn(batch)
        panel.log_panel(step, split, i, **images)
