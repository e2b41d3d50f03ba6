"""DSEC-benchmark flow PNG IO + magnitude capping.

Reference: scripts/dsec_inference.py:33-49 (encode, 60 px cap) and
src/loader/dsec/loader.py:171-181 / src/loader/dsec/utils.py:79-96 (decode).

Encoding: 16-bit PNG, channel 0 = x * 128 + 2^15, channel 1 = y * 128 + 2^15,
channel 2 = valid flag.  Flow arrays here are [2, H, W] with dim order (y, x)
— the framework-wide convention.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np


def scale_optical_flow(flow: np.ndarray, max_flow_magnitude: float) -> np.ndarray:
    """Clamp per-pixel flow magnitude (dsec_inference.py:33-41).

    Args:
      flow: [2, H, W].
    """
    u, v = flow[0], flow[1]
    mag = np.sqrt(u * u + v * v)
    scale = np.where(mag > max_flow_magnitude,
                     max_flow_magnitude / np.maximum(mag, 1e-12), 1.0)
    return np.stack([u * scale, v * scale], axis=0)


def save_flow_png(file_path: Path, flow: np.ndarray, valid: np.ndarray | None = None):
    """Write a DSEC-benchmark 16-bit flow PNG (dsec_inference.py:43-49).

    Args:
      flow: [2, H, W], dim order (y, x).
      valid: optional [H, W] bool for channel 2 (benchmark submissions omit it).
    """
    h, w = flow.shape[1], flow.shape[2]
    flow_16bit = np.zeros((h, w, 3), dtype=np.uint16)
    flow_16bit[..., 1] = (flow[0] * 128 + 2 ** 15).astype(np.uint16)  # y
    flow_16bit[..., 0] = (flow[1] * 128 + 2 ** 15).astype(np.uint16)  # x
    if valid is not None:
        flow_16bit[..., 2] = valid.astype(np.uint16)
    _write_png16(Path(file_path), flow_16bit)


def load_flow_png(file_path: Path) -> Tuple[np.ndarray, np.ndarray]:
    """Read a DSEC flow PNG -> ([2, H, W] float (y, x) order, [H, W] valid)."""
    from .png16 import read_png_rgb

    raw = read_png_rgb(Path(file_path)).astype(np.float32)
    flow = np.zeros((2, raw.shape[0], raw.shape[1]), np.float32)
    flow[0] = (raw[..., 1] - 2 ** 15) / 128.0
    flow[1] = (raw[..., 0] - 2 ** 15) / 128.0
    return flow, raw[..., 2].astype(bool)


def _write_png16(path: Path, arr: np.ndarray) -> None:
    from .png16 import write_png16_rgb

    write_png16_rgb(Path(path), arr)
