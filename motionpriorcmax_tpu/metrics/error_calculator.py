"""Error-calculator objects for validation loops (reference C20).

Reimplements src/utils/metrics.py: ErrorCalculatorFactory ('DSEC' | 'MVSEC'),
OpticalFlowError.run(predictions, batch) -> {metric: value}, and the
best-metric summary hook (log_best handled by training.loop).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops.flow_error import calculate_flow_error


class OpticalFlowError:
    """Flow EPE/NPE/AE vs GT over valid (and optional event) masks.

    Reference: src/utils/metrics.py:50-62 — run() takes predictions
    {'flow': [B,2,H,W]} and a batch with 'forward_flow'/'flow_valid'.
    """

    def __init__(self, time_scaled: bool = False):
        self.time_scaled = time_scaled

    def run(self, predictions: Dict[str, jnp.ndarray],
            batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        flow_pred = predictions["flow"]
        flow_gt = batch["forward_flow"] if "forward_flow" in batch else batch["gt_flow"]
        event_mask = batch.get("flow_valid")
        time_scale = batch.get("time_scale") if self.time_scaled else None
        return calculate_flow_error(flow_gt, flow_pred, event_mask=event_mask,
                                    time_scale=time_scale)


def make_error_calculator(dataset: str) -> OpticalFlowError:
    """Factory (reference ErrorCalculatorFactory, src/utils/metrics.py:33-39)."""
    if dataset in ("DSEC", "MVSEC"):
        return OpticalFlowError(time_scaled=(dataset == "MVSEC"))
    raise ValueError(f"unknown dataset {dataset!r}")
