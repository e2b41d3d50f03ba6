"""Metric registry (reference C19, torchmetrics replacement).

Metrics are pure functions + explicit (sum, count) state pytrees; cross-chip
reduction is one `psum` of the state (the torchmetrics dist_reduce_fx='sum'
analog, src/modules/utils.py:339-340).
"""

from .error_calculator import OpticalFlowError, make_error_calculator
from .core import (
    epe_masked,
    ae_masked,
    n_pixel_error_masked,
    epe_masked_multi,
    ae_masked_multi,
    trajectory_flow_metrics,
    traj_len_filter_mask,
    predictions_from_lin_assumption,
    MetricBank,
)

__all__ = [
    "OpticalFlowError",
    "make_error_calculator",
    "epe_masked",
    "ae_masked",
    "n_pixel_error_masked",
    "epe_masked_multi",
    "ae_masked_multi",
    "trajectory_flow_metrics",
    "traj_len_filter_mask",
    "predictions_from_lin_assumption",
    "MetricBank",
]
