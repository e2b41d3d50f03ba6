"""RAFT-Spline: recurrent dense continuous-time trajectory prediction.

TPU-native redesign of the reference RAFT-Spline network
(src/models/raft_spline/, SURVEY.md C27-C31).  The curve class hierarchy
becomes parameter arrays + pure functions (curves.py); the missing-from-
snapshot BasicEncoder/BasicUpdateBlock (C31) are re-derived from the
E-RAFT/BFlow lineage with dims pinned by
config/exe/trajectory_inference/model/raft_base.yaml:10-21.
"""

from .curves import (
    curve_flow_from_reference,
    curve_params_init,
    cvx_upsample,
    coords_grid,
)
from .raft import RAFTSpline, RAFTSplineConfig

__all__ = [
    "curve_flow_from_reference",
    "curve_params_init",
    "cvx_upsample",
    "coords_grid",
    "RAFTSpline",
    "RAFTSplineConfig",
]
