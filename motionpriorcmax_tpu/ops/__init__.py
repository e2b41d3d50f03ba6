"""Event/geometry tensor primitives (reference layer L1, SURVEY.md §1).

Everything in this package is a pure jnp function: jit-able, grad-able,
vmap-able, static-shaped.  Ragged event streams are represented as
fixed-capacity arrays with a validity column (see `events.EVENT_COLS`).
"""

from .events import (
    EVENT_COLS,
    voxel_grid_from_events,
    normalize_voxel_grid,
    clamp_voxel_grid_quantile,
    iwe_bilinear_vote,
)
from .basis import eval_basis, compute_trajectories
from .grids import (
    tile_mask_positions,
    coeffs_grid_to_list,
    list_to_grid,
    dense_flow_from_traj,
)
from .gradients import (
    sobel_gradients,
    gradient_magnitude,
    image_variance,
    focus_objective,
    charbonnier,
    smoothness_loss,
)
from .knn import knn_blocked, knn_batched, knn_grid_window
from .flow_error import calculate_flow_error
from .padding import pad_to_multiple, unpad, requires_padding
from .scatter import scatter_add_1d, scatter_add_direct

__all__ = [
    "EVENT_COLS",
    "voxel_grid_from_events",
    "normalize_voxel_grid",
    "clamp_voxel_grid_quantile",
    "iwe_bilinear_vote",
    "eval_basis",
    "compute_trajectories",
    "tile_mask_positions",
    "coeffs_grid_to_list",
    "list_to_grid",
    "dense_flow_from_traj",
    "sobel_gradients",
    "gradient_magnitude",
    "image_variance",
    "focus_objective",
    "charbonnier",
    "smoothness_loss",
    "knn_blocked",
    "knn_batched",
    "knn_grid_window",
    "calculate_flow_error",
    "pad_to_multiple",
    "unpad",
    "requires_padding",
    "scatter_add_1d",
    "scatter_add_direct",
]
