"""Host-side utilities: flow IO, scaling, visualization."""

from .flow_io import save_flow_png, load_flow_png, scale_optical_flow
from .visualization import flow_to_rgb, normalize_iwe, color_wheel

__all__ = [
    "save_flow_png",
    "load_flow_png",
    "scale_optical_flow",
    "flow_to_rgb",
    "normalize_iwe",
    "color_wheel",
]
