"""Model layer (reference L2): UNet and RAFT-Spline, rebuilt in flax.linen."""

from .unet import UNet
from .basis_mlp import BasisMLP

__all__ = ["UNet", "BasisMLP"]
