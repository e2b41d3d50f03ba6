"""Learned motion-basis MLP: t -> K basis values.

Reference: src/modules/trajectory_net.py:39-47 — Linear 1->64->64->64->n_out
with LeakyReLU between layers (flow path); the trajectory path uses a
3-layer ReLU variant (src/modules/raft_spline.py:29-35).
"""

from __future__ import annotations

from flax import linen as nn


class BasisMLP(nn.Module):
    num_basis: int
    hidden: int = 64
    depth: int = 3          # number of hidden layers
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, t):
        """t: [..., 1] -> [..., num_basis]."""
        act = {"leaky_relu": lambda x: nn.leaky_relu(x, 0.01),
               "relu": nn.relu}[self.activation]
        x = t
        for _ in range(self.depth):
            x = act(nn.Dense(self.hidden)(x))
        return nn.Dense(self.num_basis)(x)
