"""BasicUpdateBlock: motion encoder + SepConvGRU + delta-curve / mask heads.

Missing from the reference snapshot (SURVEY.md C31); re-derived from the
RAFT/E-RAFT/BFlow lineage with the signature pinned by the call site
(src/models/raft_spline/raft.py:182):
    net, up_mask, delta_bezier = update_block(net, inp, corr_total, bezier_params)
and dims pinned by config (raft_base.yaml): hidden 128, context 128,
motion 128.  The flow channel count generalizes from RAFT's 2 to the curve
parameter dim 2*degree; the motion feature keeps motion_dim total channels by
reserving param_dim of them for the raw params (RAFT: 126 conv + 2 flow).

NHWC internally, NCHW at the interface.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class BasicMotionEncoder(nn.Module):
    param_dim: int
    motion_dim: int = 128

    @nn.compact
    def __call__(self, params, corr):
        """params [B, param_dim, H, W], corr [B, C_corr, H, W] (NCHW)."""
        p = jnp.transpose(params, (0, 2, 3, 1))
        c = jnp.transpose(corr, (0, 2, 3, 1))
        cor = nn.relu(nn.Conv(256, (1, 1))(c))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=1)(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=3)(p))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=1)(flo))
        out = nn.relu(nn.Conv(self.motion_dim - self.param_dim, (3, 3),
                              padding=1)(jnp.concatenate([cor, flo], axis=-1)))
        out = jnp.concatenate([out, p], axis=-1)
        return jnp.transpose(out, (0, 3, 1, 2))


class SepConvGRU(nn.Module):
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        """h, x: NCHW."""
        h = jnp.transpose(h, (0, 2, 3, 1))
        x = jnp.transpose(x, (0, 2, 3, 1))
        for kernel, pad in (((1, 5), ((0, 0), (2, 2))), ((5, 1), ((2, 2), (0, 0)))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, kernel, padding=pad)(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, kernel, padding=pad)(hx))
            q = nn.tanh(nn.Conv(self.hidden_dim, kernel, padding=pad)(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1.0 - z) * h + z * q
        return jnp.transpose(h, (0, 3, 1, 2))


class DeltaHead(nn.Module):
    out_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.relu(nn.Conv(self.hidden, (3, 3), padding=1)(x))
        x = nn.Conv(self.out_dim, (3, 3), padding=1)(x)
        return jnp.transpose(x, (0, 3, 1, 2))


class BasicUpdateBlock(nn.Module):
    param_dim: int
    hidden_dim: int = 128
    motion_dim: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, params):
        """-> (net', up_mask [B, 64*9, H, W], delta_params)."""
        motion = BasicMotionEncoder(self.param_dim, self.motion_dim)(params, corr)
        gru_in = jnp.concatenate([inp, motion], axis=1)
        net = SepConvGRU(self.hidden_dim)(net, gru_in)
        delta = DeltaHead(self.param_dim)(net)
        # .25 scales the mask to balance gradients (RAFT convention).
        mask_in = jnp.transpose(net, (0, 2, 3, 1))
        mask = nn.relu(nn.Conv(256, (3, 3), padding=1)(mask_in))
        mask = nn.Conv(64 * 9, (1, 1))(mask)
        mask = 0.25 * jnp.transpose(mask, (0, 3, 1, 2))
        return net, mask, delta
