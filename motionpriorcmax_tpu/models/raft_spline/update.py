"""BasicUpdateBlock: motion encoder + SepConvGRU + delta-curve / mask heads.

Missing from the reference snapshot (SURVEY.md C31); re-derived from the
RAFT/E-RAFT/BFlow lineage with the signature pinned by the call site
(src/models/raft_spline/raft.py:182):
    net, up_mask, delta_bezier = update_block(net, inp, corr_total, bezier_params)
and dims pinned by config (raft_base.yaml): hidden 128, context 128,
motion 128.  The flow channel count generalizes from RAFT's 2 to the curve
parameter dim 2*degree; the motion feature keeps motion_dim total channels by
reserving param_dim of them for the raw params (RAFT: 126 conv + 2 flow).

NHWC internally, NCHW at the interface.  `dtype` runs the convs in bf16 on
the MXU (f32 params, the UNet's measured pattern); the GRU carry and the
delta/mask head OUTPUTS stay f32 — the curve-params accumulation across 12
iterations must not round.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class BasicMotionEncoder(nn.Module):
    param_dim: int
    motion_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, params, corr):
        """params [B, param_dim, H, W], corr [B, C_corr, H, W] (NCHW)."""
        dt = self.dtype
        p = jnp.transpose(params, (0, 2, 3, 1))
        c = jnp.transpose(corr, (0, 2, 3, 1))
        cor = nn.relu(nn.Conv(256, (1, 1), dtype=dt)(c.astype(dt)))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=dt)(cor.astype(dt)))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=dt)(p.astype(dt)))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=dt)(flo.astype(dt)))
        out = nn.relu(nn.Conv(self.motion_dim - self.param_dim, (3, 3),
                              padding=1, dtype=dt)(
            jnp.concatenate([cor, flo], axis=-1).astype(dt)))
        out = jnp.concatenate([out, p.astype(out.dtype)], axis=-1)
        return jnp.transpose(out, (0, 3, 1, 2))


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        """h, x: NCHW.  Returns h in f32 (scan-carry dtype stability)."""
        dt = self.dtype
        h = jnp.transpose(h, (0, 2, 3, 1))
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)
        for kernel, pad in (((1, 5), ((0, 0), (2, 2))), ((5, 1), ((2, 2), (0, 0)))):
            hx = jnp.concatenate([h.astype(dt), x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, kernel, padding=pad,
                                   dtype=dt)(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, kernel, padding=pad,
                                   dtype=dt)(hx))
            q = nn.tanh(nn.Conv(self.hidden_dim, kernel, padding=pad, dtype=dt)(
                jnp.concatenate([(r * h.astype(r.dtype)).astype(dt), x],
                                axis=-1)))
            # Gate combine in f32: h is the recurrent state.
            z32, q32 = z.astype(jnp.float32), q.astype(jnp.float32)
            h = (1.0 - z32) * h.astype(jnp.float32) + z32 * q32
        return jnp.transpose(h, (0, 3, 1, 2))


class DeltaHead(nn.Module):
    out_dim: int
    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.relu(nn.Conv(self.hidden, (3, 3), padding=1,
                            dtype=self.dtype)(x.astype(self.dtype)))
        # Output conv in f32: delta accumulates into the curve params.
        x = nn.Conv(self.out_dim, (3, 3), padding=1,
                    dtype=jnp.float32)(x.astype(jnp.float32))
        return jnp.transpose(x, (0, 3, 1, 2))


class BasicUpdateBlock(nn.Module):
    param_dim: int
    hidden_dim: int = 128
    motion_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, params):
        """-> (net', up_mask [B, 64*9, H, W], delta_params)."""
        dt = self.dtype
        motion = BasicMotionEncoder(self.param_dim, self.motion_dim,
                                    dtype=dt)(params, corr)
        gru_in = jnp.concatenate([inp.astype(motion.dtype), motion], axis=1)
        net = SepConvGRU(self.hidden_dim, dtype=dt)(net, gru_in)
        delta = DeltaHead(self.param_dim, dtype=dt)(net)
        # .25 scales the mask to balance gradients (RAFT convention).
        mask_in = jnp.transpose(net, (0, 2, 3, 1))
        mask = nn.relu(nn.Conv(256, (3, 3), padding=1,
                               dtype=dt)(mask_in.astype(dt)))
        # Mask head output in f32: feeds the convex-upsample softmax.
        mask = nn.Conv(64 * 9, (1, 1), dtype=jnp.float32)(
            mask.astype(jnp.float32))
        mask = 0.25 * jnp.transpose(mask, (0, 3, 1, 2))
        return net, mask, delta
