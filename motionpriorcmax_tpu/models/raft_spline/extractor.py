"""BasicEncoder: 6-residual-block feature/context encoder at 1/8 resolution.

The reference imports this from a `parts/` package that is MISSING from the
snapshot (src/models/raft_spline/raft.py:6, SURVEY.md C31); re-derived here
from the E-RAFT/RAFT lineage (upstream acknowledgment at README.md:174) with
the call signature and dims pinned by the reference call sites:
  * BasicEncoder(input_dim, output_dim, norm_fn) — raft.py:58,67,70
  * accepts a LIST of inputs and returns a list of fmaps — raft.py:125-126, 139
  * output at 1/8 resolution (downsample_factor=8, raft.py:82)
  * feature norm 'instance', context norm 'batch'
    (config/exe/trajectory_inference/model/raft_base.yaml:15-21)

Architecture (RAFT BasicEncoder): conv7x7/2 -> 2 res blocks @64 -> 2 @96 /2
-> 2 @128 /2 -> conv1x1 to output_dim.  Instance norm is non-affine
(torch nn.InstanceNorm2d default).  NHWC internally.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn


def _norm(norm_fn: str, use_running_average: bool, dtype=jnp.float32):
    # Like the UNet (models/unet.py): norms run in the compute dtype; flax
    # computes the statistics in f32 internally either way.
    if norm_fn == "instance":
        # InstanceNorm == GroupNorm with one channel per group; non-affine.
        return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False, epsilon=1e-5, dtype=dtype)
    if norm_fn == "batch":
        return nn.BatchNorm(use_running_average=use_running_average,
                            momentum=0.9, epsilon=1e-5, dtype=dtype)
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(f"unknown norm_fn {norm_fn!r}")


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        ura = use_running_average
        dt = self.dtype
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=dt)(x)
        y = _norm(self.norm_fn, ura, dt)(y)
        y = nn.relu(y).astype(dt)
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=dt)(y)
        y = _norm(self.norm_fn, ura, dt)(y)
        y = nn.relu(y).astype(dt)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, dtype=dt)(x)
            x = _norm(self.norm_fn, ura, dt)(x)
        return nn.relu(x.astype(dt) + y)


class BasicEncoder(nn.Module):
    output_dim: int = 256
    norm_fn: str = "instance"
    # bf16 convs on the MXU (f32 params / f32 norm statistics), the UNet's
    # measured production pattern; the final 1x1 stays in the compute dtype
    # and callers cast fmaps back to f32 for the corr volumes (raft.py).
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Union[jnp.ndarray, Sequence[jnp.ndarray]],
                 train: bool = False):
        """NCHW input(s) -> NCHW fmap(s) at 1/8 resolution.

        A list input is concatenated along batch and split back (reference
        encoder's is_list trick), so all entries share one BN batch.  With
        train=True, BatchNorm uses batch statistics and updates running
        stats (mutable 'batch_stats'); train=False == the reference's
        freeze_bn/eval behavior (raft.py:74-77).
        """
        is_list = isinstance(inputs, (list, tuple))
        x = jnp.concatenate(inputs, axis=0) if is_list else inputs
        batch_sizes = [t.shape[0] for t in inputs] if is_list else None

        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        ura = not train
        dt = self.dtype

        x = nn.Conv(64, (7, 7), strides=2, padding=3, dtype=dt)(x.astype(dt))
        x = _norm(self.norm_fn, ura, dt)(x)
        x = nn.relu(x).astype(dt)
        for planes, stride in ((64, 1), (96, 2), (128, 2)):
            x = ResidualBlock(planes, self.norm_fn, stride, dt)(x, ura)
            x = ResidualBlock(planes, self.norm_fn, 1, dt)(x, ura)
        x = nn.Conv(self.output_dim, (1, 1), dtype=dt)(x)

        x = jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW
        if is_list:
            out, off = [], 0
            for bsz in batch_sizes:
                out.append(x[off:off + bsz])
                off += bsz
            return out
        return x
