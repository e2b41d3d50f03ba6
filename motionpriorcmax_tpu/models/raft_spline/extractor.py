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

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


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


class Conv7x7S2(nn.Module):
    """7x7 stride-2 conv with a space-to-depth fast path.

    The native stride-2 conv's BACKWARD is the TPU conv-engine pathology
    this repo keeps meeting (input-dilated convs; cf. the UNet's
    ConvTranspose2x2 note): measured 31.7 ms fwd+bwd at the b6 context
    encoder geometry vs 14.4 ms for the algebraically identical
    space-to-depth form — conv(k7, s2, p3) == conv(k4, s1, pad (2,1)) on
    the 2x2-phase-stacked input with the kernel taps regrouped by phase:

        out[y, x] = sum_{u,v} K[u, v] I[2y+u-3, 2x+v-3]
                  = sum_{a,b,py,px} K[2a+py-1, 2b+px-1] I2[y+a-2, x+b-2,
                                                           (py, px, c)]

    (taps with 2a+py-1 outside [0, 7) are zero — exactly the zero row/col
    that padding K by one leading tap provides).  The parameter KEEPS the
    canonical [7, 7, C, O] shape/name, so checkpoints and the torch
    converter are unaffected; the regroup is a free weight reshape.
    impl None = auto ('s2d' on the TPU backend for even inputs).
    """

    features: int
    dtype: Any = jnp.float32
    impl: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        b, h, w, _ = x.shape
        impl = self.impl
        if impl is None:
            impl = ("s2d" if jax.default_backend() == "tpu"
                    and h % 2 == 0 and w % 2 == 0 else "native")
        dt = self.dtype
        if impl == "native" or h % 2 or w % 2:
            y = lax.conv_general_dilated(
                x.astype(dt), kernel.astype(dt), (2, 2),
                ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(dt)
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, cin)
        x2 = jnp.transpose(x2, (0, 1, 3, 2, 4, 5)).reshape(
            b, h // 2, w // 2, 4 * cin)
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8,8,C,O]
        kp = kp.reshape(4, 2, 4, 2, cin, self.features)
        kp = jnp.transpose(kp, (0, 2, 1, 3, 4, 5)).reshape(
            4, 4, 4 * cin, self.features)
        y = lax.conv_general_dilated(
            x2.astype(dt), kp.astype(dt), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dt)


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

        # Param tree position pinned: Conv7x7S2 takes the name nn.Conv
        # auto-assigned before (kernel [7,7,C,64] unchanged); the final 1x1
        # keeps its historical auto-name explicitly.
        x = Conv7x7S2(64, dtype=dt, name="Conv_0")(x.astype(dt))
        x = _norm(self.norm_fn, ura, dt)(x)
        x = nn.relu(x).astype(dt)
        for planes, stride in ((64, 1), (96, 2), (128, 2)):
            x = ResidualBlock(planes, self.norm_fn, stride, dt)(x, ura)
            x = ResidualBlock(planes, self.norm_fn, 1, dt)(x, ura)
        x = nn.Conv(self.output_dim, (1, 1), dtype=dt, name="Conv_1")(x)

        x = jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW
        if is_list:
            out, off = [], 0
            for bsz in batch_sizes:
                out.append(x[off:off + bsz])
                off += bsz
            return out
        return x
