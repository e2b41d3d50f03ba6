"""Textbook UNet mapping event voxel grids to motion-basis coefficient grids.

TPU-native reimplementation of the reference UNet
(src/models/unet/unet_model.py:6-48, unet_parts.py:8-77):
  DoubleConv = (conv3x3 no-bias -> BN -> ReLU) x 2
  4 x Down   = maxpool2 -> DoubleConv       (64 -> 128 -> 256 -> 512 -> 1024)
  4 x Up     = ConvTranspose2d(k2 s2) (or bilinear) -> pad-to-skip -> concat
               -> DoubleConv
  OutConv    = conv1x1
In/out channels: in = num_bins (15), out = 2 * num_basis
(src/modules/trajectory_net.py:27-28).

Layout: NHWC internally (TPU-native; XLA convs prefer channel-last), with an
NCHW wrapper on `__call__` so callers keep the reference's NCHW convention.
BatchNorm state lives in the 'batch_stats' collection (functional, donated
through the train step).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class ConvTranspose2x2(nn.Module):
    """nn.ConvTranspose(kernel=2, strides=2) as a 1x1 conv + depth-to-space.

    A stride-2 kernel-2 transposed conv writes non-overlapping 2x2 output
    blocks, so it is exactly a 1x1 conv to 4*features channels followed by a
    depth-to-space reshuffle.  XLA lowers lax.conv_transpose as an
    input-dilated conv, which the TPU conv engine handles poorly (measured
    7.8 ms fwd+bwd for the 128->64 up at b8 DSEC full res vs 4.5 ms for this
    form, 1.75x).  Parameter name/shape/orientation match nn.ConvTranspose
    bit-for-bit, so checkpoints and the torch converter
    (training/checkpoint.py:101-154) are unaffected.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # lax.conv_transpose(transpose_kernel=False) applies the kernel
        # spatially flipped relative to the per-pixel 2x2 block write; undo.
        k = kernel[::-1, ::-1].astype(self.dtype)
        k1 = jnp.transpose(k, (2, 0, 1, 3)).reshape(1, 1, cin,
                                                    4 * self.features)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), k1, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, _ = y.shape
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            b, h * 2, w * 2, self.features)
        return y + bias.astype(self.dtype)


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: int | None = None
    use_running_average: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.mid_channels or self.out_channels
        for ch in (mid, self.out_channels):
            x = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(x)
            # BN runs in the compute dtype; flax computes the STATISTICS in
            # float32 regardless (linen normalization internals), so this
            # only moves the normalize/scale math to bf16.  A forced-f32 BN
            # materialized every activation twice per conv in f32 — profiled
            # at ~16 ms/step of pure convert_bitcast fusions at b4 DSEC.
            x = nn.BatchNorm(use_running_average=self.use_running_average,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x).astype(self.dtype)
        return x


class Down(nn.Module):
    out_channels: int
    use_running_average: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # 2x2 max pool as reshape+max: reduce_window's backward is a
        # select_and_scatter (slow on TPU, ~14 ms/step of pad_maximum +
        # select_reduce + select_and_scatter fusions profiled at b4 DSEC);
        # the reshape form backpropagates as a cheap select.  Odd trailing
        # rows/cols are dropped first, matching stride-2 floor windowing.
        b, h, w, c = x.shape
        x = x[:, :h // 2 * 2, :w // 2 * 2]
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))
        return DoubleConv(self.out_channels,
                          use_running_average=self.use_running_average,
                          dtype=self.dtype)(x)


class Up(nn.Module):
    out_channels: int
    bilinear: bool = False
    use_running_average: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        if self.bilinear:
            import jax

            b, h, w, c = x1.shape
            x1 = jax.image.resize(x1, (b, h * 2, w * 2, c), method="bilinear")
            mid = x1.shape[-1] // 2
        else:
            x1 = ConvTranspose2x2(x1.shape[-1] // 2, dtype=self.dtype,
                                  name="ConvTranspose_0")(x1)
            mid = None
        # Pad x1 to the skip connection's spatial size (unet_parts.py:59-63).
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                          (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x2, x1.astype(x2.dtype)], axis=-1)
        return DoubleConv(self.out_channels, mid_channels=mid,
                          use_running_average=self.use_running_average,
                          dtype=self.dtype)(x)


class UNet(nn.Module):
    """UNet over NCHW voxel grids -> NCHW coefficient grids."""

    n_channels: int
    n_classes: int
    bilinear: bool = False
    widths: Sequence[int] = (64, 128, 256, 512, 1024)
    # 'bfloat16' runs the convs on the MXU at 2x throughput; params and BN
    # stats stay float32 (mixed precision).  Default float32 for reference
    # parity (the reference runs TF32-ish 'high' matmul precision).
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NCHW -> NHWC
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        ura = not train
        w = self.widths
        dt = self.dtype
        factor = 2 if self.bilinear else 1

        x1 = DoubleConv(w[0], use_running_average=ura, dtype=dt)(x)
        x2 = Down(w[1], use_running_average=ura, dtype=dt)(x1)
        x3 = Down(w[2], use_running_average=ura, dtype=dt)(x2)
        x4 = Down(w[3], use_running_average=ura, dtype=dt)(x3)
        x5 = Down(w[4] // factor, use_running_average=ura, dtype=dt)(x4)
        y = Up(w[3] // factor, self.bilinear, use_running_average=ura, dtype=dt)(x5, x4)
        y = Up(w[2] // factor, self.bilinear, use_running_average=ura, dtype=dt)(y, x3)
        y = Up(w[1] // factor, self.bilinear, use_running_average=ura, dtype=dt)(y, x2)
        y = Up(w[0], self.bilinear, use_running_average=ura, dtype=dt)(y, x1)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32)(
            y.astype(jnp.float32))
        # NHWC -> NCHW
        return jnp.transpose(logits, (0, 3, 1, 2))
