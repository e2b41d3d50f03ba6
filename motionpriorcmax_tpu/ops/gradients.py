"""Sobel image gradients, Charbonnier, and the focus/smoothness primitives.

TPU-native reimplementation of src/utils/loss.py (reference L1 layer).
All functions are pure jnp; the Sobel gradients use a depthwise conv that XLA
maps straight to the MXU/VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)


def _stencil3(x: jnp.ndarray, taps, axis: int, pad_mode: str) -> jnp.ndarray:
    """3-tap 1-D cross-correlation along `axis` via pad + shifted adds.

    A single-channel 3x3 conv on the TPU conv engine pads channels 1 -> 128
    (measured 49 ms fwd+bwd for the b8 focus objective); the shifted-add
    form is pure VPU elementwise work (~HBM-bound), and its backward is
    again shifted adds.  Zero-weight taps are skipped."""
    pads = [(0, 0)] * x.ndim
    pads[axis] = (1, 1)
    xp = jnp.pad(x, pads, mode=pad_mode)
    n = x.shape[axis]

    def sl(off):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(off, off + n)
        return xp[tuple(idx)]

    out = None
    for off, k in enumerate(taps):
        if k == 0:
            continue
        term = sl(off) if k == 1 else (-sl(off) if k == -1 else k * sl(off))
        out = term if out is None else out + term
    return out


def sobel_gradients(images: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel Sobel gradients with SAME zero padding.

    Reference: src/utils/loss.py:58-86 (grouped conv2d, padding=1).
    Computed separably ([-1,0,1] x [1,2,1]) as shifted adds — see _stencil3.

    Args:
      images: [B, C, H, W].
    Returns:
      (grad_x, grad_y), each [B, C, H, W].
    """
    smooth_h = _stencil3(images, (1.0, 2.0, 1.0), -2, "constant")
    gx = _stencil3(smooth_h, (-1.0, 0.0, 1.0), -1, "constant")
    smooth_w = _stencil3(images, (1.0, 2.0, 1.0), -1, "constant")
    gy = _stencil3(smooth_w, (-1.0, 0.0, 1.0), -2, "constant")
    return gx, gy


def gradient_magnitude(iwes: jnp.ndarray, norm: str = "l2") -> jnp.ndarray:
    """Mean Sobel gradient magnitude of a stack of IWEs.

    Reference: src/utils/loss.py:18-27.

    Args:
      iwes: [B, H, W] or [B, C, H, W].
    """
    if iwes.ndim == 3:
        iwes = iwes[:, None]
    dx, dy = sobel_gradients(iwes)
    if norm == "l2":
        return jnp.mean(jnp.square(dx) + jnp.square(dy))
    if norm == "l1":
        return jnp.mean(jnp.abs(dx) + jnp.abs(dy))
    raise ValueError(f"unknown norm {norm!r}")


def image_variance(iwes: jnp.ndarray) -> jnp.ndarray:
    """Mean per-image variance (Bessel-corrected, like torch.var).

    Reference: src/utils/loss.py:14-16.
    """
    n = iwes.shape[-1] * iwes.shape[-2]
    mean = jnp.mean(iwes, axis=(-2, -1), keepdims=True)
    var = jnp.sum(jnp.square(iwes - mean), axis=(-2, -1)) / max(n - 1, 1)
    return jnp.mean(var)


def focus_objective(iwes: jnp.ndarray, loss_type: str = "gradient_magnitude",
                    norm: str = "l2", epsilon: float = 0.0) -> jnp.ndarray:
    """loss = 1 / (sharpness + epsilon).  Reference: src/utils/loss.py:4-12.

    The reference has no epsilon: an empty event window (all-zero IWE) yields
    an inf loss and NaN gradients.  epsilon > 0 bounds the loss at 1/epsilon
    with zero gradient there, so degenerate windows in a batch can't poison
    the step (DIVERGENCES.md item 3; off by default for exact parity).
    """
    if loss_type == "variance":
        val = image_variance(iwes)
    elif loss_type == "gradient_magnitude":
        val = gradient_magnitude(iwes, norm=norm)
    else:
        raise ValueError(f"unknown loss_type {loss_type!r}")
    return 1.0 / (val + epsilon)


def charbonnier(x: jnp.ndarray, epsilon: float = 1e-3) -> jnp.ndarray:
    """Reference: src/utils/loss.py:46-56."""
    return jnp.mean(jnp.sqrt(jnp.square(x) + epsilon * epsilon))


def smoothness_loss(flow: jnp.ndarray) -> jnp.ndarray:
    """Charbonnier of Sobel flow gradients (Zhu19-style regularizer).

    Reference: src/utils/loss.py:29-44.

    Args:
      flow: [B, 2, H, W].
    """
    dx, dy = sobel_gradients(flow)
    return (charbonnier(dx) + charbonnier(dy)) / 2.0
