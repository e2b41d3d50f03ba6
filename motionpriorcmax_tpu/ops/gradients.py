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


def sobel_gradients(images: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel Sobel gradients with SAME zero padding.

    Reference: src/utils/loss.py:58-86 (grouped conv2d, padding=1).

    Args:
      images: [B, C, H, W].
    Returns:
      (grad_x, grad_y), each [B, C, H, W].
    """
    b, c, h, w = images.shape
    x = images.reshape(b * c, 1, h, w)
    kx = jnp.asarray(_SOBEL_X)[None, None]
    ky = jnp.asarray(_SOBEL_Y)[None, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
    gx = jax.lax.conv_general_dilated(x, kx, (1, 1), "SAME", dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(x, ky, (1, 1), "SAME", dimension_numbers=dn)
    return gx.reshape(b, c, h, w), gy.reshape(b, c, h, w)


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
