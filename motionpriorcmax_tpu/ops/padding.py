"""Input padding to size multiples (reference C21, InputPadder).

Reimplements src/modules/utils.py:298-333 with the `requires_padding` bug
fixed (the reference's `answer = False; answer &= ...` always returns False
— DIVERGENCES.md #1): pad H, W up to a multiple of min_size with replicate
('edge') padding, RAFT-style (bottom-only option for KITTI-like use).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def padding_amounts(height: int, width: int, min_size: int = 8,
                    no_top_padding: bool = False
                    ) -> Tuple[int, int, int, int]:
    """(top, bottom, left, right) pads to reach multiples of min_size."""
    pad_ht = (-height) % min_size
    pad_wd = (-width) % min_size
    if no_top_padding:
        return 0, pad_ht, pad_wd // 2, pad_wd - pad_wd // 2
    return pad_ht // 2, pad_ht - pad_ht // 2, pad_wd // 2, pad_wd - pad_wd // 2


def requires_padding(height: int, width: int, min_size: int = 8) -> bool:
    return height % min_size != 0 or width % min_size != 0


def pad_to_multiple(x: jnp.ndarray, min_size: int = 8,
                    no_top_padding: bool = False) -> jnp.ndarray:
    """Replicate-pad the last two dims to multiples of min_size."""
    h, w = x.shape[-2:]
    top, bottom, left, right = padding_amounts(h, w, min_size, no_top_padding)
    if top == bottom == left == right == 0:
        return x
    pads = [(0, 0)] * (x.ndim - 2) + [(top, bottom), (left, right)]
    return jnp.pad(x, pads, mode="edge")


def unpad(x: jnp.ndarray, orig_height: int, orig_width: int,
          min_size: int = 8, no_top_padding: bool = False) -> jnp.ndarray:
    """Crop back to the original spatial size."""
    top, _, left, _ = padding_amounts(orig_height, orig_width, min_size,
                                      no_top_padding)
    return x[..., top:top + orig_height, left:left + orig_width]
