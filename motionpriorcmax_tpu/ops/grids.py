"""Grid <-> trajectory-list packing and dense-flow upsampling.

TPU-native reimplementation of src/utils/trajectories.py and src/utils/flow.py.

The reference selects one active pixel per patch_size x patch_size tile via a
boolean mask + torch.nonzero (trajectories.py:3-52).  Dynamic nonzero is
hostile to XLA (dynamic shapes), but the tile mask is *static*: the active
pixels are exactly the strided grid [s::n, s::n] with s = n // 2.  We exploit
that and implement grid->list as a static strided slice, which jit-compiles to
a view-like gather with fixed shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tile_mask_positions(image_shape: Tuple[int, int], tile_size: int) -> np.ndarray:
    """Pixel positions (y, x) of the one-per-tile trajectory mask, row-major.

    Matches torch.nonzero order on the reference tile mask
    (src/utils/trajectories.py:3-13, 46): rows scan y outer, x inner.

    Returns:
      [N, 2] int32 numpy array with N = ceil-free (H//n)*(W//n) positions at
      offsets s + n*i with s = n // 2.
    """
    h, w = image_shape
    n = tile_size
    s = n // 2
    ys = np.arange(s, h, n, dtype=np.int32)
    xs = np.arange(s, w, n, dtype=np.int32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gy.reshape(-1), gx.reshape(-1)], axis=-1)


def coeffs_grid_to_list(
    coeff_grid: jnp.ndarray, tile_size: int, num_coeffs: int
) -> jnp.ndarray:
    """Select per-tile coefficient vectors from the dense coefficient grid.

    Equivalent to reference coeffs_grid_to_list under the tile mask
    (src/utils/trajectories.py:15-32) but with static shapes: a strided slice
    [s::n, s::n] then reshape to [B, S, 2, N, K].

    Args:
      coeff_grid: [B, S, 2*K, H, W].
      tile_size: patch size n (one trajectory per n x n tile).
      num_coeffs: K.

    Returns:
      coeffs: [B, S, 2, N, K] with N = (H//n)*(W//n); dim order (y, x),
      matching the reference reshape(b, s, 2, K, -1).permute(0,1,2,4,3).
    """
    b, s, c2, h, w = coeff_grid.shape
    assert c2 == 2 * num_coeffs, (c2, num_coeffs)
    off = tile_size // 2
    sel = coeff_grid[:, :, :, off::tile_size, off::tile_size]
    n = sel.shape[-2] * sel.shape[-1]
    sel = sel.reshape(b, s, 2, num_coeffs, n)
    return jnp.swapaxes(sel, -1, -2)  # [B, S, 2, N, K]


def list_to_grid(
    feature_list: jnp.ndarray, grid_shape: Tuple[int, int]
) -> jnp.ndarray:
    """Scatter a row-major feature list back to a dense grid.

    The reference version (src/utils/trajectories.py:54-74) places features at
    arbitrary pixel_positions; for the tile-mask path the list *is* the
    row-major traversal of the (H//n, W//n) patch grid, so this is a reshape.

    Args:
      feature_list: [B, N, C] with N = gh * gw in row-major (y, x) order.
      grid_shape: (gh, gw).

    Returns:
      [B, C, gh, gw].
    """
    b, n, c = feature_list.shape
    gh, gw = grid_shape
    assert n == gh * gw, (n, gh, gw)
    return jnp.transpose(feature_list.reshape(b, gh, gw, c), (0, 3, 1, 2))


def interpolate_dense_flow(patch_flow: jnp.ndarray, image_shape: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic upsample of the patch-level flow to full resolution.

    Reference: src/utils/flow.py:8-10 (torchvision bicubic resize; antialias
    is inactive for upsampling).  jax.image 'cubic' is the Keys bicubic kernel.

    Args:
      patch_flow: [B, C, gh, gw].
    Returns:
      [B, C, H, W].
    """
    b, c = patch_flow.shape[:2]
    h, w = image_shape
    return jax.image.resize(patch_flow, (b, c, h, w), method="cubic")


def dense_flow_from_traj(
    traj_flow: jnp.ndarray,
    tile_size: int,
    image_shape: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense full-resolution flow from per-tile trajectory displacements.

    Reference: src/utils/flow.py:12-16.

    Args:
      traj_flow: [B, N, 2] per-tile displacement, N row-major over the patch
        grid (the tile-mask ordering of `tile_mask_positions`).
      tile_size: patch size.
      image_shape: (H, W).

    Returns:
      (dense_flow [B, 2, H, W], patch_flow [B, 2, H//n, W//n]).
    """
    h, w = image_shape
    gh, gw = h // tile_size, w // tile_size
    patch_flow = list_to_grid(traj_flow, (gh, gw))
    return interpolate_dense_flow(patch_flow, image_shape), patch_flow
