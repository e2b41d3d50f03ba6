"""Curves as data: parameter arrays + pure evaluation functions.

The reference's CurveBase/BezierCurves/PolynomialCurves/LearnedCurves class
hierarchy (src/models/raft_spline/curves/) collapses to:

  params:  [B, 2*degree, H, W]   (P0 == 0 convention, curves/base.py:22-24)
  flow(t): einsum(params_view, basis(t))    == bezier.py:92-113

Conventions preserved (SURVEY.md §7.4):
  * param channel layout is CTRL_DIM-major: view as [B, 2, degree, H, W]
    (base.py:85-87), dim 0 = x? NOTE: the reference never names the two
    channels; flows feed coords (x, y) grids in raft.py. We follow the
    reference ordering exactly: `_param_view` dim index 0 is the first
    flow channel, which pairs with coords dim 0 = x (utils.py coords_grid
    stacks (x, y)).
  * flow(0) = 0 and flow(1) = last control point (base.py:102-106): the
    Bernstein/monomial bases guarantee both analytically.
  * degree >= 1; 'LEARNED' uses a caller-supplied MLP basis.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ...ops.basis import bernstein_basis


def curve_params_init(batch: int, degree: int, height: int, width: int,
                      downsample_factor: int = 8) -> jnp.ndarray:
    """Zero-initialized curve parameters at 1/downsample resolution.

    Reference: BezierCurves.create_from_voxel_grid (curves/bezier.py:54-65).
    """
    assert degree >= 1
    return jnp.zeros((batch, 2 * degree, height // downsample_factor,
                      width // downsample_factor), jnp.float32)


def curve_basis_matrix(times: Sequence[float] | jnp.ndarray, degree: int,
                       curve_type: str,
                       basis_apply: Optional[Callable] = None) -> jnp.ndarray:
    """[T, degree] basis matrix for the given curve family.

    BEZIER:     Bernstein with binomials (bezier.py:66-113)
    POLYNOMIAL: monomials t^k              (polynomial.py:43-71)
    LEARNED:    MLP(t) -> [T, degree]      (learned.py:63-90)
    """
    times = jnp.asarray(times, jnp.float32)
    if curve_type == "BEZIER":
        return bernstein_basis(times, degree)
    if curve_type == "POLYNOMIAL":
        k = jnp.arange(1, degree + 1, dtype=times.dtype)
        return times[:, None] ** k[None, :]
    if curve_type == "LEARNED":
        assert basis_apply is not None
        return basis_apply(times[:, None])
    raise ValueError(f"unknown curve_type {curve_type!r}")


def curve_flow_from_reference(params: jnp.ndarray,
                              times: Sequence[float] | jnp.ndarray,
                              curve_type: str = "BEZIER",
                              basis_apply: Optional[Callable] = None
                              ) -> jnp.ndarray:
    """Flow (displacement from the reference frame) at each timestamp.

    Reference: CurveBase.get_flow_from_reference + _compute_flow_from_timestamps
    (curves/base.py:95-123, bezier.py:92-113):
      flow = einsum('bdphw,tp->tbdhw', params_view, poly_coeffs)

    Args:
      params: [B, 2*degree, H, W].
      times: [T] in [0, 1].

    Returns:
      [T, B, 2, H, W].
    """
    b, c, h, w = params.shape
    assert c % 2 == 0
    degree = c // 2
    basis = curve_basis_matrix(times, degree, curve_type, basis_apply)  # [T, P]
    pv = params.reshape(b, 2, degree, h, w)
    return jnp.einsum("bdphw,tp->tbdhw", pv, basis)


def curve_params_from_2view(flow: jnp.ndarray) -> jnp.ndarray:
    """Degree-1 curve parameters from a 2-view flow tensor (reference
    BezierCurves.from_2view, curves/bezier.py:47-52 — used for paper
    visualizations): the flow IS the single control point."""
    assert flow.ndim == 4 and flow.shape[1] == 2, flow.shape
    return flow


def coords_grid(batch: int, ht: int, wd: int) -> jnp.ndarray:
    """[B, 2, H, W] pixel coordinate grid, channel order (x, y).

    Reference: src/models/raft_spline/utils.py:22-28 (stacks meshgrid
    reversed -> (x, y)).
    """
    gy, gx = jnp.meshgrid(jnp.arange(ht, dtype=jnp.float32),
                          jnp.arange(wd, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([gx, gy], axis=0)
    return jnp.broadcast_to(coords[None], (batch, 2, ht, wd))


def cvx_upsample(data: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """RAFT convex 8x upsampling: softmax over 9 neighbors per output pixel.

    Reference: src/models/raft_spline/utils.py:30-45 — mask [N, 9*8*8, H, W],
    data scaled by 8 (flow magnitudes live in upsampled pixel units).

    Args:
      data: [N, C, H, W].
      mask: [N, 9*64, H, W].

    Returns:
      [N, C, 8H, 8W].
    """
    n, dim, h, w = data.shape
    mask = mask.reshape(n, 1, 9, 8, 8, h, w)
    mask = jax.nn.softmax(mask, axis=2)

    # unfold(3x3, padding=1): 9 shifted copies of 8*data.
    padded = jnp.pad(8.0 * data, ((0, 0), (0, 0), (1, 1), (1, 1)))
    patches = []
    for dy in range(3):
        for dx in range(3):
            patches.append(padded[:, :, dy:dy + h, dx:dx + w])
    # [N, C, 9, H, W] — torch unfold orders patch elements row-major, matching
    # this (dy, dx) loop order.
    up_data = jnp.stack(patches, axis=2)[:, :, :, None, None]  # [N,C,9,1,1,H,W]
    up_data = jnp.sum(mask[:, :, :, :, :, :, :] * up_data, axis=2)  # [N,C,8,8,H,W]
    up_data = jnp.transpose(up_data, (0, 1, 4, 2, 5, 3))  # [N,C,H,8,W,8]
    return up_data.reshape(n, dim, 8 * h, 8 * w)
