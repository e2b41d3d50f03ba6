"""Motion-basis evaluation: coefficients + basis functions -> trajectories.

TPU-native reimplementation of the reference basis math
(src/utils/basis.py:4-46, duplicated at src/modules/trajectory_net.py:57-99).

The reference's class hierarchy becomes data + two pure functions:
  eval_basis(times, num_basis, kind)          -> [T, K] basis matrix
  compute_trajectories(coeffs, basis_matrix)  -> positions via one einsum

Basis kinds (src/utils/basis.py:18-31):
  dct         b_k(t) = sqrt(2) * cos(pi/2 * (2t + 1) * k),  k = 1..K
  polynomial  b_k(t) = t^k,                                  k = 1..K
  learned     b(t)   = MLP(t)  (caller supplies apply fn)
All kinds share the property used downstream that the trajectory is the
coefficient-weighted sum over K basis values, summed over scales.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


def eval_basis(
    times: jnp.ndarray,
    num_basis: int,
    kind: str,
    mlp_apply: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Evaluate the basis functions at `times`.

    Args:
      times: [T] evaluation times (usually in [0, 1]).
      num_basis: K, number of basis functions.
      kind: 'dct' | 'polynomial' | 'learned'.
      mlp_apply: for kind='learned', a function [T, 1] -> [T, K].

    Returns:
      [T, K] basis matrix.
    """
    times = jnp.asarray(times)
    if kind == "dct":
        k_idx = jnp.arange(1, num_basis + 1, dtype=times.dtype)
        in_cos = (np.pi / 2.0) * (2.0 * times[:, None] + 1.0) * k_idx[None, :]
        return np.sqrt(2.0) * jnp.cos(in_cos)
    if kind == "polynomial":
        k_idx = jnp.arange(1, num_basis + 1, dtype=times.dtype)
        return times[:, None] ** k_idx[None, :]
    if kind == "learned":
        assert mlp_apply is not None, "learned basis requires mlp_apply"
        out = mlp_apply(times[:, None])
        assert out.shape == (times.shape[0], num_basis)
        return out
    raise ValueError(f"unknown basis kind {kind!r}")


def compute_trajectories(coeffs: jnp.ndarray, basis_matrix: jnp.ndarray) -> jnp.ndarray:
    """Trajectory positions from per-scale coefficients and a basis matrix.

    Equivalent to the reference compute_basis contraction + scale sum
    (src/utils/basis.py:35-46): positions sum the K basis terms per (y, x)
    channel and then sum over the scales axis.

    Args:
      coeffs: [B, S, 2, N, K]  (S scales, dim order (y, x), N trajectories).
      basis_matrix: [T, K].

    Returns:
      [B, T, N, 2] trajectory positions (time-major, matching the reference's
      calculate_coords permute at src/modules/trajectory_net.py:111).
    """
    assert coeffs.ndim == 5 and basis_matrix.ndim == 2
    # Sum over K (basis) and S (scales) in one contraction — a clean MXU matmul
    # over the flattened (B*S*2*N, K) x (K, T) shapes.
    return jnp.einsum("bsdnk,tk->btnd", coeffs, basis_matrix)


def bernstein_basis(times: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Bernstein basis for Bézier curves with P0 ≡ 0: rows i = 1..degree.

    b_i(t) = C(degree, i) * (1-t)^(degree-i) * t^i
    Reference: src/models/raft_spline/curves/bezier.py:66-90 (binomials via
    scipy.special.binom + a Numba scalar loop for the time powers — here a
    single vectorized expression).

    Args:
      times: [T] in [0, 1].
    Returns:
      [T, degree] basis matrix (column d corresponds to control point P_{d+1}).
    """
    times = jnp.asarray(times)
    i = jnp.arange(1, degree + 1, dtype=times.dtype)
    binom = jnp.asarray(
        np.array([_comb(degree, k) for k in range(1, degree + 1)], dtype=np.float64),
        dtype=times.dtype,
    )
    t = times[:, None]
    return binom[None, :] * (1.0 - t) ** (degree - i)[None, :] * t ** i[None, :]


def _comb(n: int, k: int) -> float:
    out = 1.0
    for j in range(k):
        out = out * (n - j) / (j + 1)
    return out
