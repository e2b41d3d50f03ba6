"""Pallas corr-window extraction: per-map integer-aligned [win, win] windows.

Replaces the batched one-hot einsum pair in the RAFT corr lookup
(models/raft_spline/corr.py::_extract_window, reference semantics
src/models/raft_spline/corr.py:304-348).  Why: each query owns its OWN
[H2, W2] map slice of the correlation volume, so the einsum form is 92,160
independent (10,48)@(48,64) matmuls at EVIMO2 b6 — Mosaic issues them as
per-batch MXU invocations at >90% padding waste, measured 14 ms forward +
12.5 ms volume-cotangent backward PER refinement iteration (the entire
~29.5 ms/iteration wall of the train step's 12-iteration scan).

Here the window selection runs on the VPU as masked broadcast-compare
reductions over the map block held in VMEM — a pure SELECTION (exactly one
match per tap), so it is exact in any dtype and has no MXU precision
hazard:

    band_i[m, w]  = sum_h [h == y0(m)+i] * corr[m, h, w]      (win reduces)
    out[m, i*win+j] = sum_w [w == x0(m)+j] * band_i[m, w]     (win^2 reduces)

Backward is the transposed expansion (scatter the [win, win] cotangent into
the [H2, W2] map), same op count.  Out-of-range taps (y0+i or x0+j outside
the map) match nothing and contribute zero — identical to the einsum path's
row_ok/col_ok masks and torch grid_sample padding_mode='zeros'.

Layout: maps travel as [N, H2, W2] blocks (BM maps per program; Mosaic pads
the W2 lanes internally — no materialized padding of the 566 MB volume).
The output is [N, LANE_PAD] with win*win used lanes (a [N, win, win] output
would tile-pad every map 20x in HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BM = 128  # maps per program


def _lane_pad(n):
    return ((n + 127) // 128) * 128


def _fwd_kernel(rows_ref, cols_ref, corr_ref, out_ref, *, win):
    """rows/cols [BM, 1] int32; corr [BM, H2, W2]; out [BM, LANE_PAD] f32."""
    bm, h2, w2 = corr_ref.shape
    lanes = out_ref.shape[1]
    y0 = rows_ref[:, 0:1]                                    # [BM, 1]
    x0 = cols_ref[:, 0:1]
    cf = corr_ref[...].astype(jnp.float32)                   # [BM, H2, W2]
    hiota = jax.lax.broadcasted_iota(jnp.int32, (bm, h2, w2), 1)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (bm, w2), 1)
    liota = jax.lax.broadcasted_iota(jnp.int32, (bm, lanes), 1)

    acc = jnp.zeros((bm, lanes), jnp.float32)
    for i in range(win):
        sel_h = hiota == (y0 + i)[:, :, None]                # [BM, H2, W2]
        band = jnp.sum(jnp.where(sel_h, cf, 0.0), axis=1)    # [BM, W2]
        for j in range(win):
            sel_w = wiota == (x0 + j)
            val = jnp.sum(jnp.where(sel_w, band, 0.0), axis=1,
                          keepdims=True)                     # [BM, 1]
            acc = acc + jnp.where(liota == (i * win + j), val, 0.0)
    out_ref[...] = acc


def _bwd_kernel(rows_ref, cols_ref, g_ref, out_ref, *, win):
    """g [BM, LANE_PAD] f32 -> d corr [BM, H2, W2] (out dtype)."""
    bm, h2, w2 = out_ref.shape
    y0 = rows_ref[:, 0:1]
    x0 = cols_ref[:, 0:1]
    g = g_ref[...]
    hiota = jax.lax.broadcasted_iota(jnp.int32, (bm, h2, w2), 1)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (bm, w2), 1)

    acc = jnp.zeros((bm, h2, w2), jnp.float32)
    for i in range(win):
        tmp = jnp.zeros((bm, w2), jnp.float32)
        for j in range(win):
            gv = g[:, i * win + j:i * win + j + 1]           # [BM, 1]
            tmp = tmp + jnp.where(wiota == (x0 + j), gv, 0.0)
        sel_h = hiota == (y0 + i)[:, :, None]
        acc = acc + jnp.where(sel_h, tmp[:, None, :], 0.0)
    out_ref[...] = acc.astype(out_ref.dtype)


def _pad_maps(n):
    return n + ((-n) % BM)


def _run_fwd(corr_flat, rows0, cols0, win, interpret):
    n, h2, w2 = corr_flat.shape
    np_ = _pad_maps(n)
    lanes = _lane_pad(win * win)
    if np_ != n:
        corr_flat = jnp.pad(corr_flat, ((0, np_ - n), (0, 0), (0, 0)))
        rows0 = jnp.pad(rows0, (0, np_ - n))
        cols0 = jnp.pad(cols0, (0, np_ - n))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, win=win),
        grid=(np_ // BM,),
        in_specs=[
            pl.BlockSpec((BM, 1), lambda i: (i, 0)),
            pl.BlockSpec((BM, 1), lambda i: (i, 0)),
            pl.BlockSpec((BM, h2, w2), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BM, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, lanes), jnp.float32),
        interpret=interpret,
    )(rows0.reshape(np_, 1).astype(jnp.int32),
      cols0.reshape(np_, 1).astype(jnp.int32), corr_flat)
    return out[:n, :win * win].reshape(n, win, win)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def corr_window_pallas(corr_flat: jnp.ndarray, rows0: jnp.ndarray,
                       cols0: jnp.ndarray, win: int,
                       interpret: bool = False) -> jnp.ndarray:
    """window[n, i, j] = corr_flat[n, rows0[n]+i, cols0[n]+j] (0 outside).

    Args:
      corr_flat: [N, H2, W2] (any float dtype; bf16 production volumes).
      rows0, cols0: [N] int32 window origins (may be out of range — taps
        outside the map contribute zero).
      win: window size (2*radius + 2 in the lookup's shared-fraction form).
    Returns:
      [N, win, win] float32.
    """
    return _run_fwd(corr_flat, rows0, cols0, win, interpret)


def _vjp_fwd(corr_flat, rows0, cols0, win, interpret):
    out = _run_fwd(corr_flat, rows0, cols0, win, interpret)
    # corr_flat rides along for its SHAPE/DTYPE only (residual leaves must
    # be jax types, not dtype objects); its data is unused in the backward,
    # so XLA dead-code-eliminates the dependency.
    return out, (rows0, cols0, corr_flat)


def _vjp_bwd(win, interpret, residuals, g):
    rows0, cols0, corr_flat = residuals
    n, h2, w2 = corr_flat.shape
    corr_dtype = corr_flat.dtype
    np_ = _pad_maps(n)
    lanes = _lane_pad(win * win)
    g_flat = g.reshape(n, win * win).astype(jnp.float32)
    if lanes != win * win:
        g_flat = jnp.pad(g_flat, ((0, 0), (0, lanes - win * win)))
    if np_ != n:
        g_flat = jnp.pad(g_flat, ((0, np_ - n), (0, 0)))
        rows0 = jnp.pad(rows0, (0, np_ - n))
        cols0 = jnp.pad(cols0, (0, np_ - n))
    d_corr = pl.pallas_call(
        functools.partial(_bwd_kernel, win=win),
        grid=(np_ // BM,),
        in_specs=[
            pl.BlockSpec((BM, 1), lambda i: (i, 0)),
            pl.BlockSpec((BM, 1), lambda i: (i, 0)),
            pl.BlockSpec((BM, lanes), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BM, h2, w2), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, h2, w2), corr_dtype),
        interpret=interpret,
    )(rows0.reshape(np_, 1).astype(jnp.int32),
      cols0.reshape(np_, 1).astype(jnp.int32), g_flat)
    return d_corr[:n], None, None


corr_window_pallas.defvjp(_vjp_fwd, _vjp_bwd)
