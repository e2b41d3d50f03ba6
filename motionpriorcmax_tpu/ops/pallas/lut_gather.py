"""Banded Pallas LUT gather for CELL-SORTED events.

The flow-LUT lookup out[e, :] = lut[row_e, col_e, :] is a random-access
gather that XLA runs at ~130 M rows/s on v5e (~66 ms at 8 x 1M events,
2 channels).  With events cell-sorted y-major (data/host_ops.py::
lut_cell_sort), each 1024-event sub-block touches rows inside a ~2
superpixel-row window, i.e. a [BAND_R = 32, Wq] LUT slice at a per-sub-block
dynamic offset.  The gather then becomes two canonical one-hot contractions
entirely in VMEM:

    m2_c [R, E] = slice_c [R, Wq] @ B^T [Wq, E]     (col one-hots)
    out_c [E]   = sum_r A_t [R, E] * m2_c [R, E]    (row one-hots, sublane
                                                     reduction)

which is the same tiles-in-the-consumed-orientation pattern as the banded
IWE vote (iwe_vote.py).  A sub-block whose row extent exceeds BAND_R (e.g.
straddling many empty superpixel rows) runs a full-height pl.when branch —
per sub-block, exact, no XLA cond.

The row windows come from the STATIC event coordinates, so they are exact
and never data-dependent on gradients.  This module provides only the
forward; grid_gather's custom VJP (ops/events.py) pairs it with the O(M)
cumsum-difference backward.

Reference semantics: per-event flow lookup by (bin, y // s, x // s),
src/losses/focus.py:182-195.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BE = 1024   # events per sub-block (lane dim of per-event vectors)
# Sub-blocks per program.  Measured on chip at b8 x 1M (2026-08-20): KB=4
# runs 8.5 ms vs KB=8's 47.6 ms for IDENTICAL output — eight interleaved
# dual-branch (pl.when banded/full) sub-block bodies per program hit a
# Mosaic serialization/pressure cliff; KB=2 8.8 ms, KB=1 9.7 ms.
KB = 4
BAND_R = 32 # LUT rows per banded window (>= 2 * n_bins for y-major keys)


def _rs_spec():
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((1, 1, 1, KB), lambda gi, qi: (gi, qi, 0, 0),
                        memory_space=pltpu.SMEM)


def _evt_spec():
    return pl.BlockSpec((1, 1, KB, BE), lambda gi, qi: (gi, qi, 0, 0))


def _row(ref, j):
    return ref[0, 0, j, :].reshape(1, BE)


def _kernel(rs_ref, fits_ref, rows_ref, cols_ref, lut_ref, out_ref, *, c,
            band, precision=None):
    """rows/cols [1,1,KB,BE] int32; lut [1, R, Wq*C]; out [1,1,KB,C*BE]."""
    r_full = lut_ref.shape[1]
    wq = lut_ref.shape[2] // c

    def window(j, rs, accumulate):
        """Gather contributions from LUT rows [rs, rs + band)."""
        lut = lut_ref[0, pl.ds(rs, band), :]                 # [band, Wq*C]
        cols = _row(cols_ref, j)                             # [1, E]
        colsT = jax.lax.broadcasted_iota(jnp.int32, (wq, BE), 0)
        b_t = jnp.where(colsT == cols, 1.0, 0.0)             # [Wq, E]
        rows = _row(rows_ref, j)
        riota = jax.lax.broadcasted_iota(jnp.int32, (band, BE), 0) + rs
        a_t = jnp.where(riota == rows, 1.0, 0.0)             # [band, E]
        for ci in range(c):
            slice_c = lut[:, ci * wq:(ci + 1) * wq]          # [band, Wq]
            # precision=HIGHEST keeps the gathered VALUES exact (one
            # non-zero per column -> no accumulation; only operand
            # truncation could round, and HIGHEST prevents it).  Needed
            # when callers difference the results (csum boundary gather);
            # None (DEFAULT, ~0.4% result rounding) is fine for the flow
            # LUT whose tolerance is value-scale.
            m2 = jnp.dot(slice_c, b_t, precision=precision,
                         preferred_element_type=jnp.float32)  # [band, E]
            part = jnp.sum(a_t * m2, axis=0)
            sl = pl.ds(ci * BE, BE)
            if accumulate:
                out_ref[0, 0, j, sl] = out_ref[0, 0, j, sl] + part
            else:
                out_ref[0, 0, j, sl] = part

    # r_full is padded to a band multiple by the wrapper.
    n_chunks = r_full // band

    for j in range(KB):
        rs = pl.multiple_of(rs_ref[0, 0, 0, j], 8)
        fits = fits_ref[0, 0, 0, j] != 0

        @pl.when(fits)
        def _banded(j=j, rs=rs):
            window(j, rs, accumulate=False)

        @pl.when(jnp.logical_not(fits))
        def _full(j=j):
            # Full-height scan as a LOOP of band-row windows: VMEM stays
            # band-bounded for any LUT height (a single full-height window
            # allocated [R_full, BE] temporaries — 16 MB at EVIMO2's
            # 96 * 41 = 3936 rows — and blew the scoped-vmem limit).
            out_ref[0, 0, j, :] = jnp.zeros_like(out_ref[0, 0, j, :])

            def body(kk, _):
                window(j, pl.multiple_of(kk * band, 8), accumulate=True)
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)


def _pad_round(n, mult):
    return n + ((-n) % mult)


def lut_gather_sorted(lut_grid: jnp.ndarray, rows_idx: jnp.ndarray,
                      cols_idx: jnp.ndarray,
                      interpret: bool = False,
                      band_rows: int | None = None,
                      precision=None) -> jnp.ndarray:
    """out[b, e, :] = lut_grid[b, rows_idx[b,e], cols_idx[b,e], :].

    Requires rows_idx ascending along E per polarity segment (cell-sorted
    events).  Exact for any input: non-fitting sub-blocks take the
    full-height branch.  The one-hot contraction is exact for in-range
    indices; rows/cols must be pre-clipped (grid_gather's contract).

    Args:
      lut_grid: [B, R, Wq, C] float32 (flow LUT, y-major rows).
      rows_idx, cols_idx: [B, M] int32 in range.
      band_rows: window height; cover >= 2 iy values of rows, i.e.
        >= 2 * n_bins for y-major keys (default BAND_R = 32 suits
        n_bins <= 15; pass ~4 * n_bins for larger bin counts).
    Returns:
      [B, M, C] float32.
    """
    b, r, wq, c = lut_grid.shape
    m = rows_idx.shape[1]
    mp = _pad_round(m, KB * BE)
    if mp != m:
        rows_idx = jnp.pad(rows_idx, ((0, 0), (0, mp - m)))
        cols_idx = jnp.pad(cols_idx, ((0, 0), (0, mp - m)))
    nb = mp // (KB * BE)
    rows4 = rows_idx.reshape(b, nb, KB, BE)
    cols4 = cols_idx.reshape(b, nb, KB, BE)

    band = _pad_round(band_rows or BAND_R, 8)
    # Pad the row dim to a BAND multiple so the kernel's full-height
    # fallback is an exact loop of band-row windows.
    r_pad = _pad_round(r, band)
    band = min(band, r_pad)
    wq_pad = _pad_round(wq, 128)
    lut_pad = jnp.pad(lut_grid, ((0, 0), (0, r_pad - r), (0, wq_pad - wq),
                                 (0, 0)))
    # Channel-MAJOR lanes ([B, R, C*Wq]): each channel's [nrows, Wq] slice
    # is then a contiguous static lane block inside the kernel.
    lut_flat = jnp.moveaxis(lut_pad, -1, 2).reshape(b, r_pad, c * wq_pad)

    lo = rows4.min(-1)
    hi = rows4.max(-1)
    rs = jnp.clip((lo // 8) * 8, 0, max(r_pad - band, 0)).astype(jnp.int32)
    fits = ((lo >= rs) & (hi < rs + band)).astype(jnp.int32)
    rs = rs[:, :, None, :]
    fits = fits[:, :, None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, c=c, band=band, precision=precision),
        grid=(b, nb),
        in_specs=[_rs_spec(), _rs_spec(), _evt_spec(), _evt_spec(),
                  pl.BlockSpec((1, r_pad, wq_pad * c),
                               lambda gi, qi: (gi, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, KB, c * BE),
                               lambda gi, qi: (gi, qi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, KB, c * BE), jnp.float32),
        interpret=interpret,
    )(rs, fits, rows4, cols4, lut_flat)
    # [B, nb, KB, C, BE] -> [B, M, C]
    out = out.reshape(b, nb, KB, c, BE)
    out = jnp.moveaxis(out, 3, -1).reshape(b, mp, c)
    return out[:, :m]
