"""Banded Pallas trilinear VOXEL vote for cell-sorted events.

The on-device voxelization `jnp.zeros([nbins, H, W]).at[...].add(...)`
lowers to a serialized XLA scatter — measured 785 ms at b8 x 1M on v5e,
3.5x the whole remaining train step.  With events cell-sorted by the flow
LUT key `(y//s * nbins + bin) * wq + x//s` (data/host_ops.py::
lut_cell_sort), the trilinear vote becomes the same banded one-hot MXU
pattern as the IWE vote (iwe_vote.py), on an INTERLEAVED canvas whose rows
follow the sort order:

    row(y_int, bin) = ((y_int // s) * nbins + bin) * s + (y_int mod s)

so a 1024-event sub-block's target rows live in a narrow monotone band
(consecutive (yq, bin) cells are `s` canvas rows apart; the y+1 tap crosses
at most one superpixel boundary = +nbins*s rows; the t+1 tap is +s rows).
The two TIME taps become two synthetic event streams (weights scaled by the
temporal hat); the two Y taps are two INDEPENDENT canvas rows per event
(unlike the IWE vote's y1/y1+1, row_b is not row_a + 1 across superpixel
boundaries); the two X taps are the standard column one-hots.

The canvas [nbins*H, W] (7200 x 640 f32 = 18.4 MB at DSEC scale) exceeds
the 16 MB scoped VMEM as one block, so the kernel runs a 3D grid
(batch, col-chunk, event-block) with a [nbins*H, CW] out block per column
chunk; a per-(chunk, sub-block) skip flag (events' x extent vs the chunk)
makes each sub-block do real work in only ~1 of W/CW chunks.

Reference semantics: src/loader/utils/representation.py:95-109 /
src/loader/dsec/utils.py:29-55 (8-corner vote, value (2p-1), per-axis hat
weights and range masks).  Forward-only: the voxel build consumes static
event data — nothing differentiates through it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Measured on chip at b8 x 1M (2026-08-20), band 96: (KB=2, BE=2048)
# 167.2 ms | (2, 1024) 186.6 | (1, 2048) 172.7 | (4, 512) 213.9 |
# (1, 1024) 201.1 — vs the XLA scatter's 773 ms (4.6x).  Narrow CW=128
# dots make the tap-tile builds a larger share than in the IWE vote
# (N=640 there), which is why this kernel is ~5x the vote's per-event
# cost; still far under the scatter.
BE = 2048
KB = 2
CW = 128          # canvas columns per out block
BAND_R = 96       # covers strip + nbins*s y-tap crossing at DSEC shape


def _row(ref, j):
    return ref[0, 0, j, :].reshape(1, BE)


def _rs_spec():
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((1, 1, 1, 1, KB), lambda gi, ki, qi: (gi, ki, qi, 0, 0),
                        memory_space=pltpu.SMEM)


def _evt_spec():
    return pl.BlockSpec((1, 1, KB, BE), lambda gi, ki, qi: (gi, qi, 0, 0))


def _kernel(rs_ref, fits_ref, skip_ref, ra_ref, rb_ref, x1_ref,
            wa_ref, wb_ref, bx0_ref, bx1_ref, out_ref, *,
            compute_dtype, band):
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    hp = out_ref.shape[1]
    col0 = ki * CW

    @pl.when(qi == 0)
    def _init():
        out_ref[0] = jnp.zeros((hp, CW), jnp.float32)

    def accumulate(j, rs, nrows):
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, BE), 0) + rs
        a_t = (jnp.where(rows == _row(ra_ref, j), _row(wa_ref, j), 0.0)
               + jnp.where(rows == _row(rb_ref, j), _row(wb_ref, j), 0.0)
               ).astype(compute_dtype)
        cols = jax.lax.broadcasted_iota(jnp.int32, (BE, CW), 1) + col0
        x1 = jnp.transpose(_row(x1_ref, j))
        b = (jnp.where(cols == x1, jnp.transpose(_row(bx0_ref, j)), 0.0)
             + jnp.where(cols == x1 + 1, jnp.transpose(_row(bx1_ref, j)), 0.0)
             ).astype(compute_dtype)
        blk = jnp.dot(a_t, b, preferred_element_type=jnp.float32)
        idx = (0, pl.ds(rs, nrows), slice(None))
        out_ref[idx] = out_ref[idx] + blk

    n_chunks = hp // band
    for j in range(KB):
        rs = pl.multiple_of(rs_ref[0, 0, 0, 0, j], 8)
        fits = fits_ref[0, 0, 0, 0, j] != 0
        live = skip_ref[0, 0, 0, 0, j] == 0

        @pl.when(live & fits)
        def _banded(j=j, rs=rs):
            accumulate(j, rs, band)

        @pl.when(live & jnp.logical_not(fits))
        def _full(j=j):
            # Straggler (row extent > band, e.g. the t0/t1 concat seam or
            # unsorted input): exact band-chunked loop over the canvas.
            def body(kk, _):
                accumulate(j, pl.multiple_of(kk * band, 8), band)
                return 0

            jax.lax.fori_loop(0, n_chunks, body, 0)


def _pad_round(n, mult):
    return n + ((-n) % mult)


def _masked_window(rows_a, rows_b, wa, wb, hp, band):
    """Per-sub-block row window over BOTH tap rows (weight-masked)."""
    big = jnp.int32(1 << 30)
    lo = jnp.minimum(jnp.where(wa != 0, rows_a, big).min(-1),
                     jnp.where(wb != 0, rows_b, big).min(-1))
    hi = jnp.maximum(jnp.where(wa != 0, rows_a, -big).max(-1),
                     jnp.where(wb != 0, rows_b, -big).max(-1))
    rs = jnp.clip((lo // 8) * 8, 0, max(hp - band, 0)).astype(jnp.int32)
    fits = ((lo >= rs) & (hi < rs + band)).astype(jnp.int32)
    return rs, fits


def voxel_vote_pallas_sorted(events: jnp.ndarray, *, num_bins: int,
                             height: int, width: int, cell_size: int,
                             band: int = BAND_R,
                             interpret: bool = False) -> jnp.ndarray:
    """[B, M, 6] cell-sorted (y, x, t in [0,1], p, bin, valid) ->
    [B, num_bins, H, W] trilinear voxel grids (un-normalized).

    `cell_size` must equal the `s` of the loader's lut_cell_sort key.
    Exact for ANY input (straggler sub-blocks take the chunked full-height
    branch); only throughput depends on the sort.
    """
    assert height % cell_size == 0, (height, cell_size)
    b, m = events.shape[:2]
    y = events[..., 0]
    x = events[..., 1]
    t_norm = events[..., 2] * (num_bins - 1)
    value0 = (2.0 * events[..., 3] - 1.0) * events[..., 5]

    hp = _pad_round(num_bins * height, max(band, 8))
    band = min(_pad_round(band, 8), hp)
    wp = _pad_round(width, CW)
    nck = wp // CW

    y1 = jnp.floor(y)
    fy = y - y1
    x1f = jnp.floor(x)
    fx = x - x1f
    x1 = x1f.astype(jnp.int32)
    mx0 = ((x1f >= 0) & (x1f < width)).astype(jnp.float32)
    mx1 = ((x1f + 1 >= 0) & (x1f + 1 < width)).astype(jnp.float32)
    bx0 = (1.0 - fx) * mx0
    bx1 = fx * mx1

    def canvas_row(yi, bin_i):
        yq = jnp.floor_divide(yi, cell_size)
        return (yq * num_bins + bin_i) * cell_size + (yi - yq * cell_size)

    t1 = jnp.floor(t_norm)
    streams = []
    for dt_tap in (0, 1):
        tb = t1 + dt_tap
        wt = (1.0 - jnp.abs(tb - t_norm))
        mt = ((tb >= 0) & (tb < num_bins)).astype(jnp.float32)
        val = value0 * wt * mt
        bin_i = jnp.clip(tb, 0, num_bins - 1).astype(jnp.int32)
        rows = []
        weights = []
        for dy_tap in (0, 1):
            yi = y1 + dy_tap
            my = ((yi >= 0) & (yi < height)).astype(jnp.float32)
            wy = (1.0 - fy) if dy_tap == 0 else fy
            w = val * wy * my
            # Masked taps -> row -1 (never matches the iota) so they cannot
            # inflate the band window or collide with real rows.
            r = jnp.where(w != 0,
                          canvas_row(jnp.clip(yi, 0, height - 1)
                                     .astype(jnp.int32), bin_i),
                          -1).astype(jnp.int32)
            rows.append(r)
            weights.append(w)
        streams.append((rows[0], rows[1], weights[0], weights[1]))

    # Two time-tap streams concatenated along M (each keeps the sort order;
    # the seam sub-block falls back).
    ra = jnp.concatenate([s[0] for s in streams], axis=1)
    rb = jnp.concatenate([s[1] for s in streams], axis=1)
    wa = jnp.concatenate([s[2] for s in streams], axis=1)
    wb = jnp.concatenate([s[3] for s in streams], axis=1)
    x1c = jnp.concatenate([x1, x1], axis=1)
    bx0c = jnp.concatenate([bx0, bx0], axis=1)
    bx1c = jnp.concatenate([bx1, bx1], axis=1)

    m2 = 2 * m
    mp = _pad_round(m2, KB * BE)
    pad = mp - m2

    def padm(a, fill=0):
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)

    ra, rb = padm(ra, -1), padm(rb, -1)
    wa, wb, x1c, bx0c, bx1c = (padm(a) for a in (wa, wb, x1c, bx0c, bx1c))
    nb = mp // (KB * BE)
    shape4 = (b, nb, KB, BE)
    ra4, rb4 = ra.reshape(shape4), rb.reshape(shape4)
    wa4, wb4 = wa.reshape(shape4), wb.reshape(shape4)
    x14 = x1c.reshape(shape4)
    bx04, bx14 = bx0c.reshape(shape4), bx1c.reshape(shape4)

    rs, fits = _masked_window(ra4, rb4, wa4, wb4, hp, band)  # [B, nb, KB]

    # Per-(chunk, sub-block) skip: x-tap extent vs the chunk columns.
    wvalid = (wa4 != 0) | (wb4 != 0)
    big = jnp.int32(1 << 30)
    xlo = jnp.where(wvalid & (bx04 != 0), x14, big).min(-1)
    xlo = jnp.minimum(xlo, jnp.where(wvalid & (bx14 != 0), x14 + 1, big)
                      .min(-1))                               # [B, nb, KB]
    xhi = jnp.where(wvalid & (bx04 != 0), x14, -big).max(-1)
    xhi = jnp.maximum(xhi, jnp.where(wvalid & (bx14 != 0), x14 + 1, -big)
                      .max(-1))
    ck = jnp.arange(nck, dtype=jnp.int32)[None, :, None, None]
    skip = ((xhi[:, None] < ck * CW) | (xlo[:, None] >= (ck + 1) * CW))
    # A sub-block with NO valid taps at all: xlo=big > xhi=-big -> skip.
    skip = skip.astype(jnp.int32)                             # [B, nck, nb, KB]

    def smem5(a):                                             # [B, nck, nb, 1, KB]
        return a[:, :, :, None, :]

    rs5 = smem5(jnp.broadcast_to(rs[:, None], skip.shape))
    fits5 = smem5(jnp.broadcast_to(fits[:, None], skip.shape))
    skip5 = smem5(skip)

    out = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=jnp.bfloat16, band=band),
        grid=(b, nck, nb),
        in_specs=[_rs_spec(), _rs_spec(), _rs_spec()]
        + [_evt_spec() for _ in range(7)],
        out_specs=pl.BlockSpec((1, hp, CW), lambda gi, ki, qi: (gi, 0, ki)),
        out_shape=jax.ShapeDtypeStruct((b, hp, nck * CW), jnp.float32),
        interpret=interpret,
    )(rs5, fits5, skip5, ra4, rb4, x14, wa4, wb4, bx04, bx14)

    # Interleaved canvas -> [B, nbins, H, W].
    hq = height // cell_size
    canvas = out[:, :num_bins * height, :width]
    voxel = canvas.reshape(b, hq, num_bins, cell_size, width)
    return jnp.transpose(voxel, (0, 2, 1, 3, 4)).reshape(
        b, num_bins, height, width)
