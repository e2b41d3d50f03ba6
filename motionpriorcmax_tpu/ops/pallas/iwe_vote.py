"""Fused Pallas kernel for the bilinear IWE vote (one-hot matmul form).

The XLA formulation (ops/events.py::iwe_bilinear_vote_matmul) materializes
the per-block two-tap matrices A [E, H] / B [E, W] in HBM between the
comparison ops and the dot — at DSEC b4 x 1M scale that is ~19 GB of HBM
traffic (~23 ms at v5e bandwidth), comparable to the matmul time itself.
Here each program builds the tap tiles directly in VMEM and feeds the MXU:

    out [H, W] += A_t [H, E] @ B [E, W]
    A_t[h, e] = ay0_e*[h==y1_e] + ay1_e*[h==y1_e+1]   (v and the row
                range masks are folded into ay0/ay1)
    B[e, w]   = bx0_e*[w==x1_e] + bx1_e*[w==x1_e+1]   (col masks in bx*)

Semantics match the reference bilinear_vote_tensor exactly (see
iwe_bilinear_vote, src/utils/event_image_converter.py:333-391): the wrapper
computes the same floor(+1e-6) taps and per-axis masks, the kernel only
evaluates the sum.

Backward (custom VJP — Pallas has no autodiff): per event block
    dA_t = G  x_W  B        (contract W)   -> row-tap selections give dfy
    dB   = A_t x_H G        (contract H)   -> col-tap selections give dfx
with the tap selections Σ_h dA_t ⊙ onehot = one VPU reduction each; dv
comes from the same selections scaled by the raw (weight-free) tap values.

Layouts: per-event vectors are staged as [B, nb, KB, BE] so each program's
block is (1, 1, KB, BE) — the trailing (KB=8, BE=1024) tile satisfies the
Mosaic (8, 128) divisibility rule (a flat (1, 1, E) layout does NOT lower
on real TPUs once nb > 1).  The kernel unrolls KB sub-blocks of BE events,
each one MXU dot of A_t [Hp, BE] @ B [BE, Wp]; A_t keeps H on sublanes / E
on lanes, B keeps E on sublanes / W on lanes — all 8/128-aligned for the
H/W padding the wrapper applies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Events per MXU dot (lane-dim of the per-event vectors) and sub-blocks per
# program: each program handles KB * BE events.  A_t [Hp, BE] + B [BE, Wp]
# bf16 tiles must fit VMEM a few times over alongside the [Hp, Wp] f32
# accumulator (~3.5 MB total at 480x640).
BE = 1024
# Measured on chip at b8 x 1M (2026-08-20): KB=4 runs the banded sorted
# vote fwd 33.9 ms / fwd+bwd 52.6 ms vs KB=8's 41.5 / 81.0 for identical
# output — same Mosaic per-program serialization cliff as lut_gather.py's
# KB (eight interleaved dual-branch sub-block bodies); KB=2 is a wash.
KB = 4
# Fuse the banded backward's two per-sub-block contractions (da_t = G @ B^T
# and m_t = G @ D) into ONE MXU pass over a lane-concatenated [Wp, 2*BE]
# RHS.  Measured on chip 2026-08-20 (b8 x 1M, fwd+bwd): fused LOSES at
# every band — 55.3 vs 52.6 ms at band 144, 49.4 vs 46.2 at 96 (the
# [band, 2048]-lane result tile costs more than the second dot saves) —
# keep the split dots; flag retained for re-measurement on new hardware.
FUSED_BWD = False


def _taps(coords_yx, weight, height, width):
    """floor(+1e-6) two-tap weights with per-axis range masks.

    Returns (y1, x1, ay0, ay1, bx0, bx1, vm0, vm1, mx0, mx1, wy0m0, wy1m1):
    the forward taps plus the factors the backward kernel needs.
    """
    floor_yx = jnp.floor(coords_yx + 1e-6)
    frac = coords_yx - floor_yx
    fy, fx = frac[..., 0], frac[..., 1]
    y1 = floor_yx[..., 0].astype(jnp.int32)
    x1 = floor_yx[..., 1].astype(jnp.int32)
    m0 = ((y1 >= 0) & (y1 < height)).astype(fy.dtype)
    m1 = ((y1 + 1 >= 0) & (y1 + 1 < height)).astype(fy.dtype)
    mx0 = ((x1 >= 0) & (x1 < width)).astype(fx.dtype)
    mx1 = ((x1 + 1 >= 0) & (x1 + 1 < width)).astype(fx.dtype)
    wy0 = (1.0 - fy)
    wy1 = fy
    return (y1, x1,
            wy0 * weight * m0, wy1 * weight * m1,        # ay0, ay1
            (1.0 - fx) * mx0, fx * mx1,                  # bx0, bx1
            weight * m0, weight * m1,                    # vm0, vm1
            mx0, mx1, wy0 * m0, wy1 * m1)                # wy0m0, wy1m1


def _row(ref, j):
    """[1, 1, KB, BE] ref -> [1, BE] row j (static j)."""
    return ref[0, 0, j, :].reshape(1, BE)


def _build_tiles(y1_ref, x1_ref, ay0_ref, ay1_ref, bx0_ref, bx1_ref,
                 j, hp, wp, dtype):
    # Full-height tiles are the banded build with a zero offset — one
    # tap-construction (floor/one-hot contract) to maintain.
    return _build_tiles_banded(y1_ref, x1_ref, ay0_ref, ay1_ref, bx0_ref,
                               bx1_ref, j, 0, hp, wp, dtype)


def _fwd_kernel(y1_ref, x1_ref, ay0_ref, ay1_ref, bx0_ref, bx1_ref, out_ref,
                *, compute_dtype):
    i = pl.program_id(1)
    hp, wp = out_ref.shape[1], out_ref.shape[2]

    @pl.when(i == 0)
    def _init():
        out_ref[0] = jnp.zeros((hp, wp), jnp.float32)

    acc = out_ref[0]
    for j in range(KB):
        a_t, b = _build_tiles(y1_ref, x1_ref, ay0_ref, ay1_ref, bx0_ref,
                              bx1_ref, j, hp, wp, compute_dtype)
        acc = acc + jnp.dot(a_t, b, preferred_element_type=jnp.float32)
    out_ref[0] = acc


def _bwd_kernel(y1_ref, x1_ref, ay0_ref, ay1_ref, bx0_ref, bx1_ref,
                vm0_ref, vm1_ref, mx0_ref, mx1_ref, wy0m0_ref, wy1m1_ref,
                g_ref, dfy_ref, dfx_ref, dv_ref, *, compute_dtype):
    # NOTE an [E, hp]/[E, wp] tile layout with two standard lane-contraction
    # dots (g pre-transposed outside) was tried and measured SLOWER (221 vs
    # 177 ms standalone at b4 x 1M) than letting Mosaic handle these
    # dot_general contractions — keep this formulation.
    hp, wp = g_ref.shape[1], g_ref.shape[2]
    g = g_ref[0].astype(compute_dtype)
    for j in range(KB):
        a_t, b = _build_tiles(y1_ref, x1_ref, ay0_ref, ay1_ref, bx0_ref,
                              bx1_ref, j, hp, wp, compute_dtype)

        # dA_t [Hp, E] = G [Hp, Wp] . B [E, Wp] contracted over W.
        da_t = jax.lax.dot_general(g, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (hp, BE), 0)
        y1 = _row(y1_ref, j)
        sel0 = jnp.sum(jnp.where(rows == y1, da_t, 0.0), axis=0,
                       keepdims=True)                             # [1, E]
        sel1 = jnp.sum(jnp.where(rows == y1 + 1, da_t, 0.0), axis=0,
                       keepdims=True)
        dfy_ref[0, 0, j, :] = (sel1 * _row(vm1_ref, j)
                               - sel0 * _row(vm0_ref, j)).reshape(BE)
        dv_ref[0, 0, j, :] = (sel0 * _row(wy0m0_ref, j)
                              + sel1 * _row(wy1m1_ref, j)).reshape(BE)

        # dB [E, Wp] = A_t [Hp, E] . G [Hp, Wp] contracted over H.
        db = jax.lax.dot_general(a_t, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (BE, wp), 1)
        x1 = jnp.transpose(_row(x1_ref, j))
        selx0 = jnp.sum(jnp.where(cols == x1, db, 0.0), axis=1,
                        keepdims=True)                            # [E, 1]
        selx1 = jnp.sum(jnp.where(cols == x1 + 1, db, 0.0), axis=1,
                        keepdims=True)
        dfx = (selx1 * jnp.transpose(_row(mx1_ref, j))
               - selx0 * jnp.transpose(_row(mx0_ref, j)))         # [E, 1]
        dfx_ref[0, 0, j, :] = jnp.transpose(dfx).reshape(BE)


def _pad_round(n, mult):
    return n + ((-n) % mult)


def _prep(coords_yx, weight, height, width):
    """[B, M, 2], [B, M] -> 12 arrays [B, nb, KB, BE] (+ block count)."""
    bsz, m = weight.shape
    mp = _pad_round(m, KB * BE)
    if mp != m:
        coords_yx = jnp.pad(coords_yx, ((0, 0), (0, mp - m), (0, 0)))
        weight = jnp.pad(weight, ((0, 0), (0, mp - m)))
    nb = mp // (KB * BE)
    parts = _taps(coords_yx, weight, height, width)
    return tuple(p.reshape(bsz, nb, KB, BE) for p in parts), nb


def _evt_spec():
    return pl.BlockSpec((1, 1, KB, BE), lambda gi, qi: (gi, qi, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def iwe_vote_pallas(coords_yx, weight, height: int, width: int,
                    compute_dtype=jnp.bfloat16, interpret: bool = False):
    """Batched bilinear vote on the MXU: [B, M, 2], [B, M] -> [B, H, W]."""
    out, _ = _vjp_fwd(coords_yx, weight, height, width, compute_dtype,
                      interpret)
    return out


def _full_fwd_call(parts6, bsz, nb, hp, wp, compute_dtype, interpret):
    return pl.pallas_call(
        functools.partial(_fwd_kernel, compute_dtype=compute_dtype),
        grid=(bsz, nb),
        in_specs=[_evt_spec() for _ in range(6)],
        out_specs=pl.BlockSpec((1, hp, wp), lambda gi, qi: (gi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32),
        interpret=interpret,
    )(*parts6)


def _full_bwd_call(parts, g_pad, bsz, nb, hp, wp, compute_dtype, interpret):
    return pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype=compute_dtype),
        grid=(bsz, nb),
        in_specs=[_evt_spec() for _ in range(12)] + [
            pl.BlockSpec((1, hp, wp), lambda gi, qi: (gi, 0, 0))],
        out_specs=[_evt_spec() for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((bsz, nb, KB, BE), jnp.float32)
                   for _ in range(3)],
        interpret=interpret,
    )(*parts, g_pad)


def _vjp_fwd(coords_yx, weight, height, width, compute_dtype, interpret):
    bsz = weight.shape[0]
    hp, wp = _pad_round(height, 8), _pad_round(width, 128)
    (y1, x1, ay0, ay1, bx0, bx1, *_), nb = _prep(coords_yx, weight,
                                                 height, width)
    out = _full_fwd_call((y1, x1, ay0, ay1, bx0, bx1), bsz, nb, hp, wp,
                         compute_dtype, interpret)
    return out[:, :height, :width], (coords_yx, weight)


def _vjp_bwd(height, width, compute_dtype, interpret, residuals, g_out):
    coords_yx, weight = residuals
    bsz, m = weight.shape
    hp, wp = _pad_round(height, 8), _pad_round(width, 128)
    parts, nb = _prep(coords_yx, weight, height, width)
    g_pad = jnp.zeros((bsz, hp, wp), jnp.float32)
    g_pad = g_pad.at[:, :height, :width].set(g_out)

    dfy, dfx, dv = _full_bwd_call(parts, g_pad, bsz, nb, hp, wp,
                                  compute_dtype, interpret)

    def unpad(a):
        return a.reshape(bsz, nb * KB * BE)[:, :m]

    dcoords = jnp.stack([unpad(dfy), unpad(dfx)], axis=-1)
    return dcoords, unpad(dv)


iwe_vote_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Banded variant for cell-sorted events (data/host_ops.py::lut_cell_sort).
#
# With events sorted y-major by LUT cell, each BE-event sub-block lives in a
# ~2-superpixel-row strip, so its warped taps span <= strip + 2*max_disp
# rows.  The kernel then builds A_t as a [BAND, BE] tile at a per-sub-block
# dynamic row offset instead of [Hp, BE] — BAND/Hp of the one-hot build and
# MXU work (2.5x at 480x640 with BAND=192).  Row windows and per-sub-block
# "fits" flags are computed in XLA from the actual tap extents; a sub-block
# whose extent exceeds the band (e.g. wild early-training flows) runs a
# full-height pl.when branch INSIDE the kernel — per sub-block, no XLA
# cond — so results are exact for coords gradients in all cases, and one
# straggler cannot force the whole batch off the banded path.  The one
# approximation: dweight of
# zero-weight events whose taps fall outside their block's window (only
# kernel padding rows in practice) reads 0 — callers must stop_gradient the
# weights, as the focus loss does (losses/focus.py::make_iwes).
# ---------------------------------------------------------------------------


def _row_windows(y1, vm0, vm1, hp, band):
    """Per-sub-block row window starts + fits flags, both [B, nb, 1, KB].

    Taps that matter are row y1 where vm0 != 0 and row y1+1 where vm1 != 0
    (vm* = weight * in-range mask — NOT the bilinear-folded ay*, whose
    coefficient can be 0 for a tap the backward still reads).  A sub-block
    whose tap extent exceeds the band gets fits=0 and the kernel runs its
    full-height path for that sub-block only (pl.when branch)."""
    big = jnp.int32(1 << 30)
    lo = jnp.minimum(jnp.where(vm0 != 0, y1, big).min(-1),
                     jnp.where(vm1 != 0, y1 + 1, big).min(-1))
    hi = jnp.maximum(jnp.where(vm0 != 0, y1, -big).max(-1),
                     jnp.where(vm1 != 0, y1 + 1, -big).max(-1))
    rs = jnp.clip((lo // 8) * 8, 0, max(hp - band, 0)).astype(jnp.int32)
    fits = ((lo >= rs) & (hi < rs + band)).astype(jnp.int32)
    return rs[:, :, None, :], fits[:, :, None, :]


def _build_tiles_banded(y1_ref, x1_ref, ay0_ref, ay1_ref, bx0_ref, bx1_ref,
                        j, rs, band, wp, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (band, BE), 0) + rs
    y1 = _row(y1_ref, j)
    a_t = (jnp.where(rows == y1, _row(ay0_ref, j), 0.0)
           + jnp.where(rows == y1 + 1, _row(ay1_ref, j), 0.0))
    cols = jax.lax.broadcasted_iota(jnp.int32, (BE, wp), 1)
    x1 = jnp.transpose(_row(x1_ref, j))
    b = (jnp.where(cols == x1, jnp.transpose(_row(bx0_ref, j)), 0.0)
         + jnp.where(cols == x1 + 1, jnp.transpose(_row(bx1_ref, j)), 0.0))
    return a_t.astype(dtype), b.astype(dtype)


def _banded_fwd_kernel(rs_ref, fits_ref, y1_ref, x1_ref, ay0_ref, ay1_ref,
                       bx0_ref, bx1_ref, out_ref, *, compute_dtype, band):
    i = pl.program_id(1)
    hp, wp = out_ref.shape[1], out_ref.shape[2]

    @pl.when(i == 0)
    def _init():
        out_ref[0] = jnp.zeros((hp, wp), jnp.float32)

    def accumulate(j, rs, nrows):
        a_t, b = _build_tiles_banded(y1_ref, x1_ref, ay0_ref, ay1_ref,
                                     bx0_ref, bx1_ref, j, rs, nrows, wp,
                                     compute_dtype)
        blk = jnp.dot(a_t, b, preferred_element_type=jnp.float32)
        idx = (0, pl.ds(rs, nrows), slice(None))
        out_ref[idx] = out_ref[idx] + blk

    for j in range(KB):
        rs = pl.multiple_of(rs_ref[0, 0, 0, j], 8)
        fits = fits_ref[0, 0, 0, j] != 0

        @pl.when(fits)
        def _banded(j=j, rs=rs):
            accumulate(j, rs, band)

        # Rare straggler (tap extent > band, e.g. wild early-training
        # flows): full-height path for THIS sub-block only — exactness
        # without an XLA-level cond.
        @pl.when(jnp.logical_not(fits))
        def _full(j=j):
            accumulate(j, 0, hp)


def _banded_bwd_kernel(rs_ref, fits_ref, y1_ref, x1_ref, ay0_ref, ay1_ref,
                       bx0_ref, bx1_ref, vm0_ref, vm1_ref, mx0_ref, mx1_ref,
                       wy0m0_ref, wy1m1_ref, g_ref, dfy_ref, dfx_ref, dv_ref,
                       *, compute_dtype, band):
    # All three cotangents are elementwise [band, E] tile products + SUBLANE
    # reductions against two canonical [m, k] @ [k, n] dots:
    #     da_t = G @ B^T   (B^T = bilinear x-taps at x1 / x1+1)
    #     m_t  = G @ D     (D   = signed x-masks: +mx1 at x1+1, -mx0 at x1)
    #     dfy[e] = sum_r (vm1*[r==y1+1] - vm0*[r==y1]) * da_t[r, e]
    #     dv[e]  = sum_r (wy0m0*[r==y1] + wy1m1*[r==y1+1]) * da_t[r, e]
    #     dfx[e] = sum_r (ay0*[r==y1] + ay1*[r==y1+1]) * m_t[r, e]
    # This avoids [E, *]-oriented tiles, lane-axis reductions, and
    # lane<->sublane transposes entirely — a dB = A @ G + lane-reduction
    # formulation of dfx measured 3x slower on v5e (Mosaic relayouts).
    wp = g_ref.shape[2]
    hp = g_ref.shape[1]

    def subblock(j, rs, nrows):
        g = g_ref[0, pl.ds(rs, nrows), :].astype(compute_dtype)  # [nrows, Wp]

        colsT = jax.lax.broadcasted_iota(jnp.int32, (wp, BE), 0)
        x1r = _row(x1_ref, j)                                      # [1, E]
        cx0 = colsT == x1r
        cx1 = colsT == x1r + 1
        b_t = (jnp.where(cx0, _row(bx0_ref, j), 0.0)
               + jnp.where(cx1, _row(bx1_ref, j), 0.0)).astype(compute_dtype)
        d_t = (jnp.where(cx1, _row(mx1_ref, j), 0.0)
               - jnp.where(cx0, _row(mx0_ref, j), 0.0)).astype(compute_dtype)
        if FUSED_BWD:
            gd = jnp.dot(g, jnp.concatenate([b_t, d_t], axis=1),
                         preferred_element_type=jnp.float32)
            da_t, m_t = gd[:, :BE], gd[:, BE:]
        else:
            da_t = jnp.dot(g, b_t, preferred_element_type=jnp.float32)
            m_t = jnp.dot(g, d_t, preferred_element_type=jnp.float32)

        rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, BE), 0) + rs
        y1 = _row(y1_ref, j)
        ry0 = rows == y1
        ry1 = rows == y1 + 1
        dfy = (jnp.where(ry1, _row(vm1_ref, j), 0.0)
               - jnp.where(ry0, _row(vm0_ref, j), 0.0)) * da_t
        dv = (jnp.where(ry0, _row(wy0m0_ref, j), 0.0)
              + jnp.where(ry1, _row(wy1m1_ref, j), 0.0)) * da_t
        dfx = (jnp.where(ry0, _row(ay0_ref, j), 0.0)
               + jnp.where(ry1, _row(ay1_ref, j), 0.0)) * m_t
        dfy_ref[0, 0, j, :] = jnp.sum(dfy, axis=0)
        dfx_ref[0, 0, j, :] = jnp.sum(dfx, axis=0)
        dv_ref[0, 0, j, :] = jnp.sum(dv, axis=0)

    for j in range(KB):
        rs = pl.multiple_of(rs_ref[0, 0, 0, j], 8)
        fits = fits_ref[0, 0, 0, j] != 0

        @pl.when(fits)
        def _banded(j=j, rs=rs):
            subblock(j, rs, band)

        @pl.when(jnp.logical_not(fits))
        def _full(j=j):
            subblock(j, 0, hp)


def _rs_spec():
    from jax.experimental.pallas import tpu as pltpu

    # rs is [B, nb, 1, KB]: the trailing (1, KB) block equals the array
    # dims, satisfying the Mosaic (8, 128)-or-equal block rule for SMEM.
    return pl.BlockSpec((1, 1, 1, KB), lambda gi, qi: (gi, qi, 0, 0),
                        memory_space=pltpu.SMEM)


def _banded_fwd_call(parts6, rs, fits, bsz, nb, hp, wp, band, compute_dtype,
                     interpret):
    return pl.pallas_call(
        functools.partial(_banded_fwd_kernel, compute_dtype=compute_dtype,
                          band=band),
        grid=(bsz, nb),
        in_specs=[_rs_spec(), _rs_spec()] + [_evt_spec() for _ in range(6)],
        out_specs=pl.BlockSpec((1, hp, wp), lambda gi, qi: (gi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32),
        interpret=interpret,
    )(rs, fits, *parts6)


def _banded_bwd_call(parts, rs, fits, g_pad, bsz, nb, hp, wp, band,
                     compute_dtype, interpret):
    return pl.pallas_call(
        functools.partial(_banded_bwd_kernel, compute_dtype=compute_dtype,
                          band=band),
        grid=(bsz, nb),
        in_specs=[_rs_spec(), _rs_spec()] + [_evt_spec() for _ in range(12)]
        + [pl.BlockSpec((1, hp, wp), lambda gi, qi: (gi, 0, 0))],
        out_specs=[_evt_spec() for _ in range(3)],
        out_shape=[jax.ShapeDtypeStruct((bsz, nb, KB, BE), jnp.float32)
                   for _ in range(3)],
        interpret=interpret,
    )(rs, fits, *parts, g_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def iwe_vote_pallas_sorted(coords_yx, weight, height: int, width: int,
                           band: int = 192, compute_dtype=jnp.bfloat16,
                           interpret: bool = False):
    """Bilinear vote for CELL-SORTED events: banded tap tiles (see above).

    Bit-identical to `iwe_vote_pallas` for output values and coords
    gradients (a sub-block whose tap extent exceeds the band runs a
    full-height pl.when branch — per sub-block, no XLA cond); dweight of
    out-of-window zero-weight padding rows reads 0 — stop_gradient the
    weights."""
    out, _ = _sorted_vjp_fwd(coords_yx, weight, height, width, band,
                             compute_dtype, interpret)
    return out


def _band_for(hp, band):
    return min(_pad_round(band, 8), hp)


def _sorted_vjp_fwd(coords_yx, weight, height, width, band, compute_dtype,
                    interpret):
    bsz = weight.shape[0]
    hp, wp = _pad_round(height, 8), _pad_round(width, 128)
    band = _band_for(hp, band)
    parts, nb = _prep(coords_yx, weight, height, width)
    y1, vm0, vm1 = parts[0], parts[6], parts[7]
    rs, fits = _row_windows(y1, vm0, vm1, hp, band)
    out = _banded_fwd_call(parts[:6], rs, fits, bsz, nb, hp, wp, band,
                           compute_dtype, interpret)
    return out[:, :height, :width], (coords_yx, weight)


def _sorted_vjp_bwd(height, width, band, compute_dtype, interpret,
                    residuals, g_out):
    coords_yx, weight = residuals
    bsz, m = weight.shape
    hp, wp = _pad_round(height, 8), _pad_round(width, 128)
    band = _band_for(hp, band)
    parts, nb = _prep(coords_yx, weight, height, width)
    rs, fits = _row_windows(parts[0], parts[6], parts[7], hp, band)
    g_pad = jnp.zeros((bsz, hp, wp), jnp.float32)
    g_pad = g_pad.at[:, :height, :width].set(g_out)

    dfy, dfx, dv = _banded_bwd_call(parts, rs, fits, g_pad, bsz, nb, hp, wp,
                                    band, compute_dtype, interpret)

    def unpad(a):
        return a.reshape(bsz, nb * KB * BE)[:, :m]

    dcoords = jnp.stack([unpad(dfy), unpad(dfx)], axis=-1)
    return dcoords, unpad(dv)


iwe_vote_pallas_sorted.defvjp(_sorted_vjp_fwd, _sorted_vjp_bwd)


def segment_sum_pallas(rows_idx, cols_idx, grads, num_rows: int,
                       num_cols: int, interpret: bool = False):
    """out[b, r, x, c] = sum_e [rows_idx==r][cols_idx==x] grads[b, e, c].

    The grid-gather backward (transpose of the flow-LUT lookup) as the SAME
    one-hot-matmul Pallas kernel as the IWE vote: integer coordinates make
    the floor(+1e-6) bilinear taps degenerate to exact one-hots (frac = 0
    -> tap weights (1, 0)), so `iwe_vote_pallas` over a [num_rows,
    num_cols] "image" IS a 2-D-factorized segment sum — tap tiles built in
    VMEM, accumulation on the MXU.  One kernel call per channel.

    Args:
      rows_idx, cols_idx: [B, M] int32, pre-clipped to range.
      grads: [B, M, C] per-event cotangents.
    Returns:
      [B, num_rows, num_cols, C] float32.
    """
    coords = jnp.stack([rows_idx.astype(jnp.float32),
                        cols_idx.astype(jnp.float32)], axis=-1)
    outs = [iwe_vote_pallas(coords, grads[..., c], num_rows, num_cols,
                            jnp.bfloat16, interpret)
            for c in range(grads.shape[-1])]
    return jnp.stack(outs, axis=-1)
