"""Fused Pallas kernel for the dense softmax flow interpolation.

Computes, per (batch-bin g, query block i):

    num[q, :] = sum_n exp(-dist(q, n) / temp) * vals[n, :]
    den[q]    = sum_n exp(-dist(q, n) / temp)
    out       = num / den

in ONE pass over the database tiles: the [Bq, Nt] distance/exp tile lives
only in VMEM and feeds the MXU accumulation directly — the XLA version
materializes the full [Bq, N] weight matrix between the exp and the matmul.
No max-subtraction is needed: dist >= 0 so exp <= 1, and underflow to zero
for far points is exactly the desired truncation (the nearest trajectory is
always within a few pixels, so rows never vanish).

Layout notes (Mosaic tiling wants 128-multiple lane dims):
  * queries travel as [2, Qp] (y row, x row) and db as [G, 2, N].
  * the [BQ, BN] weight tile is built one of two ways (cross_impl):
    'vpu' (default): w = exp2(-((qy-dy)^2 + (qx-dx)^2)) on prescaled
      coordinates (sqrt(log2e/temp) folded into both operands in-kernel) —
      sub/sub/mul/fma/exp2 per element, exact to f32 rounding of the
      DIFFERENCE (no cancellation: at image scale this is ~100x more
      accurate than any q.q + d.d - 2 q.d expansion, whose f32 floor is
      ~5e-3 px^2 at 4e5-magnitude intermediates).
    'mxu': the expansion form with the cross term as a [BQ, 2] @ [2, BN]
      MXU contraction at precision=HIGHEST.  Mosaic's DEFAULT f32 dot is a
      single bf16 MXU pass whose RESULT carries ~0.4% relative error even
      with bf16-representable operands (measured: a bf16-exact hi/mid/lo
      split of the operands shows the identical ~0.4%-of-result error, so
      the rounding is in the accumulation/result path, not operand
      truncation — _scratch/si_split16_dead.py) — at pixel-scale
      coordinates that is px-scale distance error that the exp amplifies
      to O(1) weight error.  HIGHEST is exact but runs 6 MXU passes
      (measured +137 ms on the b8 x 1M train step vs the single pass).
      Kept for A/B and for hardware where the VPU build loses.
  * for 'mxu' the scaling constants (2/temp, log2 e) are folded into the
    hoisted query operands so the per-element weight build is sub+sub+exp2.
  * values travel as [G, C+1, N] with an appended ones-row, so the
    denominator falls out of the same matmul as the numerator
  * the kernel computes out^T [C+1, BQ] = vals_tile [C+1, BN] @ w^T [BN, BQ]
    at default dot precision: the bf16-pass truncation of weights/values is
    ~0.4% relative on the NORMALIZED interpolation (num and den share it),
    the same noise class as the bf16-UNet default and the documented
    one-hot-matmul paths (ops/events.py).
  * queries are edge-padded to the BQ multiple (see _pad_last_edge): a far
    sentinel would blow the final block's _tile_band up to a full scan.

The backward pass (d vals = w^T (g / den); the weights are stop-gradient by
design, matching the reference's no-grad interpolation weights,
focus.py:158-163) recomputes the weights with transposed accumulation.

Public API keeps natural shapes: queries [Q, 2], db [G, N, 2],
vals [G, N, C] -> out [G, Q, C]; the wrapper transposes and pads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Queries per program x database tile per inner step.  The [BQ, BN] f32
# temporaries (dy, dx, w) must fit VMEM several times over.
BQ = 512
BN = 1024

_LOG2E = 1.4426950408889634  # exp(x) == exp2(x * log2(e))


def _tile_band(band_ref, q_ref, n):
    """Database-tile range [t_lo, t_hi) covering this query block's row band.

    band_ref holds rows of (margin_px, cell_size, wq); the db slots are
    row-major over the trajectory START grid, so slots within margin of the
    block's query rows live in a contiguous slot band.  Tiles outside carry
    weights < exp(-margin^2/temp) ~ 0, so truncation is numerically exact
    for margin >> sqrt(temp) + max displacement.  margin_px <= 0 disables
    banding (full range).  One row = a margin shared by every group; G rows
    = a per-group margin (e.g. per-bin: a linear-basis trajectory has moved
    at most cap * t_mid by bin midtime, so early bins scan a much narrower
    band — see losses/focus.py interp_band_per_bin).
    """
    r = pl.program_id(0) if band_ref.shape[0] > 1 else 0
    margin = band_ref[r, 0]
    cell = band_ref[r, 1]
    wq = band_ref[r, 2]
    qy = q_ref[0:1, :]
    full = jnp.int32(n // BN)

    min_qy = jnp.min(qy)
    # Queries are edge-padded (real coordinates), so max is already tight;
    # the clamp is a belt-and-braces guard against sentinel-like inputs.
    max_qy = jnp.minimum(jnp.max(qy), jnp.float32(1e5))
    lo_slot = jnp.floor((min_qy - margin) / cell) * wq
    hi_slot = (jnp.floor((max_qy + margin) / cell) + 1.0) * wq
    t_lo = jnp.clip(lo_slot / BN, 0, full).astype(jnp.int32)
    t_hi = jnp.clip(jnp.ceil(hi_slot / BN), 0, full).astype(jnp.int32)
    use_band = margin > 0
    t_lo = jnp.where(use_band, t_lo, 0)
    t_hi = jnp.where(use_band, t_hi, full)
    return t_lo, t_hi


def _exp_weights_mxu(qts, qns, db_ref, scale, t, exp_dtype=jnp.float32):
    """w [BQ, BN] = exp(-||q - d||^2 / temp) for database tile t ('mxu').

    The squared distance is expanded as q.q + d.d - 2 q.d so the cross term
    rides the (otherwise idle) MXU as a rank-2 matmul — scaling constants
    are folded into the hoisted operands: the caller passes
    qts = qt * (2 log2(e)/temp) and qns = |q|^2 * log2(e)/temp, and the
    tile norm dn absorbs the same scale, so the per-element work is
    sub+sub+exp2.  precision=HIGHEST is REQUIRED for correctness (see the
    module docstring: the single-pass DEFAULT dot's result rounding is
    px-scale distance error) and is what makes this variant slow.
    """
    dbt = db_ref[0, :, pl.ds(t * BN, BN)]            # [2, BN]
    cross = jnp.dot(qts, dbt, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [BQ, BN]
    dn = jnp.sum(dbt * dbt, axis=0, keepdims=True) * scale  # [1, BN]
    return jnp.exp2((cross - qns - dn).astype(exp_dtype))


def _exp_weights_vpu(qy, qx, db_ref, rscale, t, exp_dtype=jnp.float32):
    """w [BQ, BN] = exp(-||q - d||^2 / temp) for database tile t ('vpu').

    Direct difference form on prescaled coordinates: the caller passes
    qy/qx = q * sqrt(log2(e)/temp) as [BQ, 1] columns and rscale =
    sqrt(log2(e)/temp); the tile coordinates get the same prescale (2*BN
    muls, negligible vs the BQ*BN tile).  Per element: sub, sub, mul, fma,
    negate, exp2 — exp2 is the VPU's native transcendental.  Exact to f32
    rounding of the difference (no expansion cancellation, no MXU
    precision hazard).  exp_dtype=bfloat16 runs the exp at 2x VPU rate
    (weights are <= 1, ~0.4% relative each — the XLA path does the same,
    losses/focus.py).
    """
    dbt = db_ref[0, :, pl.ds(t * BN, BN)] * rscale   # [2, BN]
    dy = qy - dbt[0:1, :]                            # [BQ, BN]
    dx = qx - dbt[1:2, :]                            # [BQ, BN]
    d2 = dy * dy + dx * dx
    return jnp.exp2((-d2).astype(exp_dtype))


def _make_exp_weights(q_ref, temp_ref, cross_impl, exp_dtype):
    """Hoist the query-side operands; return tile -> [BQ, BN] weight fn."""
    if cross_impl not in ("vpu", "mxu"):
        # A typo'd knob silently hitting the +137 ms/step HIGHEST path (or
        # worse, a future renamed fast path) must fail loudly.
        raise ValueError(f"cross_impl must be 'vpu' or 'mxu', got "
                         f"{cross_impl!r}")
    scale = _LOG2E / temp_ref[0, 0]
    qt = jnp.transpose(q_ref[:, :])                  # [BQ, 2] (hoisted)
    if cross_impl == "vpu":
        rscale = jnp.sqrt(scale)
        qy = qt[:, 0:1] * rscale                     # [BQ, 1]
        qx = qt[:, 1:2] * rscale
        return lambda db_ref, t: _exp_weights_vpu(
            qy, qx, db_ref, rscale, t, exp_dtype)
    qts = qt * (2.0 * scale)
    qns = jnp.sum(qt * qt, axis=1, keepdims=True) * scale  # [BQ, 1]
    return lambda db_ref, t: _exp_weights_mxu(
        qts, qns, db_ref, scale, t, exp_dtype)


def _fwd_kernel(temp_ref, band_ref, q_ref, db_ref, vals_ref, out_ref, *,
                exp_dtype=jnp.float32, cross_impl="vpu"):
    """q_ref [2, BQ]; db_ref [1, 2, N]; vals_ref [1, C1, N]; out [1, C1, BQ]."""
    c1 = vals_ref.shape[1]
    n = db_ref.shape[2]
    t_lo, t_hi = _tile_band(band_ref, q_ref, n)
    exp_weights = _make_exp_weights(q_ref, temp_ref, cross_impl, exp_dtype)

    def body(t, acc):
        vals_t = vals_ref[0, :, pl.ds(t * BN, BN)].astype(exp_dtype)
        w = exp_weights(db_ref, t)                   # [BQ, BN]
        # acc [C1, BQ] += vals_t [C1, BN] @ w^T [BN, BQ]
        return acc + jax.lax.dot_general(
            vals_t, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        t_lo, t_hi, body, jnp.zeros((c1, BQ), jnp.float32))
    out_ref[0, :, :] = acc


def _bwd_kernel(temp_ref, band_ref, q_ref, db_ref, gden_ref, dvals_ref, *,
                exp_dtype=jnp.float32, cross_impl="vpu"):
    """d vals^T [C, N] += g_scaled [C, BQ] @ w [BQ, BN] per tile, accumulated
    over query blocks (grid dim 1 revisits the output block).

    exp_dtype=bfloat16 recomputes the weights at 2x VPU rate — the same
    noise the XLA path's checkpointed backward has (losses/focus.py runs
    its exp in bf16 inside jax.checkpoint, so the recompute is bf16 there
    too); accumulation stays f32."""
    i = pl.program_id(1)
    n = db_ref.shape[2]
    t_lo, t_hi = _tile_band(band_ref, q_ref, n)
    exp_weights = _make_exp_weights(q_ref, temp_ref, cross_impl, exp_dtype)

    @pl.when(i == 0)
    def _init():
        dvals_ref[0, :, :] = jnp.zeros_like(dvals_ref[0])

    g_scaled = gden_ref[0, :, :]                     # [C, BQ] (pre-divided)

    def body(t, _):
        w = exp_weights(db_ref, t)                   # [BQ, BN]
        upd = jnp.dot(g_scaled.astype(w.dtype), w,
                      preferred_element_type=jnp.float32)
        dvals_ref[0, :, pl.ds(t * BN, BN)] = (
            dvals_ref[0, :, pl.ds(t * BN, BN)] + upd)
        return 0

    jax.lax.fori_loop(t_lo, t_hi, body, 0)


def _pad_last(x: jnp.ndarray, mult: int, value=0.0) -> jnp.ndarray:
    pad = (-x.shape[-1]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths, constant_values=value)


def _pad_last_edge(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    """Pad the last dim to a multiple of `mult` by edge replication.

    Used for the QUERY operand: a far-sentinel pad (1e6) makes the final
    query block's _tile_band blow up to a full-database scan (its max_qy is
    the sentinel), costing ~n/BN tiles instead of the band's few.  Padding
    with the last real query keeps the band tight; the duplicate outputs are
    sliced away by the wrapper, and in the backward the padded cotangent
    columns are zero, so the duplicates contribute nothing to d vals.
    """
    pad = (-x.shape[-1]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths, mode="edge")


def _band_arr(band):
    """band -> [R, 3] f32 SMEM operand (R = 1 shared, or G per-group).

    Accepts a static (margin_px, cell, wq) tuple, a [3] array (possibly
    traced — the margin may be data-dependent, e.g. the running max
    trajectory displacement + tail slack), or a [G, 3] array giving each
    group its own margin (per-bin banding).  The kernel's t_lo/t_hi are
    dynamic either way.
    """
    if isinstance(band, (tuple, list)):
        return jnp.asarray([list(band)], jnp.float32)  # [1, 3]
    band = jnp.asarray(band, jnp.float32)
    if band.ndim == 2:
        return band                                    # [G, 3]
    return band.reshape(1, 3)


def _run_fwd(queries, db, vals, temp, interpret, band,
             exp_dtype=jnp.float32, cross_impl="vpu"):
    """queries [Q, 2], db [G, N, 2], vals [G, N, C] -> (num [G, Q, C],
    den [G, Q])."""
    g, n, c = vals.shape
    q = queries.shape[0]
    qt = _pad_last_edge(queries.T, BQ)                   # [2, Qp]
    dbt = _pad_last(jnp.swapaxes(db, 1, 2), BN, -1e6)    # [G, 2, Np]
    ones = jnp.ones((g, n, 1), vals.dtype)
    vals_ext = jnp.concatenate([vals, ones], axis=-1)     # [G, N, C+1]
    vt = _pad_last(jnp.swapaxes(vals_ext, 1, 2), BN)      # [G, C+1, Np]
    q_pad, n_pad = qt.shape[1], dbt.shape[2]
    c1 = c + 1
    temp_arr = jnp.full((1, 1), temp, jnp.float32)

    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, exp_dtype=exp_dtype,
                          cross_impl=cross_impl),
        grid=(g, q_pad // BQ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, BQ), lambda gi, qi: (0, qi)),
            pl.BlockSpec((1, 2, n_pad), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, c1, n_pad), lambda gi, qi: (gi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c1, BQ), lambda gi, qi: (gi, 0, qi)),
        out_shape=jax.ShapeDtypeStruct((g, c1, q_pad), jnp.float32),
        interpret=interpret,
    )(temp_arr, _band_arr(band), qt, dbt, vt)
    num = jnp.swapaxes(out_t[:, :c, :q], 1, 2)           # [G, Q, C]
    den = out_t[:, c, :q]                                # [G, Q]
    return num, den


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 6, 7))
def softmax_interp_pallas(queries, db, vals, temp: float = 25.0,
                          interpret: bool = False,
                          band=(0.0, 0.0, 0.0), exp_dtype=jnp.float32,
                          cross_impl: str = "vpu"):
    """out[g, q, :] = sum_n softmax_n(-||q - db[g, n]||^2 / temp) vals[g, n, :].

    Args:
      queries: [Q, 2] float32 (the static superpixel grid).
      db: [G, N, 2] float32 trajectory positions.
      vals: [G, N, C] float32 per-trajectory values.
      band: (margin_px, cell_size, wq) row-band truncation of the database
        scan — requires queries AND db slots in row-major grid order; margin
        must exceed max displacement + a few sqrt(temp).  (0, 0, 0) = off.
        May be a traced [3] f32 array, making the margin data-dependent
        (e.g. actual max displacement + slack — see focus.py's
        interp_band_dynamic); no gradient flows to it.
      exp_dtype: exp-weight/value dtype for BOTH directions (f32 default;
        bfloat16 = 2x VPU exp + 2x MXU accumulation; the forward
        normalization cancels most of the ~0.4%-per-weight noise, and the
        backward recompute matches the XLA path's bf16 checkpointed exp).
      cross_impl: weight-tile build — 'vpu' (direct prescaled difference,
        exact and fast; default) or 'mxu' (q.q+d.d-2q.d expansion with a
        precision=HIGHEST cross dot; slower, kept for A/B).  See the
        module docstring.
    Returns:
      [G, Q, C] float32.
    """
    num, den = _run_fwd(queries, db, vals, temp, interpret, band, exp_dtype,
                        cross_impl)
    return num / jnp.maximum(den, 1e-30)[..., None]


def _vjp_fwd(queries, db, vals, temp, interpret, band, exp_dtype,
             cross_impl):
    num, den = _run_fwd(queries, db, vals, temp, interpret, band, exp_dtype,
                        cross_impl)
    band = _band_arr(band)  # residual: traced bands reach the bwd kernel
    # maximum guard: the kernel skips max-subtraction (dist >= 0 keeps
    # exp <= 1), so a query whose EVERY database point is far (e.g. all
    # trajectories blown out of the band mid-divergence) underflows den to
    # exactly 0; 0/0 would poison training with NaNs, 0/1e-30 degrades to
    # zero flow for that cell.  The backward pre-scale below has always had
    # the same guard.
    return num / jnp.maximum(den, 1e-30)[..., None], (queries, db, vals, den,
                                                      band)


def _vjp_bwd(temp, interpret, exp_dtype, cross_impl, residuals, g_out):
    queries, db, vals, den, band = residuals
    g, n, c = vals.shape
    q = queries.shape[0]
    qt = _pad_last_edge(queries.T, BQ)
    dbt = _pad_last(jnp.swapaxes(db, 1, 2), BN, -1e6)
    q_pad, n_pad = qt.shape[1], dbt.shape[2]
    temp_arr = jnp.full((1, 1), temp, jnp.float32)

    # Pre-scale the cotangent by 1/den and transpose to [G, C, Qp].
    g_scaled = g_out / jnp.maximum(den, 1e-30)[..., None]
    gt = _pad_last(jnp.swapaxes(g_scaled, 1, 2), BQ)      # [G, C, Qp]

    dvals_t = pl.pallas_call(
        functools.partial(_bwd_kernel, exp_dtype=exp_dtype,
                          cross_impl=cross_impl),
        grid=(g, q_pad // BQ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, BQ), lambda gi, qi: (0, qi)),
            pl.BlockSpec((1, 2, n_pad), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, c, BQ), lambda gi, qi: (gi, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, c, n_pad), lambda gi, qi: (gi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, c, n_pad), jnp.float32),
        interpret=interpret,
    )(temp_arr, _band_arr(band), qt, dbt, gt)
    dvals = jnp.swapaxes(dvals_t[:, :, :n], 1, 2)
    # No gradient to queries (static grid), db (weights are stop-grad by
    # the loss's design), or band (scan bounds).
    return None, None, dvals, None


softmax_interp_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def softmax_interp_reference(queries, db, vals, temp: float = 25.0):
    """Dense jnp reference (same math, no blocking) for tests."""
    dy = queries[None, :, None, 0] - db[:, None, :, 0]
    dx = queries[None, :, None, 1] - db[:, None, :, 1]
    w = jnp.exp(-(dy * dy + dx * dx) / temp)       # [G, Q, N]
    num = jnp.einsum("gqn,gnc->gqc", w, vals)
    den = jnp.sum(w, axis=-1, keepdims=True)
    return num / den
