"""Multi-target correlation volumes with per-target pyramid depth.

TPU-native redesign of the reference corr machinery
(src/models/raft_spline/corr.py, SURVEY.md C30):
  * all-pairs dot-product volumes fmap1^T fmap2 / sqrt(dim) for one reference
    against N targets (corr.py:235-270) — one batched einsum on the MXU
  * per-target pyramid: level L keeps only targets with levels >= L,
    avg-pooled 2x from the previous level (corr.py:296-302)
  * lookup: a (2r+1)^2 window around curve-predicted coords per level via
    bilinear sampling, concatenated to [B, sum_l T_l*(2r+1)^2, h, w]
    (corr.py:304-348)

The irregular per-target structure is *static* (target indices and levels
come from config), so the pyramid unrolls at trace time into fixed-shape
arrays — no dynamic shapes under jit (SURVEY.md §7.3 item 5).

The reference's grid_sample-based bilinear_sampler (utils.py:4-20,
align_corners=True, zero padding) becomes an explicit gather+lerp.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def compute_corr_volume(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation: [B,D,h,w] x [T,B,D,h,w] -> [T,B,h*w,h,w].

    Reference: _corr_dot_prod_1_to_N + _corr_dot_prod_util (corr.py:235-270),
    including the 1/sqrt(D) scaling.
    """
    b, d, h, w = fmap1.shape
    t = fmap2.shape[0]
    f1 = fmap1.reshape(b, d, h * w)
    f2 = fmap2.reshape(t, b, d, h * w)
    corr = jnp.einsum("bdq,tbdp->tbqp", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(d, corr.dtype))
    return corr.reshape(t, b, h * w, h, w)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool on the last two dims (F.avg_pool2d(corr, 2, 2))."""
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    x = x.reshape(lead + (h // 2, 2, w // 2, 2))
    return x.mean(axis=(-3, -1))


def build_corr_pyramid(
    corr: jnp.ndarray, num_levels_per_target: Sequence[int]
) -> List[Tuple[Tuple[int, ...], jnp.ndarray]]:
    """[(target_indices, corr_level [T_l, B, h1*w1, h_l, w_l]), ...].

    Level 1 holds all targets at full resolution; level L keeps targets with
    levels >= L, each avg-pooled from its level L-1 volume (corr.py:296-302).
    """
    levels = list(num_levels_per_target)
    assert corr.shape[0] == len(levels)
    pyramid = [(tuple(range(len(levels))), corr)]
    for lvl in range(2, max(levels) + 1):
        keep = tuple(i for i, v in enumerate(levels) if v >= lvl)
        prev_idx, prev = pyramid[-1]
        sel = jnp.stack([prev[prev_idx.index(i)] for i in keep], axis=0)
        pyramid.append((keep, _avg_pool2(sel)))
    return pyramid


def bilinear_sample_hw(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample img[..., H, W] at fractional (x, y); zeros outside.

    Matches torch grid_sample(align_corners=True, padding_mode='zeros') after
    the reference's [0, N-1] -> [-1, 1] mapping (utils.py:4-20): align_corners
    grid sampling in normalized coords is exactly pixel-coordinate bilinear
    interpolation with zero out-of-range corners.

    Args:
      img: [N, H, W]; x, y: [N, K].
    Returns:
      [N, K].
    """
    n, h, w = img.shape
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    fx = x - x0; fy = y - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)

    flat = img.reshape(n, h * w)

    def corner(yi, xi, wgt):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        return vals * wgt * inb.astype(img.dtype)

    return (corner(y0i, x0i, (1 - fy) * (1 - fx))
            + corner(y0i, x0i + 1, (1 - fy) * fx)
            + corner(y0i + 1, x0i, fy * (1 - fx))
            + corner(y0i + 1, x0i + 1, fy * fx))


def _extract_window(corr_flat: jnp.ndarray, h_oh: jnp.ndarray,
                    w_oh: jnp.ndarray) -> jnp.ndarray:
    """Integer-aligned window extraction as two one-hot matmuls.

    window[n] = h_oh[n] @ corr_flat[n] @ w_oh[n], emitted in the CORR
    dtype: each one-hot row has exactly one non-zero, so the contraction is
    a SELECTION — a bf16 output is bit-identical to f32-accumulate-then-
    round for bf16 corr, and the autodiff transposes then run as native
    1-pass bf16 MXU dots instead of mixed f32×bf16 contractions (the
    cotangent rounds to bf16, the noise class corr_dtype='bfloat16' opted
    into; f32 volumes keep a fully f32 backward).  Deliberately NOT a
    custom_vjp: jax.custom_vjp is opaque to the remat 'dots' policy, which
    silently demoted these einsums from saved-dot-results to recomputed —
    measured +95 ms on the b6 train step.
    """
    dt = corr_flat.dtype
    band = jnp.einsum("nih,nhw->niw", h_oh, corr_flat,
                      preferred_element_type=dt)             # [N, win, W2]
    return jnp.einsum("niw,nwj->nij", band, w_oh,
                      preferred_element_type=dt)             # [N, win, win]


def _extract_window_blocked(corr_flat: jnp.ndarray, rows0: jnp.ndarray,
                            cols0: jnp.ndarray, win: int,
                            bk: int = 8) -> jnp.ndarray:
    """Window extraction as BLOCK-DIAGONAL dense matmuls (BK maps each).

    The per-map einsum form is N independent (win, H2) @ (H2, W2) matmuls —
    Mosaic issues them per batch element, so the MXU runs at ~3% utilization
    (measured 14 ms fwd per lookup at EVIMO2 b6).  Stacking BK maps into one
    dense contraction pays BK x nominal FLOPs for ~BK x fewer, ~BK x larger
    MXU dispatches:

      corr_bd [G, BK*H2, W2]   (G = N/BK, plain reshape)
      h_bd    [G, BK*win, BK*H2] block-diagonal row one-hots
      band_bd = h_bd @ corr_bd                   [G, BK*win, W2]
      wf      = band_bd @ w_all [G, W2, BK*win]  [G, BK*win, BK*win]
      window  = diagonal [win, win] blocks of wf (BK static slices)

    The W2 axis is shared by every map, so the second stage computes a full
    [BK*win, BK*win] product and keeps its block diagonal — still BK x
    cheaper to dispatch than BK tiny dots.  Selection semantics identical to
    the per-map einsums (out-of-range rows/cols match nothing -> zeros).
    """
    n, h2, w2 = corr_flat.shape
    dt = corr_flat.dtype
    pad = (-n) % bk
    if pad:
        corr_flat = jnp.pad(corr_flat, ((0, pad), (0, 0), (0, 0)))
        rows0 = jnp.pad(rows0, (0, pad))
        cols0 = jnp.pad(cols0, (0, pad))
    npad = n + pad
    g = npad // bk

    offs = jnp.arange(win, dtype=jnp.int32)
    rows = rows0[:, None] + offs[None, :]                    # [Np, win]
    cols = cols0[:, None] + offs[None, :]
    row_ok = (rows >= 0) & (rows < h2)
    col_ok = (cols >= 0) & (cols < w2)
    # Global (block-local) row ids; invalid taps -> -1 (match nothing).
    mloc = jnp.arange(npad, dtype=jnp.int32)[:, None] % bk
    rows_g = jnp.where(row_ok, rows + mloc * h2, -1).reshape(g, bk * win)
    cols_g = jnp.where(col_ok, cols, -1).reshape(g, bk * win)

    corr_bd = corr_flat.reshape(g, bk * h2, w2)
    h_bd = (rows_g[:, :, None]
            == jnp.arange(bk * h2, dtype=jnp.int32)).astype(dt)
    w_all = (jnp.arange(w2, dtype=jnp.int32)[:, None]
             == cols_g[:, None, :]).astype(dt)               # [G, W2, BK*win]
    band_bd = jnp.einsum("gih,ghw->giw", h_bd, corr_bd,
                         preferred_element_type=dt)          # [G, BKw, W2]
    wf = jnp.einsum("giw,gwj->gij", band_bd, w_all,
                    preferred_element_type=dt)               # [G, BKw, BKw]
    wf = wf.reshape(g, bk, win, bk, win)
    window = jnp.stack([wf[:, m, :, m, :] for m in range(bk)], axis=1)
    return window.reshape(npad, win, win)[:n]


def _window_lookup(corr_flat: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                   radius: int, impl: str | None = None) -> jnp.ndarray:
    """Bilinear (2r+1)^2-window lookup via per-map window extraction.

    All window offsets are integers, so every sampled point shares the same
    fractional part: extract one integer-aligned [2r+2, 2r+2] window per map
    and combine the 4 shifted views with the shared bilinear weights on the
    VPU.  The extraction must NOT be a take_along_axis pair: its AUTODIFF
    TRANSPOSE is a serialized scatter-add into the corr volume — profiled at
    b2 EVIMO2 scale the backward scan ('while' over 12 GRU iterations) spent
    ~1.2 s of a 1.47 s train step in those scatter fusions.  Two impls:

      'pallas' (TPU auto default): VPU masked-select kernel
        (ops/pallas/corr_window.py) — each query owns its own map, so the
        einsum form is N independent tiny matmuls that Mosaic issues
        per-batch at >90% MXU padding waste (measured 14 ms fwd + 12.5 ms
        volume-cotangent bwd per refinement iteration at EVIMO2 b6).
      'einsum': batched one-hot matmul pair — exact selection,
        differentiates into dense matmuls; the non-TPU / oracle path.

    Both give zero rows/cols outside the map, matching
    grid_sample(padding_mode='zeros').

    Args:
      corr_flat: [N, H2, W2] one map per query.
      cx, cy: [N] window centers (level pixels).
      impl: 'pallas' | 'einsum' | None (auto: pallas on the TPU backend).
    Returns:
      [N, (2r+1)^2] features, row-major over (dy, dx) — the reference's
      delta ordering (corr.py:322-333).
    """
    n, h2, w2 = corr_flat.shape
    r = radius
    win = 2 * r + 2

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, None, None]
    fy = (cy - y0)[:, None, None]

    if impl is None:
        impl = "einsum"
    if impl == "pallas":
        # Measured SLOWER than the einsums on v5e (lookup 37.7 vs 26.5 ms
        # fwd+bwd; Mosaic serializes the win^2 masked lane selections) —
        # kept for A/B on other hardware.
        from ...ops.pallas.corr_window import corr_window_pallas

        rows0 = (y0.astype(jnp.int32) - r)
        cols0 = (x0.astype(jnp.int32) - r)
        window = corr_window_pallas(
            corr_flat, rows0, cols0, win,
            jax.default_backend() != "tpu")                  # [N, win, win]
    elif impl == "einsum_blocked":
        window = _extract_window_blocked(
            corr_flat, y0.astype(jnp.int32) - r, x0.astype(jnp.int32) - r,
            win)
    else:
        offs = jnp.arange(-r, r + 2, dtype=jnp.int32)        # [win]
        rows = y0.astype(jnp.int32)[:, None] + offs[None, :]  # [N, win]
        cols = x0.astype(jnp.int32)[:, None] + offs[None, :]
        row_ok = (rows >= 0) & (rows < h2)
        col_ok = (cols >= 0) & (cols < w2)

        dt = corr_flat.dtype
        h_oh = ((rows[:, :, None] == jnp.arange(h2, dtype=jnp.int32))
                & row_ok[:, :, None]).astype(dt)             # [N, win, H2]
        w_oh = ((cols[:, None, :] == jnp.arange(w2, dtype=jnp.int32)[:, None])
                & col_ok[:, None, :]).astype(dt)             # [N, W2, win]
        window = _extract_window(corr_flat, h_oh, w_oh)      # [N, win, win]
    # Tag for the remat policy: 'dots_window' saves these per-iteration
    # residuals so the backward does not re-extract windows (raft.py).
    window = checkpoint_name(window, "corr_window")

    # Shared-fraction bilinear combine of the 4 shifted (2r+1)^2 views.
    w00 = window[:, :-1, :-1]
    w01 = window[:, :-1, 1:]
    w10 = window[:, 1:, :-1]
    w11 = window[:, 1:, 1:]
    feat = ((1 - fy) * ((1 - fx) * w00 + fx * w01)
            + fy * ((1 - fx) * w10 + fx * w11))
    return feat.reshape(n, (2 * r + 1) ** 2)


def lookup_corr_pyramid(
    pyramid: List[Tuple[Tuple[int, ...], jnp.ndarray]],
    coords: jnp.ndarray,
    radius: int = 4,
    impl: str | None = None,
) -> jnp.ndarray:
    """Sample a (2r+1)^2 window per level/target around predicted coords.

    Reference: CorrBlockParallelMultiTarget.__call__ (corr.py:304-348).

    Args:
      pyramid: from build_corr_pyramid.
      coords: [T0, B, 2, h1, w1], channel order (x, y) in level-0 pixels.
      radius: lookup radius r (config radius 4, raft.py:39).
      impl: window-extraction impl, see _window_lookup ('pallas'/'einsum'/
        None = backend auto).

    Returns:
      [B, sum_l T_l*(2r+1)^2, h1, w1].
    """
    t0, b, _, h1, w1 = coords.shape
    r = radius
    k = (2 * r + 1) ** 2

    out_levels = []
    for lvl, (target_idx, corr_l) in enumerate(pyramid):
        tl = len(target_idx)
        coords_sel = coords[jnp.asarray(target_idx)] / (2.0 ** lvl)
        cx = coords_sel[:, :, 0].reshape(-1)   # [T_l*B*h1*w1]
        cy = coords_sel[:, :, 1].reshape(-1)
        h2, w2 = corr_l.shape[-2:]
        # corr_l layout is [T_l, B, q(h1*w1), h2, w2]; queries flatten the
        # same way as (cx, cy) -> rows align.
        img = corr_l.reshape(-1, h2, w2)
        feat = _window_lookup(img, cx, cy, r, impl)  # [T_l*B*h1*w1, K]
        feat = feat.reshape(tl, b, h1, w1, k)
        out_levels.append(feat)

    out = jnp.concatenate(out_levels, axis=0)            # [sumT, B, h1, w1, K]
    out = jnp.transpose(out, (1, 0, 4, 2, 3))            # [B, sumT, K, h1, w1]
    return out.reshape(b, -1, h1, w1)
