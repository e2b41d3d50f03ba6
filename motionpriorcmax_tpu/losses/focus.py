"""FocusLoss: the motion-prior contrast-maximization objective.

TPU-native reimplementation of the paper's core contribution
(reference: src/losses/focus.py).  The loss warps raw events along predicted
continuous-time trajectories and maximizes the sharpness (Sobel gradient
magnitude) of the Image of Warped Events, plus a Charbonnier smoothness
regularizer.

Pipeline per step (reference focus.py:66-113):
  1. reconstruction times = [t_ref (random)] ++ per-bin midpoints        (:53-64)
  2. KNN from a superpixel-LUT grid to trajectory points at bin midtimes (:115-137)
     -> here `knn_blocked` (lax.top_k over tiled distance blocks) instead of
     PyKeOps argKmin; a Pallas kernel can swap in behind the same signature.
  3. per-LUT-cell flow to t_ref via mean / inverse-distance interpolation (:139-168)
  4. per-event flow gather by (bin, y//s, x//s) + warp                   (:182-195)
  5. bilinear-vote IWE with validity/dt/border weights (+3x3 blur)       (:197-230)
  6. loss = 1 / gradient_magnitude(IWE) + smoothness                     (:90-94)

Everything is a pure function of (trajectories, times, events, rng) with
static shapes; `polarity_aware_batching` relies on the collate packing
positive events first with a *static* pos-capacity (see data/collate.py),
mirroring the reference's shared NUM_POS_EVENTS scalar
(src/modules/data_loading.py:22-47).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import events as ev_ops
from ..ops import gradients as grad_ops
from ..ops.knn import knn_blocked, knn_grid_window

EPS = 1e-9


@dataclasses.dataclass(frozen=True)
class FocusLossConfig:
    """Hyperparameters; field names match the reference config leaves
    (config/exe/flow_training/dsec.yaml:14-25, focus.py:28-51)."""

    image_shape: Tuple[int, int] = (480, 640)
    num_tref: int = 1
    num_bins: int = 15
    num_knn: int = 32
    smooth_weight: float = 0.003
    lut_superpixel_size: int = 4
    focus_loss_norm: str = "l1"
    dist_norm: str = "l2"
    scale_iwe_by_dt: bool = True
    mask_image_border: bool = True
    polarity_aware_batching: bool = True
    interpolation_scheme: str = "mean"
    smooth_type: str = "on_flow_to_tref"
    # Objective sharpness measure: 'gradient_magnitude' (reference FocusLoss
    # default, focus.py:90) or 'variance' (utils/loss.py:6-16; exercised by
    # BASELINE.json config 2).
    loss_type: str = "gradient_magnitude"
    # Epsilon added to the sharpness before the reciprocal.  The reference
    # has none (src/utils/loss.py:12): an empty event window gives inf loss /
    # NaN grads.  > 0 bounds the loss at 1/eps (DIVERGENCES.md item 3);
    # default 0 for exact reference parity.
    focus_loss_epsilon: float = 0.0
    # TPU tiling knobs (no reference analog): queries per KNN block, and the
    # KNN reduction method:
    #   'exact'   sort-based top_k — bit-equivalent to KeOps argKmin
    #   'approx'  lax.approx_min_k — TPU-native partial reduction (~9x faster)
    #   'grid'/'grid_approx'  spatial-hash window (gather-bound; slow on TPU)
    #   'softmax' dense kernel-weighted interpolation: NO top-k and NO
    #     gathers — softmax(-dist/temp) row-weights times the flow values,
    #     computed blockwise as pure MXU/VPU matmuls.  This is the TPU-native
    #     redesign of the interpolation (random-access gather/scatter runs at
    #     ~20-60 M elem/s on TPU; dense math runs at TFLOP rates).  With
    #     temperature ~ the NN distance scale it closely approximates the
    #     reference's 32-NN mean (it is an exponential-kernel IWD).
    knn_block_size: int = 1024
    knn_method: str = "exact"
    softmax_temp: float = 25.0
    # Fused Pallas kernel for the softmax path (ops/pallas/softmax_interp):
    # None = auto (on for the TPU backend, off elsewhere); measured 2.6x the
    # XLA blockwise path (145 ms vs 376 ms fwd+bwd at DSEC scale).  l2 only.
    use_pallas_interp: Optional[bool] = None
    # Row-band truncation of the interpolation database scan (pixels).  The
    # band must cover max displacement + a few sqrt(softmax_temp); excluded
    # trajectories carry weights < exp(-band^2/temp) ~ 0, so this is
    # numerically exact, not an approximation.  DSEC displacement caps at
    # 60 px per window and temp=25 puts the kernel tail at ~15 px
    # (exp(-20^2/25) ~ 1e-7), so 80 leaves 20 px of slack; the band scan is
    # the interp kernel's dominant cost (linear in the margin).  0 disables.
    interp_band_px: float = 80.0
    # Data-dependent band margin: compute the ACTUAL max |y displacement| of
    # the trajectories from their nominal grid rows on device each step and
    # use maxdisp + 4*sqrt(temp) + cell as the margin (the kernel's scan
    # bounds are already dynamic).  The static interp_band_px then only
    # matters as documentation of the worst case: early/mid-training
    # displacements are a few px, so the scanned slot band shrinks ~3-4x.
    # Exact to the same exp(-slack^2/temp) ~ 1e-7 truncation as the static
    # band, and SAFER when displacements exceed the static cap (the band
    # grows to cover them).  Requires knn_method='softmax' + pallas interp.
    # True computes ONE margin shared by every (batch, bin) group —
    # measured WORSE than the static band on the DSEC flow path (508 vs
    # 337 ms, round 2: one diverged trajectory anywhere inflates every
    # group's scan).  'per_group' computes a [G] margin vector instead —
    # each (batch, bin) scans only its own displacement extent, which is
    # where the win lives on the 41-bin trajectory path (early-bin Bezier
    # displacements are a fraction of the final bin's; 246 groups at
    # EVIMO2 geometry).
    interp_band_dynamic: bool | str = False
    # Per-bin band margins (static-band refinement): group (batch, bin)'s
    # database holds trajectory positions at that bin's MIDTIME, and a
    # linear-basis trajectory (polynomial num_basis=1, the production DSEC
    # config: disp(t) = c1 * t with |c1| <= cap) has moved at most
    # cap * t_mid by then — so bin b's margin is
    # tail + (interp_band_px - tail) * t_mid_b  (tail = 4 sqrt(temp)),
    # and early bins scan a proportionally narrower slot band (~35% less
    # total scan at 15 bins).  Numerically exact under the same
    # tail-truncation argument as the static band, but ONLY sound for bases
    # with |disp(t)| <= |disp(1)| * t; None = auto (the trajectory-net steps
    # enable it exactly when basis_type == 'polynomial' and num_basis == 1,
    # and it is treated as False here otherwise).
    interp_band_per_bin: Optional[bool] = None
    # Pallas-interp weight-tile build: 'vpu' (direct prescaled-coordinate
    # difference — exact to f32 and the fast path) or 'mxu' (distance
    # expansion with a precision=HIGHEST cross-term dot; the single-pass
    # DEFAULT dot is numerically WRONG on real TPUs — its result rounding
    # is px-scale — and HIGHEST's 6 passes cost ~137 ms per b8 x 1M step).
    # None = auto ('vpu').  See ops/pallas/softmax_interp.py.
    interp_cross: Optional[str] = None
    # Pallas-interp exp/value dtype (both directions): 'float32' (default)
    # or 'bfloat16' (2x VPU exp + 2x MXU accumulation; forward weights are
    # normalized so the ~0.4%-per-weight noise mostly cancels, and the
    # backward recompute mirrors the XLA path's bf16 checkpointed exp —
    # see ops/pallas/softmax_interp.py).
    interp_exp_dtype: str = "float32"
    # IWE accumulation implementation: 'direct'/'sorted' scatter-add,
    # 'matmul' = blocked one-hot outer products on the MXU (XLA's scatter is
    # serialized at ~25 M elem/s on TPU and dominated the train step; the
    # dense reformulation is the same sum as 2*N*H*W MACs — see
    # ops/events.py::iwe_bilinear_vote_matmul).  None = auto: 'matmul' on
    # the TPU backend, 'direct' elsewhere.
    iwe_impl: Optional[str] = None
    # Row-band (pixels, rounded up to 8) of the banded Pallas vote used when
    # events arrive cell-sorted (lut_cell_ends in the batch): each 1024-event
    # sub-block then sits in a ~2-superpixel strip, so its warped taps span
    # <= strip + 2*max displacement rows (DSEC caps at 60 px -> 128 + slack).
    # Exact: a sub-block whose extent exceeds the band runs a full-height
    # pl.when branch inside the kernel (ops/pallas/iwe_vote.py).  0 disables;
    # None = auto (96 on the TPU backend; round-4 KB=4 re-tune, fwd+bwd
    # standalone b8 x 1M: 64 -> 44.9 ms | 80 -> 46.6 | 96 -> 46.2 |
    # 112 -> 47.7 | 128 -> 49.7 | 144 -> 52.6, grads bit-identical at every
    # band.  96 keeps ~|flow_y| <= 45 px on the fast path (strip + 2*disp);
    # 64 is marginally faster but falls back to full-height sub-blocks
    # beyond ~30 px displacement.  Round-2 history: 144 measured 406 -> 370
    # ms vs the full-height vote, grad 46 vs 72 ms).
    vote_band_px: Optional[int] = None
    # Forward LUT-gather implementation when events are cell-sorted:
    # 'xla' (plain gather, ~66 ms at b8) or 'pallas' (banded one-hot
    # contraction, ops/pallas/lut_gather.py).  None = auto ('pallas' on the
    # TPU backend — measured 406 -> 359 ms per b8 x 1M train step; with the
    # banded vote the combo lands 337 ms = 24.9 M events/s).
    lut_gather_impl: Optional[str] = None
    # Backward segment-sum boundary gather: 'xla' (take_along_axis over the
    # [M+1, 2] csum table — 17.6 ms of the 18.4 ms sorted backward at
    # b8 x 1M: 2.3M narrow row reads wasting 126/128 lanes) or 'pallas'
    # (csum viewed as a [R, 128, C] grid, banded one-hot MXU gather at
    # precision=HIGHEST — exact, the differences would amplify DEFAULT-dot
    # rounding).  None = auto ('pallas' on the TPU backend).
    segsum_gather_impl: Optional[str] = None

    # The trajectories handed to `focus_loss` must include pixel offsets
    # (reference TrajectoryLossBase.is_needing_offsets, focus.py:46).
    is_needing_offsets: bool = True

    def __post_init__(self):
        assert not self.scale_iwe_by_dt or self.num_tref == 1
        assert not self.polarity_aware_batching or self.num_tref == 1
        assert self.smooth_type != "on_flow_to_next" or self.num_tref == 1


def get_reconstruction_times(cfg: FocusLossConfig, rng: jax.Array) -> jnp.ndarray:
    """[num_tref + num_bins] times: t_ref(s) followed by bin midpoints.

    Reference: focus.py:53-64 (random t_ref when num_tref == 1).
    """
    if cfg.num_tref > 1:
        t_ref = jnp.linspace(0.0, 1.0, cfg.num_tref)
    elif cfg.num_tref == 1:
        t_ref = jax.random.uniform(rng, (1,))
    else:
        raise ValueError("num_tref must be >= 1")
    edges = jnp.linspace(0.0, 1.0, cfg.num_bins + 1)
    t_mid = (edges[:-1] + edges[1:]) / 2.0
    return jnp.concatenate([t_ref, t_mid], axis=0)


def _lut_grid_points(cfg: FocusLossConfig) -> np.ndarray:
    """Static [Q, 2] (y, x) superpixel-center query grid (focus.py:115-126)."""
    h, w = cfg.image_shape
    s = cfg.lut_superpixel_size
    mid = float(s) / 2.0 - 0.5
    ys = np.arange(0, h, s, dtype=np.float32) + mid
    xs = np.arange(0, w, s, dtype=np.float32) + mid
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gy.reshape(-1), gx.reshape(-1)], axis=-1)


def interpolate_flow(
    cfg: FocusLossConfig,
    traj_at_tref: jnp.ndarray,
    traj_at_tmid: jnp.ndarray,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Build the per-bin flow look-up table on the superpixel grid.

    Args:
      traj_at_tref: [B, n_tref, N, 2] trajectory positions at reference times.
      traj_at_tmid: [B, n_bins, N, 2] trajectory positions at bin midtimes.

    Returns:
      flow_lut: [B, n_bins, Hq, Wq, n_tref, 2] displacement to each t_ref.
      flow_to_next: [B, n_bins-1, Hq, Wq, 1, 2] or None (smooth_type gated).
    """
    h, w = cfg.image_shape
    s = cfg.lut_superpixel_size
    grid_points = jnp.asarray(_lut_grid_points(cfg))  # [Q, 2]
    hq, wq = -(-h // s), -(-w // s)
    q = hq * wq

    b, n_bins, n, _ = traj_at_tmid.shape
    n_tref = traj_at_tref.shape[1]
    k = cfg.num_knn

    if cfg.knn_method == "softmax":
        return _softmax_interpolate_flow(cfg, grid_points, traj_at_tref,
                                         traj_at_tmid, hq, wq)

    # KNN per (batch, bin): queries are the static grid, database the
    # trajectory positions at that bin's midtime (focus.py:129-137).
    flat_db = traj_at_tmid.reshape(b * n_bins, n, 2)
    if cfg.knn_method.startswith("grid"):
        sub_method = "approx" if cfg.knn_method.endswith("approx") else "exact"
        knn_fn = lambda db: knn_grid_window(
            grid_points, db, k, norm=cfg.dist_norm, cell_size=float(s),
            grid_hw=(hq, wq), method=sub_method)
    else:
        knn_fn = lambda db: knn_blocked(
            grid_points, db, k, norm=cfg.dist_norm,
            block_size=cfg.knn_block_size, method=cfg.knn_method)
    idx, dist = jax.vmap(knn_fn)(flat_db)
    idx = idx.reshape(b, n_bins, q, k)
    dist = dist.reshape(b, n_bins, q, k)

    # flow_to_tref[b, t, n, r, :] = traj_ref[b, r, n, :] - traj_mid[b, t, n, :]
    # (focus.py:139-142).
    traj_ref_t = jnp.transpose(traj_at_tref, (0, 2, 1, 3))  # [B, N, n_tref, 2]
    flow_to_tref = traj_ref_t[:, None] - traj_at_tmid[:, :, :, None, :]
    # [B, n_bins, N, n_tref, 2]

    def gather_one(f, i):  # f: [N, n_tref, 2], i: [Q, K]
        return f[i]  # [Q, K, n_tref, 2]

    flow_k = jax.vmap(jax.vmap(gather_one))(flow_to_tref, idx)
    # [B, n_bins, Q, K, n_tref, 2]

    # Grid-hash KNN can return +inf distances for unavailable candidate
    # slots; those are excluded from the interpolation (dense KNN never
    # produces them, so this is a no-op there).
    finite = jnp.isfinite(dist)
    if k == 1 or cfg.interpolation_scheme == "mean":
        fmask = finite[..., None, None].astype(flow_k.dtype)
        denom = jnp.maximum(jnp.sum(fmask, axis=3), 1.0)
        flow_q = jnp.sum(flow_k * fmask, axis=3) / denom
    elif cfg.interpolation_scheme == "iwd":
        # Inverse-distance weights are computed without gradient
        # (focus.py:158-163 runs under torch.no_grad()).
        dw = jax.lax.stop_gradient(
            jnp.where(finite, 1.0 / (dist + EPS), 0.0))
        dw = dw / jnp.maximum(jnp.sum(dw, axis=3, keepdims=True), EPS)
        flow_q = jnp.sum(dw[..., None, None] * flow_k, axis=3)
    else:
        raise ValueError(f"unknown interpolation_scheme {cfg.interpolation_scheme!r}")

    flow_lut = flow_q.reshape(b, n_bins, hq, wq, n_tref, 2)

    flow_to_next = None
    if cfg.smooth_weight > 0 and cfg.smooth_type == "on_flow_to_next":
        # Displacement between consecutive bin midtimes, interpolated with the
        # *same* neighbors (mean scheme; focus.py:170-176).
        diff_next = traj_at_tmid[:, 1:] - traj_at_tmid[:, :-1]  # [B, n_bins-1, N, 2]
        fn = diff_next[..., None, :]  # [B, n_bins-1, N, 1, 2]
        fn_k = jax.vmap(jax.vmap(gather_one))(fn, idx[:, :-1])
        flow_to_next = jnp.mean(fn_k, axis=3).reshape(b, n_bins - 1, hq, wq, 1, 2)

    return flow_lut, flow_to_next


def _softmax_interpolate_flow(cfg: FocusLossConfig, grid_points: jnp.ndarray,
                              traj_at_tref: jnp.ndarray,
                              traj_at_tmid: jnp.ndarray,
                              hq: int, wq: int):
    """Dense exponential-kernel interpolation — the TPU-native fast path.

    out[q] = sum_n softmax_n(-dist(q, n) / temp) * value[n]

    No top-k, no gathers: per query block this is a distance broadcast, a
    row softmax, and one [Bq, N] @ [N, C] matmul (MXU).  Weights are
    stop-gradient (matching the reference's no-grad interpolation weights,
    focus.py:158-163); gradients flow through the value matmul.

    Approximates the reference's K-NN mean as an exponential-kernel IWD:
    with temp ~ the squared NN-distance scale the effective support is the
    same few dozen nearest trajectories.
    """
    b, n_bins, n, _ = traj_at_tmid.shape
    n_tref = traj_at_tref.shape[1]
    q = hq * wq
    temp = cfg.softmax_temp

    # Values: flow to each t_ref (+ flow to next bin when needed).
    traj_ref_t = jnp.transpose(traj_at_tref, (0, 2, 1, 3))  # [B, N, R, 2]
    flow_to_tref = traj_ref_t[:, None] - traj_at_tmid[:, :, :, None, :]
    values = flow_to_tref.reshape(b, n_bins, n, n_tref * 2)
    want_next = cfg.smooth_weight > 0 and cfg.smooth_type == "on_flow_to_next"
    if want_next:
        diff_next = traj_at_tmid[:, 1:] - traj_at_tmid[:, :-1]
        # Pad the last bin with zeros so shapes stay uniform; discarded below.
        diff_next = jnp.concatenate(
            [diff_next, jnp.zeros_like(diff_next[:, :1])], axis=1)
        values = jnp.concatenate([values, diff_next], axis=-1)
    c = values.shape[-1]

    db = traj_at_tmid.reshape(b * n_bins, n, 2)
    vals = values.reshape(b * n_bins, n, c)

    use_pallas = cfg.use_pallas_interp
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and cfg.dist_norm == "l2":
        from ..ops.pallas import softmax_interp_pallas

        s = float(cfg.lut_superpixel_size)
        if cfg.interp_band_dynamic and cfg.interp_band_px > 0:
            # Nominal per-slot grid rows: the banding contract is that db
            # slots are row-major over the same grid as the queries (true
            # when the trajectory patch grid matches the LUT grid, the
            # reference configuration).  maxdisp bounds |db_y - slot_y|, so
            # a db point within the kernel tail of a query has its slot row
            # within maxdisp + tail of the query row.
            if n == grid_points.shape[0]:
                slot_y = grid_points[:, 0]
            else:
                slot_y = (jnp.arange(n, dtype=jnp.float32) // wq) * s \
                    + s / 2.0 - 0.5
            tail = 4.0 * float(np.sqrt(temp)) + s
            ydisp = jnp.abs(db[..., 0] - slot_y[None, :])    # [G, N]
            if cfg.interp_band_dynamic == "per_group":
                margin = jax.lax.stop_gradient(jnp.max(ydisp, axis=1)) + tail
                band = jnp.stack(
                    [margin, jnp.full_like(margin, s),
                     jnp.full_like(margin, wq)], axis=-1)    # [G, 3]
            else:
                margin = jax.lax.stop_gradient(jnp.max(ydisp)) + tail
                band = jnp.stack([margin, jnp.float32(s), jnp.float32(wq)])
        elif cfg.interp_band_per_bin and cfg.interp_band_px > 0:
            margin = float(cfg.interp_band_px)
            tail = 4.0 * float(np.sqrt(temp))
            t_mid = (np.arange(n_bins, dtype=np.float32) + 0.5) / n_bins
            mb = np.minimum(tail + (margin - tail) * t_mid, margin)
            rows = np.stack(
                [np.tile(mb, b),
                 np.full(b * n_bins, s, np.float32),
                 np.full(b * n_bins, wq, np.float32)], axis=-1)
            band = jnp.asarray(rows, jnp.float32)   # [G, 3] per-group margins
        else:
            band = (float(cfg.interp_band_px), s, float(wq))
        exp_dtype = (jnp.bfloat16 if cfg.interp_exp_dtype == "bfloat16"
                     else jnp.float32)
        interpret = jax.default_backend() != "tpu"
        cross_impl = cfg.interp_cross or "vpu"
        if cross_impl not in ("vpu", "mxu"):
            raise ValueError(
                f"interp_cross must be 'vpu', 'mxu' or None (auto), got "
                f"{cfg.interp_cross!r}")
        out = softmax_interp_pallas(grid_points, db, vals, float(temp),
                                    interpret, band, exp_dtype, cross_impl)
        out = out.reshape(b, n_bins, hq, wq, c)
        flow_lut = out[..., :n_tref * 2].reshape(b, n_bins, hq, wq, n_tref, 2)
        flow_to_next = None
        if want_next:
            flow_to_next = out[:, :-1, :, :, n_tref * 2:].reshape(
                b, n_bins - 1, hq, wq, 1, 2)
        return flow_lut, flow_to_next

    block = max(min(cfg.knn_block_size, q), 1)
    num_blocks = -(-q // block)
    q_pad = num_blocks * block
    gp = grid_points
    if q_pad != q:
        gp = jnp.pad(gp, ((0, q_pad - q), (0, 0)))
    gp_blocks = gp.reshape(num_blocks, block, 2)

    def per_bin(db_i, vals_i):
        # checkpoint: recompute the [block, N] weights in the backward pass
        # instead of saving them per scan step (they are O(GB) per step).
        # The weight pipeline runs in bf16 (2x VPU/MXU throughput): weights
        # are stop-gradient interpolation coefficients, so ~1e-2 relative
        # error is benign; the value matmul accumulates in f32.
        @jax.checkpoint
        def one_block(qb):
            # Broadcast distance on the VPU: a [Bq, N] x dim-2 contraction
            # would pad the MXU contraction dim 2 -> 128 (64x wasted MACs).
            dy = qb[:, None, 0] - db_i[None, :, 0]
            dx = qb[:, None, 1] - db_i[None, :, 1]
            if cfg.dist_norm == "l2":
                dist = dy * dy + dx * dx
            else:
                dist = jnp.abs(dy) + jnp.abs(dx)
            dist = jax.lax.stop_gradient(dist)
            z = -(dist - jnp.min(dist, axis=1, keepdims=True)) / temp
            # Only the exp runs in bf16 (the dominant elementwise cost; 2x
            # VPU throughput).  Values stay f32 and normalization happens
            # AFTER the value matmul, so a constant field interpolates
            # exactly and bf16 weight error only perturbs the weighting.
            a = jnp.exp(z.astype(jnp.bfloat16)).astype(jnp.float32)
            num = jnp.dot(a, vals_i, preferred_element_type=jnp.float32)
            den = jnp.sum(a, axis=1, keepdims=True)
            return num / den

        return jax.lax.map(one_block, gp_blocks).reshape(q_pad, c)[:q]

    out = jax.vmap(per_bin)(db, vals).reshape(b, n_bins, hq, wq, c)
    flow_lut = out[..., :n_tref * 2].reshape(b, n_bins, hq, wq, n_tref, 2)
    flow_to_next = None
    if want_next:
        flow_to_next = out[:, :-1, :, :, n_tref * 2:].reshape(
            b, n_bins - 1, hq, wq, 1, 2)
    return flow_lut, flow_to_next


def warp_events(cfg: FocusLossConfig, events: jnp.ndarray,
                flow_lut: jnp.ndarray,
                cell_ends: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Warp each event by its LUT cell's flow to every reference time.

    Reference: focus.py:182-195 — LUT lookup by (bin, y // s, x // s).

    Args:
      events: [B, M, 6] rows (y, x, t, p, bin, valid).
      flow_lut: [B, n_bins, Hq, Wq, n_tref, 2].
      cell_ends: [B, S * n_bins * Hq * Wq] int32 LUT-cell right boundaries
        when events are pre-sorted by flat LUT cell id per polarity segment
        (data/host_ops.py::lut_cell_sort) — switches the gather backward to
        the O(M) cumsum-difference segment sum (~10x the one-hot-matmul
        path at b8 x 1M on v5e).  None keeps the backend-auto default.

    Returns:
      warped: [B, n_tref, M, 6] — warped (y, x) plus original (t, p, bin, valid).
    """
    b, m, _ = events.shape
    _, n_bins, hq, wq, n_tref, _ = flow_lut.shape
    s = cfg.lut_superpixel_size

    it = events[..., ev_ops.BIN].astype(jnp.int32)
    iy = jnp.floor(events[..., ev_ops.Y] / s).astype(jnp.int32)
    ix = jnp.floor(events[..., ev_ops.X] / s).astype(jnp.int32)
    cols_idx = jnp.clip(ix, 0, wq - 1)

    # Custom-VJP gather: the forward is a fast XLA gather, but its autodiff
    # transpose is a serialized scatter-add into the LUT (~200 ms at b4 x 1M
    # on v5e — it dominated the train step); grid_gather routes the backward
    # through blocked one-hot matmuls on the MXU instead, or — when the
    # loader cell-sorted the events (cell_ends given) — through the O(M)
    # cumsum segment sum (ops/events.py).
    if cell_ends is not None:
        # Y-MAJOR flat ids (match data/host_ops.py::lut_cell_keys): the
        # LUT is transposed to [Hq, n_bins, Wq] so the sorted ids stay
        # ascending; y-major order also gives each block of events a
        # ~2-superpixel-row warped extent (banded vote kernel).
        rows_idx = (jnp.clip(iy, 0, hq - 1) * n_bins
                    + jnp.clip(it, 0, n_bins - 1))
        lut_grid = jnp.transpose(flow_lut, (0, 2, 1, 3, 4, 5)).reshape(
            b, hq * n_bins, wq, n_tref * 2)
        seg_impl = cfg.segsum_gather_impl
        if seg_impl is None:
            seg_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        bwd_impl = "sorted_pallas" if seg_impl == "pallas" else "sorted"
        lut_impl = cfg.lut_gather_impl
        if lut_impl is None:
            lut_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        fwd_impl = "pallas_sorted" if lut_impl == "pallas" else "xla"
        # A 1024-event sub-block of y-major-sorted events spans <= 2 iy
        # values (2 * n_bins rows) away from sparse regions; +2 slack.
        fwd_band = n_bins * 2 + 2
        differences = ev_ops.grid_gather(lut_grid, rows_idx, cols_idx,
                                         bwd_impl, cell_ends, fwd_impl,
                                         fwd_band)
    else:
        rows_idx = jnp.clip(it * hq + iy, 0, n_bins * hq - 1)
        lut_grid = flow_lut.reshape(b, n_bins * hq, wq, n_tref * 2)
        bwd_impl = "matmul" if jax.default_backend() == "tpu" else "native"
        differences = ev_ops.grid_gather(lut_grid, rows_idx, cols_idx,
                                         bwd_impl, cell_ends)
    differences = differences.reshape(b, m, n_tref, 2)
    # [B, M, n_tref, 2] -> [B, n_tref, M, 2]
    differences = jnp.transpose(differences, (0, 2, 1, 3))

    warped_yx = differences + events[:, None, :, :2]
    rest = jnp.broadcast_to(events[:, None, :, 2:], (b, n_tref, m, 4))
    return jnp.concatenate([warped_yx, rest], axis=-1)


def make_iwes(cfg: FocusLossConfig, warped: jnp.ndarray, t_ref: jnp.ndarray,
              num_pos_events: int, cell_sorted: bool = False) -> jnp.ndarray:
    """Accumulate warped events into IWEs with validity/dt/border weights.

    Reference: focus.py:197-230.  Returns [B*n_tref, H, W] or, with
    polarity-aware batching, [B*n_tref, 2, H, W] (pos/neg planes).  A 3x3
    gaussian blur (sigma=1) is applied, matching create_iwe(..., sigma=1).
    """
    h, w = cfg.image_shape
    b, n_tref, m, d = warped.shape
    warped = warped.reshape(b * n_tref, m, d)

    # Weights are non-differentiable (torch.no_grad block, focus.py:201-214).
    weights = warped[..., 5]
    if cfg.scale_iwe_by_dt:
        dt = jnp.clip(jnp.abs(warped[..., 2] - t_ref), 0.0, 1.0)
        weights = (1.0 - dt) * weights
    if cfg.mask_image_border:
        # NOTE: the reference compares y against H and x against W with strict
        # '>' (focus.py:208-214); out-of-range votes are additionally masked
        # per-corner inside the bilinear vote.
        inb = ((warped[..., 0] <= h) & (warped[..., 1] <= w)
               & (warped[..., 0] >= 0) & (warped[..., 1] >= 0))
        weights = weights * inb.astype(weights.dtype)
    weights = jax.lax.stop_gradient(weights)

    coords = warped[..., :2]

    impl = cfg.iwe_impl
    if impl is None:
        # 'pallas' builds the one-hot tap tiles in VMEM (no HBM round-trip
        # between the comparisons and the MXU dots): measured 339 vs 354 ms
        # per b4 x 1M train step against the XLA 'matmul' formulation.
        impl = "pallas" if jax.default_backend() == "tpu" else "direct"

    vote_band = cfg.vote_band_px
    if vote_band is None:
        vote_band = 96 if jax.default_backend() == "tpu" else 0

    def vote(c, wgt):
        if impl == "pallas" and cell_sorted and vote_band > 0:
            from ..ops.pallas.iwe_vote import iwe_vote_pallas_sorted

            return iwe_vote_pallas_sorted(c, wgt, h, w, vote_band)
        return ev_ops.iwe_bilinear_vote_batch(c, wgt, height=h, width=w,
                                              scatter_impl=impl)

    if cfg.polarity_aware_batching:
        assert num_pos_events >= 0, "polarity_aware_batching needs num_pos_events"
        pos = vote(coords[:, :num_pos_events], weights[:, :num_pos_events])
        neg = vote(coords[:, num_pos_events:], weights[:, num_pos_events:])
        iwes = jnp.stack([pos, neg], axis=1)  # [B*n_tref, 2, H, W]
    else:
        iwes = vote(coords, weights)  # [B*n_tref, H, W]
    return ev_ops.gaussian_blur_3x3(iwes, sigma=1.0)


def calculate_smooth_loss(cfg: FocusLossConfig, flow_lut: jnp.ndarray,
                          flow_to_next: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Charbonnier smoothness on the selected flow field (focus.py:232-246)."""
    if cfg.smooth_weight == 0:
        return jnp.asarray(0.0, dtype=flow_lut.dtype)
    if cfg.smooth_type == "on_flow_to_tref":
        flow_field = flow_lut
    elif cfg.smooth_type == "on_flow_to_next":
        assert flow_to_next is not None
        flow_field = flow_to_next
    else:
        raise ValueError(f"unknown smooth_type {cfg.smooth_type!r}")
    # [B, T, Hq, Wq, R, 2] -> [B*T*R, 2, Hq, Wq]
    ff = jnp.transpose(flow_field, (0, 1, 4, 5, 2, 3))
    c, hq, wq = ff.shape[-3:]
    ff = ff.reshape(-1, c, hq, wq)
    return cfg.smooth_weight * grad_ops.smoothness_loss(ff)


def focus_loss(
    cfg: FocusLossConfig,
    trajectories: jnp.ndarray,
    times: jnp.ndarray,
    events: jnp.ndarray,
    num_pos_events: int = -1,
    cell_ends: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Compute the focus + smoothness loss.

    Reference: focus.py:66-113 (`FocusLoss.calc`).

    Args:
      trajectories: [B, num_tref + num_bins, N, 2] absolute trajectory
        positions (pixel offsets included).
      times: [num_tref + num_bins] from `get_reconstruction_times`.
      events: [B, M, 6] event batch, positives packed first when
        polarity_aware_batching (see data/collate.py).
      num_pos_events: static count of positive-event capacity per sample.
      cell_ends: optional host-precomputed LUT-cell boundaries (events then
        pre-sorted by LUT cell per polarity segment — see `warp_events`).

    Returns:
      (loss, log_metadata, misc_metadata) — misc carries the detached IWEs
      shaped [B, n_tref, (2,) H, W].
    """
    assert not cfg.polarity_aware_batching or num_pos_events > -1

    t_ref = times[: cfg.num_tref]
    traj_at_tref = trajectories[:, : cfg.num_tref]
    traj_at_tmid = trajectories[:, cfg.num_tref:]

    with jax.named_scope("focus/interpolate_flow"):
        flow_lut, flow_to_next = interpolate_flow(cfg, traj_at_tref,
                                                  traj_at_tmid)
    with jax.named_scope("focus/warp_events"):
        warped = warp_events(cfg, events, flow_lut, cell_ends)
    with jax.named_scope("focus/make_iwes"):
        iwes = make_iwes(cfg, warped, t_ref, num_pos_events,
                         cell_sorted=cell_ends is not None)

    focus = grad_ops.focus_objective(iwes, loss_type=cfg.loss_type,
                                     norm=cfg.focus_loss_norm,
                                     epsilon=cfg.focus_loss_epsilon)
    smooth = calculate_smooth_loss(cfg, flow_lut, flow_to_next)
    loss = focus + smooth

    h, w = cfg.image_shape
    b, n_tref = warped.shape[0], warped.shape[1]
    if cfg.polarity_aware_batching:
        iwes_out = iwes.reshape(b, n_tref, 2, h, w)
    else:
        iwes_out = iwes.reshape(b, n_tref, h, w)

    log_metadata = {
        "focus_loss": jax.lax.stop_gradient(focus),
        "smoothness_loss": jax.lax.stop_gradient(smooth),
    }
    misc_metadata = {"iwes": jax.lax.stop_gradient(iwes_out)}
    return loss, log_metadata, misc_metadata
