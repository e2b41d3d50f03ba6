"""Event voxelization and Image-of-Warped-Events (IWE) accumulation.

TPU-native reimplementation of the reference's event representations:
  - trilinear voxel-grid voting  (reference: src/loader/utils/representation.py:64-111
    and src/loader/dsec/utils.py:29-77)
  - bilinear IWE vote            (reference: src/utils/event_image_converter.py:333-391)
  - voxel-grid normalization     (reference: src/loader/dsec/utils.py:57-75,
    src/loader/utils/representation.py:9-18)

Design notes (TPU-first):
  * Events are fixed-capacity arrays [..., M, 6] with float32 rows
    (y, x, t, p, bin, valid) — y first, matching the reference convention
    (src/loader/dsec/loader.py:156-161).  Padding rows carry valid=0 and
    contribute zero weight; there is no ragged shape anywhere on device.
  * Accumulation is one flattened scatter-add per vote (ops/scatter.py):
    'sorted' (sort + unique-index scatter, parallel on TPU) or 'direct'
    (plain XLA scatter).  Both are deterministic — unlike the reference's
    CUDA `scatter_add_`/`put_(accumulate=True)` (SURVEY.md §5.2).
  * Out-of-bounds votes carry zero weight and index -1 (dropped), matching
    the reference's `inds * inds_mask` masking semantics
    (event_image_converter.py:388).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .scatter import scatter_add_1d, scatter_add_direct

# Column layout of an event row.  (y, x) may be fractional after rectification
# or warping; `bin` is the voxel-channel index used for flow-LUT lookup;
# `valid` is 1.0 for real events, 0.0 for padding.
EVENT_COLS = ("y", "x", "t", "p", "bin", "valid")
Y, X, T, P, BIN, VALID = range(6)


def _scatter_accumulate(shape_flat: int, idx: jnp.ndarray, vals: jnp.ndarray,
                        impl: str) -> jnp.ndarray:
    """One-call accumulation of all votes.

    impl='direct' is the plain XLA scatter — measured FASTER than the
    sort-based path on v5e (53 ms vs 123 ms per 2x512k-event IWE: XLA's sort
    costs more than its scatter here).  'sorted' remains available; both are
    deterministic.
    """
    if impl == "sorted":
        return scatter_add_1d(shape_flat, idx, vals)
    return scatter_add_direct(shape_flat, idx, vals)


def voxel_grid_from_events(
    y: jnp.ndarray,
    x: jnp.ndarray,
    t_norm: jnp.ndarray,
    p: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    num_bins: int,
    height: int,
    width: int,
    scatter_impl: str = "direct",
) -> jnp.ndarray:
    """Trilinear (x, y, t) vote of events into a [num_bins, H, W] voxel grid.

    Semantics match the reference voxelizers exactly
    (src/loader/utils/representation.py:77-109, src/loader/dsec/utils.py:29-55):
      vote value  = (2 p − 1) * w_x * w_y * w_t   with w = 1 − |target − coord|
      targets     = {floor, floor+1} along each fractional axis
      t_norm      = (t − t0) / (t1 − t0) * (num_bins − 1)
    Integer (y, x) inputs take the 2-tap time-only fast path automatically
    because the spatial fractional weights collapse to {1, 0}.

    Args:
      y, x: [M] event coordinates (float; may be fractional post-rectification).
      t_norm: [M] normalized time in units of bins (0 .. num_bins-1).
      p: [M] polarity in {0, 1}.
      valid: [M] 1.0 for real events, 0.0 for padding.

    Returns:
      [num_bins, height, width] float32 voxel grid.
    """
    value = (2.0 * p.astype(jnp.float32) - 1.0) * valid.astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    t0 = jnp.floor(t_norm)

    flat = num_bins * height * width
    all_idx, all_w = [], []
    for dx in (0.0, 1.0):
        xi = x0 + dx
        wx = 1.0 - jnp.abs(xi - x)
        mx = (xi >= 0) & (xi < width)
        for dy in (0.0, 1.0):
            yi = y0 + dy
            wy = 1.0 - jnp.abs(yi - y)
            my = (yi >= 0) & (yi < height)
            for dt in (0.0, 1.0):
                ti = t0 + dt
                wt = 1.0 - jnp.abs(ti - t_norm)
                mt = (ti >= 0) & (ti < num_bins)
                mask = mx & my & mt
                w = value * wx * wy * wt * mask.astype(jnp.float32)
                idx = (ti.astype(jnp.int32) * height + yi.astype(jnp.int32)) * width \
                    + xi.astype(jnp.int32)
                all_idx.append(jnp.where(mask, idx, -1))
                all_w.append(w)

    acc = _scatter_accumulate(flat, jnp.concatenate(all_idx),
                              jnp.concatenate(all_w), scatter_impl)
    return acc.reshape(num_bins, height, width)


def clamp_voxel_grid_quantile(grid: jnp.ndarray, quantile: float) -> jnp.ndarray:
    """Symmetric magnitude clamp at the (1 − quantile) |grid| quantile.

    Reference: src/loader/dsec/utils.py:57-61.  No-op when quantile == 0.
    """
    if quantile <= 0:
        return grid
    threshold = jnp.quantile(jnp.abs(grid).reshape(-1), 1.0 - quantile)
    return jnp.where(jnp.abs(grid) > threshold, jnp.sign(grid) * threshold, grid)


def normalize_voxel_grid(grid: jnp.ndarray, norm_type: str | None = "mean_std") -> jnp.ndarray:
    """Normalize nonzero voxels (mean/std over nonzero entries, or max-abs).

    Reference: src/loader/dsec/utils.py:63-75 and
    src/loader/utils/representation.py:9-18.  The reference computes mean/std
    over the *nonzero* entries only and leaves zeros untouched; we reproduce
    that with masked moments (std uses Bessel's correction like torch.std).
    """
    if norm_type is None:
        return grid
    if norm_type == "max":
        max_value = jnp.max(jnp.abs(grid))
        return jnp.where(max_value > 0, grid / jnp.maximum(max_value, 1e-12), grid)
    if norm_type != "mean_std":
        raise ValueError(f"unknown norm_type {norm_type!r}")
    nz = (grid != 0).astype(jnp.float32)
    n = jnp.sum(nz)
    n_safe = jnp.maximum(n, 1.0)
    mean = jnp.sum(grid * nz) / n_safe
    var = jnp.sum(jnp.square(grid - mean) * nz) / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(var)
    normed = jnp.where(std > 0, (grid - mean) / std, grid - mean)
    return jnp.where((n > 0) & (nz > 0), normed, grid)


def iwe_bilinear_vote(
    coords_yx: jnp.ndarray,
    weight: jnp.ndarray,
    *,
    height: int,
    width: int,
    scatter_impl: str = "direct",
) -> jnp.ndarray:
    """Bilinear vote of (possibly fractional) event coords into a [H, W] image.

    Semantics match the reference bilinear_vote_tensor
    (src/utils/event_image_converter.py:333-391):
      floor with +1e-6 nudge; votes at the 4 integer neighbors with products
      of fractional weights; out-of-range corners masked per-corner.

    Args:
      coords_yx: [M, 2] warped event coordinates, (y, x) order.
      weight: [M] per-event vote weight (0 for padding events).

    Returns:
      [height, width] float32 IWE.
    """
    yx = coords_yx
    floor_yx = jnp.floor(yx + 1e-6)
    frac = yx - floor_yx
    fy, fx = frac[..., 0], frac[..., 1]
    y1 = floor_yx[..., 0].astype(jnp.int32)
    x1 = floor_yx[..., 1].astype(jnp.int32)

    flat = height * width
    # (dy, dx, weight) for the 4 corners; weight order matches reference
    # w_pos0..w_pos3 (event_image_converter.py:382-385).
    corners = (
        (0, 0, (1.0 - fy) * (1.0 - fx)),
        (1, 0, fy * (1.0 - fx)),
        (0, 1, (1.0 - fy) * fx),
        (1, 1, fy * fx),
    )
    all_idx, all_w = [], []
    for dy, dx, wgt in corners:
        yi = y1 + dy
        xi = x1 + dx
        mask = (yi >= 0) & (yi < height) & (xi >= 0) & (xi < width)
        all_w.append(wgt * weight * mask.astype(jnp.float32))
        all_idx.append(jnp.where(mask, yi * width + xi, -1))
    acc = _scatter_accumulate(flat, jnp.concatenate(all_idx),
                              jnp.concatenate(all_w), scatter_impl)
    return acc.reshape(height, width)


def gaussian_blur_3x3(images: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """3x3 separable gaussian blur with reflect padding.

    Matches torchvision gaussian_blur(kernel_size=3, sigma) applied to the IWE
    in the reference (src/utils/event_image_converter.py:170-175 via
    create_iwe(..., sigma=1) at src/losses/focus.py:219-230): 1-D kernel
    proportional to exp(-x^2 / (2 sigma^2)) for x in {-1, 0, 1}, normalized,
    with reflect padding.

    Args:
      images: [..., H, W].
    Returns:
      blurred images, same shape.
    """
    import numpy as _np

    from .gradients import _stencil3

    x = _np.array([-1.0, 0.0, 1.0])
    k1 = _np.exp(-0.5 * (x / sigma) ** 2)
    k1 = k1 / k1.sum()
    taps = tuple(float(v) for v in k1)
    # Separable shifted-add stencil: a single-channel conv would pad
    # channels 1 -> 128 on the TPU conv engine (see _stencil3).
    img = _stencil3(images, taps, -2, "reflect")
    return _stencil3(img, taps, -1, "reflect")


def iwe_bilinear_vote_matmul(
    coords_yx: jnp.ndarray,
    weight: jnp.ndarray,
    *,
    height: int,
    width: int,
    block_size: int = 2048,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Bilinear vote as blocked one-hot outer products on the MXU.

    TPU-native replacement for the scatter-add vote: XLA's scatter applies
    its 4M-events x 4-corner updates SERIALLY (~25 M elem/s measured on v5e
    — it dominated the flow train step at 600 of 750 ms).  The same sum is

        IWE = sum_e  v_e * a_e (x) b_e,
        a_e[r] = wy0*[r==y0_e] + wy1*[r==y0_e+1]   (two bilinear row taps)
        b_e[c] = wx0*[c==x0_e] + wx1*[c==x0_e+1]   (two bilinear col taps)

    i.e. sum_blocks A_blk^T @ diag(v) B_blk — 2*N*H*W MACs of dense matmul
    (~2.5 TFLOP at DSEC b4 x 1M scale = tens of ms on the MXU instead of
    hundreds serialized).  Per-corner out-of-range masking is separable, so
    zeroing the offending row/col tap reproduces the reference's per-corner
    masks exactly (src/utils/event_image_converter.py:333-391 semantics,
    incl. the +1e-6 floor nudge).  Tap positions come from floor (non-
    differentiable) while tap weights stay differentiable — the identical
    autodiff structure as the scatter path, but the backward is two dense
    matmuls instead of serialized gathers.

    Args:
      coords_yx: [M, 2] (y, x); weight: [M] (0 for padding rows).
      compute_dtype: matmul input dtype; accumulation is always f32.
        bfloat16 keeps ~3 decimal digits on the bilinear weights (IWE values
        are event counts; the focus objective is insensitive at that level —
        see test_events_ops.py matmul-vs-scatter tolerance).

    Returns:
      [height, width] float32 IWE.
    """
    m = coords_yx.shape[0]
    pad = (-m) % block_size
    if pad:
        coords_yx = jnp.pad(coords_yx, ((0, pad), (0, 0)))
        weight = jnp.pad(weight, (0, pad))
    nb = (m + pad) // block_size

    floor_yx = jnp.floor(coords_yx + 1e-6)
    frac = coords_yx - floor_yx
    fy, fx = frac[..., 0], frac[..., 1]
    y1 = floor_yx[..., 0].astype(jnp.int32)
    x1 = floor_yx[..., 1].astype(jnp.int32)

    def tap_weights(f, i0, n):
        w0 = (1.0 - f) * ((i0 >= 0) & (i0 < n)).astype(f.dtype)
        w1 = f * ((i0 + 1 >= 0) & (i0 + 1 < n)).astype(f.dtype)
        return w0, w1

    wy0, wy1 = tap_weights(fy, y1, height)
    wx0, wx1 = tap_weights(fx, x1, width)

    def reshape(a):
        return a.reshape(nb, block_size)

    xs = tuple(map(reshape, (y1, x1, wy0 * weight, wy1 * weight, wx0, wx1)))
    rows = jnp.arange(height, dtype=jnp.int32)
    cols = jnp.arange(width, dtype=jnp.int32)

    @jax.checkpoint
    def body(acc, xs_b):
        y1b, x1b, ay0, ay1, bx0, bx1 = xs_b
        # [E, H] / [E, W] two-tap one-hots (weight folded into the row taps).
        a = (ay0[:, None] * (rows[None, :] == y1b[:, None])
             + ay1[:, None] * (rows[None, :] == y1b[:, None] + 1))
        b = (bx0[:, None] * (cols[None, :] == x1b[:, None])
             + bx1[:, None] * (cols[None, :] == x1b[:, None] + 1))
        blk = jnp.einsum("eh,ew->hw", a.astype(compute_dtype),
                         b.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        return acc + blk, None

    acc0 = jnp.zeros((height, width), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, xs)
    return acc


def _segment_sum_matmul(rows_idx: jnp.ndarray, cols_idx: jnp.ndarray,
                        grads: jnp.ndarray, *, num_rows: int, num_cols: int,
                        block_size: int = 2048,
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """out[r, x, c] = sum_e [rows_idx[e]==r][cols_idx[e]==x] grads[e, c].

    The MXU reformulation of a 2-D-factorized scatter-add (the transpose of
    a grid gather): per event block, two one-hot matrices A [E, R] (with the
    channel gradient folded in) and B [E, X], contracted as A^T B.  XLA's
    native scatter applies the E updates serially (~200 ms at 4 x 1M events
    on v5e); the dense form is E*R*X MACs of matmul per channel (~24 ms of
    MXU ideal at the DSEC flow-LUT shape R=1800, X=160).

    One-hot entries are exactly representable in bf16, so compute_dtype only
    affects the folded gradient values (~3 decimal digits — standard mixed-
    precision gradient error); accumulation is always f32.

    Args:
      rows_idx, cols_idx: [M] int32 in [0, num_rows) / [0, num_cols).
      grads: [M, C] per-event cotangents (zero rows for padding).
    Returns:
      [num_rows, num_cols, C] float32.
    """
    m, c = grads.shape
    pad = (-m) % block_size
    if pad:
        rows_idx = jnp.pad(rows_idx, (0, pad))
        cols_idx = jnp.pad(cols_idx, (0, pad))
        grads = jnp.pad(grads, ((0, pad), (0, 0)))
    nb = (m + pad) // block_size
    r_ = rows_idx.reshape(nb, block_size)
    x_ = cols_idx.reshape(nb, block_size)
    g_ = grads.reshape(nb, block_size, c)
    rr = jnp.arange(num_rows, dtype=jnp.int32)
    cc = jnp.arange(num_cols, dtype=jnp.int32)

    @jax.checkpoint
    def body(acc, xs):
        rb, cb, gb = xs
        a = (rr[None, :] == rb[:, None]).astype(compute_dtype)     # [E, R]
        bmat = (cc[None, :] == cb[:, None]).astype(compute_dtype)  # [E, X]
        outs = []
        for ci in range(c):
            ag = a * gb[:, ci:ci + 1].astype(compute_dtype)
            outs.append(jnp.einsum("er,ex->rx", ag, bmat,
                                   preferred_element_type=jnp.float32))
        return acc + jnp.stack(outs, -1), None

    acc0 = jnp.zeros((num_rows, num_cols, c), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (r_, x_, g_))
    return acc


def _segment_sum_sorted(flat_idx: jnp.ndarray, grads: jnp.ndarray, *,
                        num_cells: int,
                        cell_ends: jnp.ndarray | None = None) -> jnp.ndarray:
    """out[cell, c] = sum_e [flat_idx[e]==cell] grads[e, c], flat_idx SORTED.

    With cell ids sorted ascending, each cell's events are contiguous, so
    the segment sum is an exclusive-prefix-sum difference at the cell
    boundaries: O(M) cumsum on the VPU + a boundary gather — no M x R x X
    dense matmuls (the `_segment_sum_matmul` cost) and no serialized
    scatter.  The flow-LUT cell of an event depends only on its STATIC
    coordinates, so loaders pre-sort events once on the host and every
    train step reuses the order for free (data/host_ops.py::lut_cell_sort).

    `cell_ends` is the right-boundary array `searchsorted(flat_idx,
    arange(num_cells), 'right')`, flattened over any leading segment
    axis: shape [S * num_cells] globally ascending, segment s covering
    events [off_s, off_{s+1}) (polarity-aware batching packs positives
    first, so each polarity half is sorted separately — S=2).  It depends
    only on static event coordinates, so loaders compute it host-side;
    computing it on device (cell_ends=None) is a ~20-round binary-search
    gather, measured 6x slower than the whole cumsum path at b8 x 1M.

    Precision vs an f64 oracle at 1M N(0,1) events over 288k cells:
    max abs error 2.8e-4 (mean 1.4e-5) — ~100x tighter than the bf16
    `_segment_sum_matmul` path it replaces (max 2.5e-2), because the f32
    cumsum differences round at sqrt(M)*sigma while bf16 inputs round every
    value at ~4e-3 relative.

    Args:
      flat_idx: [M] int32 in [0, num_cells), ascending (per segment).
      grads: [M, C] cotangents (zero rows for padding events).
      cell_ends: [S * num_cells] int32 ascending.  None computes boundaries
        on device via searchsorted — VALID ONLY FOR S=1 (globally ascending
        flat_idx); polarity-packed S=2 layouts are non-monotonic and the
        searchsorted fallback would return silently wrong boundaries.
    Returns:
      [num_cells, C] float32.
    """
    c = grads.shape[1]
    csum = jnp.cumsum(grads.astype(jnp.float32), axis=0)
    csum = jnp.concatenate([jnp.zeros((1, c), jnp.float32), csum], axis=0)
    if cell_ends is None:
        cell_ends = jnp.searchsorted(
            flat_idx, jnp.arange(num_cells, dtype=jnp.int32), side="right")
    gath = csum[cell_ends]                                  # [S*cells, C]
    prev = jnp.concatenate([jnp.zeros((1, c), jnp.float32), gath[:-1]])
    # Per-segment diffs: the first cell of segment s sees prev = the last
    # end of segment s-1 = off_s, exactly its exclusive start.
    return (gath - prev).reshape(-1, num_cells, c).sum(axis=0)


def _segment_sum_sorted_batch_pallas(grads: jnp.ndarray,
                                     cell_ends: jnp.ndarray,
                                     num_cells: int) -> jnp.ndarray:
    """Batched `_segment_sum_sorted` with the boundary gather on the MXU.

    The cumsum itself is cheap (2.4 ms at b8 x 1M) — the cost of the sorted
    backward is the BOUNDARY GATHER `csum[cell_ends]` (17.6 ms measured):
    XLA serializes 2.3M narrow row reads from a [M+1, 2] table whose 2-wide
    rows waste 126/128 lanes.  cell_ends is ascending, so the gather is
    exactly the banded lut_gather_sorted problem: view csum as a
    [R=(M+1)/128, 128, C] grid, rows = ce // 128, cols = ce % 128.
    precision=HIGHEST keeps the gathered values exact — the subsequent
    adjacent-boundary differences would amplify the DEFAULT dot's ~0.4%
    result rounding of csum-magnitude values catastrophically.

    Args:
      grads: [B, M, C] cotangents.
      cell_ends: [B, S * num_cells] ascending int32 right boundaries.
    Returns:
      [B, num_cells, C] float32.
    """
    from .pallas.lut_gather import lut_gather_sorted

    bsz, _, c = grads.shape
    csum = jnp.cumsum(grads.astype(jnp.float32), axis=1)
    csum = jnp.concatenate([jnp.zeros((bsz, 1, c), jnp.float32), csum],
                           axis=1)                          # [B, M+1, C]
    lanes = 128
    pad = (-csum.shape[1]) % lanes
    grid = jnp.pad(csum, ((0, 0), (0, pad), (0, 0))).reshape(
        bsz, -1, lanes, c)                                  # [B, R, 128, C]
    rows = (cell_ends // lanes).astype(jnp.int32)
    cols = (cell_ends % lanes).astype(jnp.int32)
    # 1024 consecutive boundaries advance ~1024 * (M / cells) events
    # (~30 rows at the 3.6 ev/cell flow shape); band 64 leaves slack, and
    # denser stretches fall back to the chunked full-height branch.
    # One call PER CHANNEL: the [R, 128*C] table is ~8.4 MB at 1M events
    # and C=2, and the whole-table VMEM block overflowed the 16 MB scoped
    # limit by 128 KB (measured HTTP OOM); per-channel halves it.
    gath = jnp.concatenate([
        lut_gather_sorted(grid[..., ci:ci + 1], rows, cols,
                          interpret=jax.default_backend() != "tpu",
                          band_rows=64,
                          precision=jax.lax.Precision.HIGHEST)
        for ci in range(c)], axis=-1)
    prev = jnp.concatenate([jnp.zeros((bsz, 1, c), jnp.float32),
                            gath[:, :-1]], axis=1)
    segs = (gath - prev).reshape(bsz, -1, num_cells, c)
    return segs.sum(axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5, 6))
def grid_gather(grid: jnp.ndarray, rows_idx: jnp.ndarray,
                cols_idx: jnp.ndarray, bwd_impl: str = "matmul",
                cell_ends: jnp.ndarray | None = None,
                fwd_impl: str = "xla",
                fwd_band_rows: int | None = None) -> jnp.ndarray:
    """Differentiable per-event lookup grid[b, rows_idx, cols_idx, :].

    Forward is a plain XLA gather (fast on TPU: ~33 ms at 4 x 1M events);
    the BACKWARD of a gather is a scatter-add, which XLA serializes per
    update (~200 ms at the same scale and it dominated the whole flow train
    step).  bwd_impl='matmul' routes the cotangent through
    `_segment_sum_matmul`; 'sorted' (events pre-sorted by flat cell id,
    with host-precomputed `cell_ends` — REQUIRED whenever the sort is
    segmented, e.g. polarity-packed halves) through the O(M)
    cumsum-difference `_segment_sum_sorted` — measured ~10x the matmul path
    at b8 x 1M; 'native' keeps XLA's scatter (the golden reference on CPU).

    Args:
      grid: [B, R, X, C] (for the flow LUT: R = n_bins * Hq, X = Wq).
      rows_idx, cols_idx: [B, M] int32, pre-clipped to range.
      cell_ends: [B, S * R * X] int32 right boundaries for 'sorted'
        (see _segment_sum_sorted), or None.
      fwd_impl: 'xla' (plain gather) or 'pallas_sorted' (banded one-hot
        contraction for cell-sorted indices, ops/pallas/lut_gather.py).
      fwd_band_rows: row window for 'pallas_sorted' (>= 2 * n_bins + 2 for
        y-major keys); None = the kernel default.
    Returns:
      [B, M, C].
    """
    out, _ = _grid_gather_fwd(grid, rows_idx, cols_idx, bwd_impl, cell_ends,
                              fwd_impl, fwd_band_rows)
    return out


def _gather_rows(grid, rows_idx, cols_idx):
    b, r, x, c = grid.shape
    flat = rows_idx * x + cols_idx                       # [B, M]
    gflat = grid.reshape(b, r * x, c)
    return jnp.take_along_axis(gflat, flat[..., None], axis=1)


def _grid_gather_fwd(grid, rows_idx, cols_idx, bwd_impl, cell_ends,
                     fwd_impl="xla", fwd_band_rows=None):
    if fwd_impl == "pallas_sorted":
        from .pallas.lut_gather import lut_gather_sorted

        out = lut_gather_sorted(grid, rows_idx, cols_idx,
                                interpret=jax.default_backend() != "tpu",
                                band_rows=fwd_band_rows)
    else:
        out = _gather_rows(grid, rows_idx, cols_idx)
    return out, (grid.shape, rows_idx, cols_idx, cell_ends)


def _grid_gather_bwd(bwd_impl, fwd_impl, fwd_band_rows, residuals, g_out):
    (b, r, x, c), rows_idx, cols_idx, cell_ends = residuals
    if bwd_impl == "pallas":
        from .pallas.iwe_vote import segment_sum_pallas

        d_grid = segment_sum_pallas(rows_idx, cols_idx, g_out, r, x)
    elif bwd_impl == "matmul":
        d_grid = jax.vmap(
            lambda ri, ci, g: _segment_sum_matmul(ri, ci, g, num_rows=r,
                                                  num_cols=x)
        )(rows_idx, cols_idx, g_out)
    elif bwd_impl == "sorted_pallas":
        # 'sorted' with the boundary gather as a banded one-hot MXU
        # contraction (requires cell_ends; exact via precision=HIGHEST).
        assert cell_ends is not None, "sorted_pallas needs cell_ends"
        d_grid = _segment_sum_sorted_batch_pallas(
            g_out, cell_ends, r * x).reshape(b, r, x, c)
    elif bwd_impl == "sorted":
        # Requires rows_idx * x + cols_idx ascending along M per segment
        # (cell-sorted events — see data/host_ops.py::lut_cell_sort).
        if cell_ends is None:
            d_grid = jax.vmap(
                lambda ri, ci, g: _segment_sum_sorted(
                    ri * x + ci, g, num_cells=r * x).reshape(r, x, -1)
            )(rows_idx, cols_idx, g_out)
        else:
            d_grid = jax.vmap(
                lambda ri, ci, g, ce: _segment_sum_sorted(
                    ri * x + ci, g, num_cells=r * x,
                    cell_ends=ce).reshape(r, x, -1)
            )(rows_idx, cols_idx, g_out, cell_ends)
    else:
        d_grid = jnp.zeros((b, r, x, c), g_out.dtype)
        d_grid = d_grid.at[jnp.arange(b)[:, None], rows_idx, cols_idx].add(
            g_out)
    return d_grid, None, None, None


grid_gather.defvjp(_grid_gather_fwd, _grid_gather_bwd)


def iwe_bilinear_vote_batch(coords_yx: jnp.ndarray, weight: jnp.ndarray, *,
                            height: int, width: int,
                            scatter_impl: str = "direct") -> jnp.ndarray:
    """Batched bilinear vote: [B, M, 2], [B, M] -> [B, H, W].

    scatter_impl: 'direct' / 'sorted' scatter-adds, 'matmul' for the MXU
    one-hot outer-product path (iwe_bilinear_vote_matmul), or 'pallas' for
    the fused kernel that builds the tap tiles in VMEM
    (ops/pallas/iwe_vote.py — the fastest path on TPU).  vmap keeps each
    image's accumulation independent, which shards cleanly over the data
    axis of the mesh.
    """
    if scatter_impl == "pallas":
        from .pallas.iwe_vote import iwe_vote_pallas

        return iwe_vote_pallas(coords_yx, weight, height, width)
    if scatter_impl == "matmul":
        return jax.vmap(
            lambda c, w: iwe_bilinear_vote_matmul(c, w, height=height,
                                                  width=width)
        )(coords_yx, weight)
    return jax.vmap(
        lambda c, w: iwe_bilinear_vote(c, w, height=height, width=width,
                                       scatter_impl=scatter_impl)
    )(coords_yx, weight)
