"""Golden unit tests for voxelization, bilinear IWE vote, blur, normalization.

The expected values are hand-computed from the reference formulas
(src/loader/utils/representation.py:77-109, src/utils/event_image_converter.py:333-391).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from motionpriorcmax_tpu.ops.events import (
    voxel_grid_from_events,
    iwe_bilinear_vote,
    iwe_bilinear_vote_batch,
    gaussian_blur_3x3,
    normalize_voxel_grid,
    clamp_voxel_grid_quantile,
)


def naive_voxel(y, x, t, p, valid, nb, h, w):
    grid = np.zeros((nb, h, w), dtype=np.float64)
    for yi, xi, ti, pi, vi in zip(y, x, t, p, valid):
        if vi == 0:
            continue
        val = 2 * pi - 1
        for xx in (np.floor(xi), np.floor(xi) + 1):
            for yy in (np.floor(yi), np.floor(yi) + 1):
                for tt in (np.floor(ti), np.floor(ti) + 1):
                    if 0 <= xx < w and 0 <= yy < h and 0 <= tt < nb:
                        wgt = (
                            (1 - abs(xx - xi)) * (1 - abs(yy - yi)) * (1 - abs(tt - ti))
                        )
                        grid[int(tt), int(yy), int(xx)] += val * wgt
    return grid


def test_voxel_grid_matches_naive(rng):
    nb, h, w = 5, 16, 24
    m = 200
    y = rng.uniform(-1, h + 1, m).astype(np.float32)
    x = rng.uniform(-1, w + 1, m).astype(np.float32)
    t = rng.uniform(-0.5, nb - 0.5, m).astype(np.float32)
    p = rng.integers(0, 2, m).astype(np.float32)
    valid = (rng.uniform(size=m) > 0.1).astype(np.float32)

    got = voxel_grid_from_events(
        jnp.asarray(y), jnp.asarray(x), jnp.asarray(t), jnp.asarray(p),
        jnp.asarray(valid), num_bins=nb, height=h, width=w,
    )
    want = naive_voxel(y, x, t, p, valid, nb, h, w)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_voxel_grid_integer_coords_fast_path():
    # Integer coords must land the full temporal weight on one pixel.
    y = jnp.array([3.0]); x = jnp.array([4.0]); t = jnp.array([1.25])
    p = jnp.array([1.0]); v = jnp.array([1.0])
    g = voxel_grid_from_events(y, x, t, p, v, num_bins=3, height=8, width=8)
    assert np.isclose(float(g[1, 3, 4]), 0.75)
    assert np.isclose(float(g[2, 3, 4]), 0.25)
    assert np.isclose(float(jnp.sum(jnp.abs(g))), 1.0)


def test_iwe_bilinear_vote_hand_values():
    # Event at (y, x) = (1.25, 2.5) with weight 2:
    # corners (1,2):(1-.25)(1-.5)=0.375, (2,2):.25*.5=0.125,
    #         (1,3):(1-.25)*.5=0.375, (2,3):.25*.5=0.125  — times 2.
    coords = jnp.array([[1.25, 2.5]])
    wgt = jnp.array([2.0])
    img = iwe_bilinear_vote(coords, wgt, height=4, width=5)
    img = np.asarray(img)
    # 1e-6 floor nudge shifts weights negligibly; use loose atol.
    assert np.isclose(img[1, 2], 2 * 0.75 * 0.5, atol=1e-4)
    assert np.isclose(img[2, 2], 2 * 0.25 * 0.5, atol=1e-4)
    assert np.isclose(img[1, 3], 2 * 0.75 * 0.5, atol=1e-4)
    assert np.isclose(img[2, 3], 2 * 0.25 * 0.5, atol=1e-4)
    assert np.isclose(img.sum(), 2.0, atol=1e-4)


def test_iwe_out_of_bounds_masked():
    coords = jnp.array([[-0.5, 2.0], [3.5, 4.5], [10.0, 2.0]])
    wgt = jnp.ones((3,))
    img = np.asarray(iwe_bilinear_vote(coords, wgt, height=4, width=5))
    # Event 0: only the y=0 corner row is in range -> weight 0.5 lands at (0,2).
    assert np.isclose(img[0, 2], 0.5, atol=1e-4)
    # Event 1: corners (3,4) only (y=4 and x=5 are out) -> 0.5*0.5.
    assert np.isclose(img[3, 4], 0.25, atol=1e-4)
    # Event 2 fully out of range.
    assert np.isclose(img.sum(), 0.75, atol=1e-4)


def test_iwe_batch(rng):
    coords = jnp.asarray(rng.uniform(0, 10, (3, 50, 2)).astype(np.float32))
    wgt = jnp.ones((3, 50))
    out = iwe_bilinear_vote_batch(coords, wgt, height=12, width=12)
    assert out.shape == (3, 12, 12)
    single = iwe_bilinear_vote(coords[1], wgt[1], height=12, width=12)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-6)


def test_gaussian_blur_3x3_matches_scipy(rng):
    from scipy.ndimage import correlate

    img = rng.uniform(size=(6, 7)).astype(np.float32)
    x = np.array([-1.0, 0.0, 1.0])
    k1 = np.exp(-0.5 * x**2); k1 /= k1.sum()
    k2 = np.outer(k1, k1)
    # torch F.pad(mode='reflect') does NOT duplicate the edge pixel — that is
    # scipy's 'mirror' mode (scipy 'reflect' duplicates the edge).
    want = correlate(img, k2, mode="mirror")
    got = np.asarray(gaussian_blur_3x3(jnp.asarray(img), sigma=1.0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_normalize_voxel_grid_mean_std():
    g = np.zeros((2, 3, 3), dtype=np.float32)
    g[0, 0, 0] = 1.0; g[0, 1, 1] = 3.0; g[1, 2, 2] = -2.0
    nz = np.array([1.0, 3.0, -2.0])
    mean, std = nz.mean(), nz.std(ddof=1)
    got = np.asarray(normalize_voxel_grid(jnp.asarray(g), "mean_std"))
    assert np.isclose(got[0, 0, 0], (1.0 - mean) / std, atol=1e-5)
    assert np.isclose(got[0, 1, 1], (3.0 - mean) / std, atol=1e-5)
    # zeros untouched
    assert got[0, 0, 1] == 0.0


def test_normalize_voxel_grid_max():
    g = jnp.asarray(np.array([[[2.0, -4.0], [0.0, 1.0]]], dtype=np.float32))
    got = np.asarray(normalize_voxel_grid(g, "max"))
    np.testing.assert_allclose(got, np.array([[[0.5, -1.0], [0.0, 0.25]]]), atol=1e-6)


def test_quantile_clamp():
    g = jnp.asarray(np.arange(-50, 50, dtype=np.float32).reshape(1, 10, 10))
    out = np.asarray(clamp_voxel_grid_quantile(g, 0.1))
    thr = np.quantile(np.abs(np.asarray(g)).ravel(), 0.9)
    assert np.max(np.abs(out)) <= thr + 1e-4


def test_iwe_matmul_matches_scatter(rng):
    """The MXU one-hot outer-product vote must reproduce the scatter vote
    (incl. fractional coords, out-of-range corners, zero-weight padding)."""
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.ops.events import iwe_bilinear_vote_matmul

    h, w, m = 24, 36, 700
    coords = rng.uniform(-2, h + 2, (m, 2)).astype(np.float32)
    coords[:, 1] = rng.uniform(-2, w + 2, m).astype(np.float32)
    wgt = rng.uniform(0, 2, m).astype(np.float32)
    wgt[-50:] = 0.0  # padding rows

    want = np.asarray(iwe_bilinear_vote(jnp.asarray(coords),
                                        jnp.asarray(wgt), height=h, width=w))
    got32 = np.asarray(iwe_bilinear_vote_matmul(
        jnp.asarray(coords), jnp.asarray(wgt), height=h, width=w,
        block_size=128, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got32, want, atol=1e-4)

    got16 = np.asarray(iwe_bilinear_vote_matmul(
        jnp.asarray(coords), jnp.asarray(wgt), height=h, width=w,
        block_size=128))
    # bf16 taps: ~3 decimal digits relative to the per-pixel count scale.
    assert np.max(np.abs(got16 - want)) < 0.02 * max(want.max(), 1.0)

    # Gradients wrt coords match the scatter path's (f32 compute).
    def loss_scatter(c):
        img = iwe_bilinear_vote(c, jnp.asarray(wgt), height=h, width=w)
        return jnp.sum(img * img)

    def loss_matmul(c):
        img = iwe_bilinear_vote_matmul(c, jnp.asarray(wgt), height=h,
                                       width=w, block_size=128,
                                       compute_dtype=jnp.float32)
        return jnp.sum(img * img)

    g_s = np.asarray(jax.grad(loss_scatter)(jnp.asarray(coords)))
    g_m = np.asarray(jax.grad(loss_matmul)(jnp.asarray(coords)))
    np.testing.assert_allclose(g_m, g_s, atol=5e-3, rtol=1e-3)


def test_iwe_batch_matmul_impl(rng):
    coords = rng.uniform(0, 11, (2, 300, 2)).astype(np.float32)
    wgt = np.ones((2, 300), np.float32)
    a = np.asarray(iwe_bilinear_vote_batch(coords, wgt, height=12, width=12))
    b = np.asarray(iwe_bilinear_vote_batch(coords, wgt, height=12, width=12,
                                           scatter_impl="matmul"))
    np.testing.assert_allclose(b, a, atol=0.05)


def test_grid_gather_matmul_bwd_matches_native(rng):
    """grid_gather with the MXU one-hot matmul backward reproduces the
    native scatter-add transpose (the flow-LUT warp gather's VJP)."""
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.ops.events import grid_gather, _segment_sum_matmul

    b, r, x, c, m = 2, 18, 10, 2, 700
    grid = rng.normal(size=(b, r, x, c)).astype(np.float32)
    ri = rng.integers(0, r, (b, m)).astype(np.int32)
    ci = rng.integers(0, x, (b, m)).astype(np.int32)
    gout = rng.normal(size=(b, m, c)).astype(np.float32)

    out_m = grid_gather(jnp.asarray(grid), jnp.asarray(ri), jnp.asarray(ci),
                        "matmul")
    out_n = grid_gather(jnp.asarray(grid), jnp.asarray(ri), jnp.asarray(ci),
                        "native")
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_n))
    # Forward IS the gather.
    np.testing.assert_allclose(
        np.asarray(out_m), grid[np.arange(b)[:, None], ri, ci])

    def loss(g, impl):
        out = grid_gather(g, jnp.asarray(ri), jnp.asarray(ci), impl)
        return jnp.sum(out * jnp.asarray(gout))

    g_m = np.asarray(jax.grad(lambda g: loss(g, "matmul"))(jnp.asarray(grid)))
    g_n = np.asarray(jax.grad(lambda g: loss(g, "native"))(jnp.asarray(grid)))
    # Default bf16 folding of the cotangent: ~3 decimal digits.
    np.testing.assert_allclose(g_m, g_n, atol=2e-2 * np.abs(g_n).max())

    # f32 compute is exact up to float sum ordering.
    seg = jax.vmap(lambda a, bb, g: _segment_sum_matmul(
        a, bb, g, num_rows=r, num_cols=x, block_size=256,
        compute_dtype=jnp.float32))(jnp.asarray(ri), jnp.asarray(ci),
                                    jnp.asarray(gout))
    np.testing.assert_allclose(np.asarray(seg), g_n, atol=1e-5)
