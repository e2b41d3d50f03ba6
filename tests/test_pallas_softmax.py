"""Pallas softmax-interp kernel vs dense jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionpriorcmax_tpu.ops.pallas import (softmax_interp_pallas,
                                            softmax_interp_reference)


def make_inputs(rng, g=2, q=700, n=2500, c=4):
    queries = rng.uniform(0, 100, (q, 2)).astype(np.float32)
    db = rng.uniform(0, 100, (g, n, 2)).astype(np.float32)
    vals = rng.normal(size=(g, n, c)).astype(np.float32)
    return jnp.asarray(queries), jnp.asarray(db), jnp.asarray(vals)


@pytest.mark.parametrize("cross_impl", ["vpu", "mxu"])
def test_forward_matches_reference(rng, cross_impl):
    queries, db, vals = make_inputs(rng)
    got = softmax_interp_pallas(queries, db, vals, 25.0, True,
                                (0.0, 0.0, 0.0), jnp.float32, cross_impl)
    want = softmax_interp_reference(queries, db, vals, 25.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_invalid_cross_impl_raises(rng):
    queries, db, vals = make_inputs(rng, g=1, q=64, n=128, c=2)
    with pytest.raises(ValueError, match="cross_impl"):
        softmax_interp_pallas(queries, db, vals, 25.0, True,
                              (0.0, 0.0, 0.0), jnp.float32, "auto")


def test_vpu_cross_accurate_at_image_scale(rng):
    """The direct-difference ('vpu') build has no q.q+d.d-2q.d cancellation:
    at image-scale coordinates (~640 px) it must stay well under the
    expansion's ~5e-3 f32 cancellation floor."""
    queries, db, vals = make_inputs(rng, g=2, q=900, n=2048)
    queries = queries * 6.4
    db = db * 6.4
    got = softmax_interp_pallas(queries, db, vals, 25.0, True)
    want = softmax_interp_reference(queries, db, vals, 25.0)
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 3e-4, err


def test_forward_unpadded_sizes(rng):
    # Exact multiples of the tile sizes (no padding path).
    queries, db, vals = make_inputs(rng, g=1, q=512, n=1920, c=4)
    got = softmax_interp_pallas(queries, db, vals, 16.0, True)
    want = softmax_interp_reference(queries, db, vals, 16.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("cross_impl", ["vpu", "mxu"])
def test_backward_matches_reference(rng, cross_impl):
    queries, db, vals = make_inputs(rng, g=1, q=600, n=2100, c=3)
    w = jnp.asarray(rng.normal(size=(1, 600, 3)).astype(np.float32))

    def f_pallas(v):
        return jnp.sum(softmax_interp_pallas(
            queries, db, v, 25.0, True, (0.0, 0.0, 0.0), jnp.float32,
            cross_impl) * w)

    def f_ref(v):
        # Reference with stop-grad weights (the kernel's contract).
        dy = queries[None, :, None, 0] - db[:, None, :, 0]
        dx = queries[None, :, None, 1] - db[:, None, :, 1]
        wts = jax.lax.stop_gradient(jnp.exp(-(dy * dy + dx * dx) / 25.0))
        num = jnp.einsum("gqn,gnc->gqc", wts, v)
        den = jnp.sum(wts, axis=-1, keepdims=True)
        return jnp.sum(num / den * w)

    g_pallas = jax.grad(f_pallas)(vals)
    g_ref = jax.grad(f_ref)(vals)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-3)


def test_band_truncation_matches_full(rng):
    """Row-band truncation must be numerically identical when the margin
    covers the displacement (excluded weights underflow to zero)."""
    gh, gw, cell = 24, 32, 4.0
    ys = (np.arange(gh) * cell + cell / 2 - 0.5)
    xs = (np.arange(gw) * cell + cell / 2 - 0.5)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    queries = jnp.asarray(
        np.stack([gy.reshape(-1), gx.reshape(-1)], -1).astype(np.float32))
    base = np.asarray(queries)
    db = jnp.asarray((base[None] + rng.uniform(-6, 6, (2,) + base.shape))
                     .astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(2, base.shape[0], 3))
                       .astype(np.float32))

    full = softmax_interp_pallas(queries, db, vals, 16.0, True)
    banded = softmax_interp_pallas(queries, db, vals, 16.0, True,
                                   (40.0, cell, float(gw)))
    np.testing.assert_allclose(np.asarray(banded), np.asarray(full),
                               atol=1e-4, rtol=1e-4)

    g_full = jax.grad(lambda v: jnp.sum(
        softmax_interp_pallas(queries, db, v, 16.0, True) ** 2))(vals)
    g_band = jax.grad(lambda v: jnp.sum(
        softmax_interp_pallas(queries, db, v, 16.0, True,
                              (40.0, cell, float(gw))) ** 2))(vals)
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_full),
                               atol=1e-4, rtol=1e-3)


def test_traced_band_matches_full(rng):
    """A traced [3] band array (data-dependent margin, the
    interp_band_dynamic path) must match the full scan and the static
    tuple band, under jit, including gradients."""
    gh, gw, cell = 24, 32, 4.0
    ys = (np.arange(gh) * cell + cell / 2 - 0.5)
    xs = (np.arange(gw) * cell + cell / 2 - 0.5)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    queries = jnp.asarray(
        np.stack([gy.reshape(-1), gx.reshape(-1)], -1).astype(np.float32))
    base = np.asarray(queries)
    db = jnp.asarray((base[None] + rng.uniform(-6, 6, (2,) + base.shape))
                     .astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(2, base.shape[0], 3))
                       .astype(np.float32))

    full = softmax_interp_pallas(queries, db, vals, 16.0, True)

    @jax.jit
    def banded(db, vals):
        maxdisp = jnp.max(jnp.abs(db[..., 0] - queries[None, :, 0]))
        band = jnp.stack([maxdisp + 4.0 * jnp.sqrt(16.0) + cell,
                          jnp.float32(cell), jnp.float32(gw)])
        return softmax_interp_pallas(queries, db, vals, 16.0, True, band)

    np.testing.assert_allclose(np.asarray(banded(db, vals)),
                               np.asarray(full), atol=1e-4, rtol=1e-4)

    g_full = jax.grad(lambda v: jnp.sum(
        softmax_interp_pallas(queries, db, v, 16.0, True) ** 2))(vals)
    g_band = jax.grad(lambda v: jnp.sum(banded(db, v) ** 2))(vals)
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_full),
                               atol=1e-4, rtol=1e-3)


def test_starved_query_gives_zero_not_nan(rng):
    """A query whose every db point is far away underflows den to 0 (the
    kernel has no max-subtraction); the result must be 0, not 0/0 = NaN,
    and gradients must stay finite."""
    from motionpriorcmax_tpu.ops.pallas.softmax_interp import (
        softmax_interp_pallas)

    q = jnp.asarray(rng.uniform(0, 8, (4, 2)).astype(np.float32))
    db = jnp.asarray(rng.uniform(5000, 6000, (1, 8, 2)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(1, 8, 3)).astype(np.float32))

    out = softmax_interp_pallas(q, db, vals, 25.0, True)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.allclose(np.asarray(out), 0.0)

    g = jax.grad(lambda v: jnp.sum(
        softmax_interp_pallas(q, db, v, 25.0, True) ** 2))(vals)
    assert np.all(np.isfinite(np.asarray(g)))


def test_bf16_exp_close_to_f32(rng):
    from motionpriorcmax_tpu.ops.pallas.softmax_interp import (
        softmax_interp_pallas)

    q_, n, g, c = 96, 300, 2, 3
    queries = jnp.asarray(rng.uniform(0, 40, (q_, 2)).astype(np.float32))
    db = jnp.asarray(rng.uniform(0, 40, (g, n, 2)).astype(np.float32))
    vals = jnp.asarray(rng.normal(size=(g, n, c)).astype(np.float32))
    out32 = softmax_interp_pallas(queries, db, vals, 16.0, True)
    out16 = softmax_interp_pallas(queries, db, vals, 16.0, True,
                                  (0.0, 0.0, 0.0), jnp.bfloat16)
    # Normalized interpolation: bf16 weight noise largely cancels.
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=2e-2, rtol=2e-2)

    # The backward recomputes weights in exp_dtype too (mixed-precision
    # gradient: ~0.4% relative, same as the XLA path's bf16 checkpoint).
    g32 = jax.grad(lambda v: jnp.sum(
        softmax_interp_pallas(queries, db, v, 16.0, True) ** 2))(vals)
    g16 = jax.grad(lambda v: jnp.sum(
        softmax_interp_pallas(queries, db, v, 16.0, True,
                              (0.0, 0.0, 0.0), jnp.bfloat16) ** 2))(vals)
    scale = float(jnp.max(jnp.abs(g32)))
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               atol=2e-2 * scale, rtol=2e-2)


def test_per_group_band_matches_full(rng):
    """A [G, 3] band (per-group margins) must match the full scan when each
    group's margin covers that group's displacement."""
    gh, gw, cell = 24, 32, 4.0
    ys = (np.arange(gh) * cell + cell / 2 - 0.5)
    xs = (np.arange(gw) * cell + cell / 2 - 0.5)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    queries = jnp.asarray(
        np.stack([gy.reshape(-1), gx.reshape(-1)], -1).astype(np.float32))
    base = np.asarray(queries)
    # Group g's trajectories displaced by up to 2*(g+1) px (linear-in-bin
    # displacement growth, like bin midtimes).
    g_n = 3
    db = np.stack([base + rng.uniform(-2 * (g + 1), 2 * (g + 1), base.shape)
                   for g in range(g_n)]).astype(np.float32)
    vals = jnp.asarray(rng.normal(size=(g_n, base.shape[0], 3))
                       .astype(np.float32))
    db = jnp.asarray(db)

    tail = 4.0 * np.sqrt(16.0) + cell
    band = jnp.asarray(
        np.stack([[2.0 * (g + 1) + tail, cell, float(gw)]
                  for g in range(g_n)], 0).astype(np.float32))

    full = softmax_interp_pallas(queries, db, vals, 16.0, True)
    banded = softmax_interp_pallas(queries, db, vals, 16.0, True, band)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(full),
                               atol=1e-4, rtol=1e-4)

    g_full = jax.grad(lambda v: jnp.sum(
        softmax_interp_pallas(queries, db, v, 16.0, True) ** 2))(vals)
    g_band = jax.grad(lambda v: jnp.sum(
        softmax_interp_pallas(queries, db, v, 16.0, True, band) ** 2))(vals)
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_full),
                               atol=1e-4, rtol=1e-3)


def test_per_bin_band_focus_interp(rng):
    """interp_band_per_bin=True equals the shared static band for linear
    trajectories (disp = flow * t_mid) through the focus-loss interp path."""
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.losses.focus import interpolate_flow

    h, w, s, n_bins = 96, 128, 4, 5
    hq, wq = h // s, w // s
    n = hq * wq
    mid = s / 2.0 - 0.5
    gy, gx = np.meshgrid(np.arange(0, h, s) + mid, np.arange(0, w, s) + mid,
                         indexing="ij")
    seeds = np.stack([gy.reshape(-1), gx.reshape(-1)], -1).astype(np.float32)
    flow = rng.uniform(-10, 10, (1, n, 2)).astype(np.float32)
    t_mid = ((np.arange(n_bins) + 0.5) / n_bins).astype(np.float32)
    traj_at_tmid = jnp.asarray(
        seeds[None, None] + flow[:, None] * t_mid[None, :, None, None])
    traj_at_tref = jnp.asarray(seeds[None, None] + flow[:, None] * 0.3)

    def cfg(per_bin):
        return FocusLossConfig(
            image_shape=(h, w), num_tref=1, num_bins=n_bins,
            lut_superpixel_size=s, knn_method="softmax", softmax_temp=16.0,
            interp_band_px=30.0, interp_band_per_bin=per_bin,
            use_pallas_interp=True, smooth_weight=0.0)

    lut_a, _ = interpolate_flow(cfg(False), traj_at_tref, traj_at_tmid)
    lut_b, _ = interpolate_flow(cfg(True), traj_at_tref, traj_at_tmid)
    np.testing.assert_allclose(np.asarray(lut_b), np.asarray(lut_a),
                               atol=1e-4, rtol=1e-4)
