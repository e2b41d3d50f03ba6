"""RAFT-Spline component and forward tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionpriorcmax_tpu.models.raft_spline import (
    RAFTSpline, RAFTSplineConfig, coords_grid, curve_flow_from_reference,
    curve_params_init, cvx_upsample)
from motionpriorcmax_tpu.models.raft_spline.corr import (
    bilinear_sample_hw, build_corr_pyramid, compute_corr_volume,
    lookup_corr_pyramid)


def test_curve_flow_endpoints(rng):
    # flow(0) = 0 and flow(1) = last control point (curves/base.py:102-106).
    params = jnp.asarray(rng.normal(size=(2, 2 * 3, 4, 5)).astype(np.float32))
    flows = curve_flow_from_reference(params, [0.0, 1.0], "BEZIER")
    assert flows.shape == (2, 2, 2, 4, 5)
    np.testing.assert_allclose(np.asarray(flows[0]), 0.0, atol=1e-6)
    pv = np.asarray(params).reshape(2, 2, 3, 4, 5)
    np.testing.assert_allclose(np.asarray(flows[1]), pv[:, :, -1], atol=1e-5)


def test_curve_flow_polynomial(rng):
    params = jnp.asarray(rng.normal(size=(1, 4, 3, 3)).astype(np.float32))
    flows = curve_flow_from_reference(params, [0.5], "POLYNOMIAL")
    pv = np.asarray(params).reshape(1, 2, 2, 3, 3)
    want = pv[:, :, 0] * 0.5 + pv[:, :, 1] * 0.25
    np.testing.assert_allclose(np.asarray(flows[0]), want, atol=1e-6)


def test_coords_grid():
    g = np.asarray(coords_grid(1, 3, 4))
    # channel 0 = x, channel 1 = y (utils.py:22-28).
    assert g[0, 0, 1, 2] == 2.0 and g[0, 1, 1, 2] == 1.0


def test_cvx_upsample_constant(rng):
    # Convex combination of a constant field must stay constant (x8 scale).
    data = jnp.ones((1, 2, 3, 4)) * 1.5
    mask = jnp.asarray(rng.normal(size=(1, 9 * 64, 3, 4)).astype(np.float32))
    up = cvx_upsample(data, mask)
    assert up.shape == (1, 2, 24, 32)
    # Interior only: the 3x3 unfold zero-pads the border (torch F.unfold
    # padding=1 does the same), so edge outputs mix in zeros when the mask
    # puts weight there.
    np.testing.assert_allclose(np.asarray(up)[:, :, 8:16, 8:24], 8 * 1.5,
                               atol=1e-5)


def test_corr_volume_matches_naive(rng):
    b, d, h, w, t = 2, 8, 4, 5, 3
    f1 = rng.normal(size=(b, d, h, w)).astype(np.float32)
    f2 = rng.normal(size=(t, b, d, h, w)).astype(np.float32)
    got = np.asarray(compute_corr_volume(jnp.asarray(f1), jnp.asarray(f2)))
    assert got.shape == (t, b, h * w, h, w)
    # Naive single entry: corr[t, b, q, i, j] = <f1[b,:,qy,qx], f2[t,b,:,i,j]>/sqrt(d)
    q = 7; qy, qx = q // w, q % w
    want = f1[1, :, qy, qx] @ f2[2, 1, :, 2, 3] / np.sqrt(d)
    assert np.isclose(got[2, 1, q, 2, 3], want, atol=1e-5)


def test_corr_pyramid_structure(rng):
    corr = jnp.asarray(rng.normal(size=(3, 1, 6, 8, 8)).astype(np.float32))
    pyr = build_corr_pyramid(corr, [1, 3, 2])
    assert [idx for idx, _ in pyr] == [(0, 1, 2), (1, 2), (1,)]
    assert pyr[1][1].shape == (2, 1, 6, 4, 4)
    assert pyr[2][1].shape == (1, 1, 6, 2, 2)
    # Level 2 is the avg-pool of level 1's corresponding target.
    want = np.asarray(pyr[1][1][0]).reshape(1, 6, 2, 2, 2, 2).mean(axis=(-3, -1))
    np.testing.assert_allclose(np.asarray(pyr[2][1][0]), want, atol=1e-6)


def test_bilinear_sample_exact_and_oob(rng):
    img = jnp.asarray(rng.normal(size=(2, 5, 6)).astype(np.float32))
    # Integer coords return exact pixels.
    x = jnp.asarray([[2.0, 0.0], [5.0, 1.0]])
    y = jnp.asarray([[3.0, 0.0], [4.0, 2.0]])
    got = np.asarray(bilinear_sample_hw(img, x, y))
    assert np.isclose(got[0, 0], float(img[0, 3, 2]), atol=1e-6)
    assert np.isclose(got[1, 0], float(img[1, 4, 5]), atol=1e-6)
    # Out of bounds -> 0.
    oob = np.asarray(bilinear_sample_hw(img, jnp.asarray([[-2.0]]),
                                        jnp.asarray([[1.0]])))
    assert np.isclose(oob[0, 0], 0.0)


def test_lookup_shapes(rng):
    t, b, h1, w1 = 2, 1, 4, 4
    corr = jnp.asarray(rng.normal(size=(t, b, h1 * w1, h1, w1)).astype(np.float32))
    pyr = build_corr_pyramid(corr, [1, 2])
    coords = coords_grid(b, h1, w1)[None].repeat(t, axis=0)
    out = lookup_corr_pyramid(pyr, coords, radius=2)
    k = 25
    assert out.shape == (b, (2 + 1) * k, h1, w1)


@pytest.mark.parametrize("curve_type", ["BEZIER", "LEARNED"])
def test_raft_spline_forward(curve_type):
    cfg = RAFTSplineConfig(
        nbins_context=5, nbins_correlation=3, bezier_degree=2,
        curve_type=curve_type, ev_target_indices=(2, 4), ev_levels=(1, 2),
        iters=2)
    model = RAFTSpline(cfg)
    voxel = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, cfg.nbins_total, 32, 32))
        .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), voxel, test_mode=True)
    params_low, params_up = model.apply(variables, voxel, test_mode=True)
    assert params_low.shape == (1, 4, 4, 4)
    assert params_up.shape == (1, 4, 32, 32)
    assert np.isfinite(np.asarray(params_up)).all()

    # Train mode returns one upsampled prediction per iteration.
    preds = model.apply(variables, voxel, test_mode=False)
    assert len(preds) == 2 and preds[0].shape == (1, 4, 32, 32)


def test_raft_spline_remat_encoders_same_forward():
    """remat_encoders changes memory scheduling only — identical params tree
    and (numerically identical) outputs."""
    kw = dict(nbins_context=5, nbins_correlation=3, bezier_degree=2,
              ev_target_indices=(2, 4), ev_levels=(1, 2), iters=2)
    voxel = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 7, 32, 32))
        .astype(np.float32))
    base = RAFTSpline(RAFTSplineConfig(**kw))
    variables = base.init(jax.random.PRNGKey(0), voxel, test_mode=True)
    _, up = base.apply(variables, voxel, test_mode=True)

    rm = RAFTSpline(RAFTSplineConfig(remat_encoders=True, **kw))
    vars_rm = rm.init(jax.random.PRNGKey(0), voxel, test_mode=True)
    assert (jax.tree_util.tree_structure(vars_rm["params"])
            == jax.tree_util.tree_structure(variables["params"]))
    _, up_rm = rm.apply(variables, voxel, test_mode=True)
    np.testing.assert_allclose(np.asarray(up_rm), np.asarray(up), atol=1e-5)

    # Gradients flow (training path with mutable batch stats).
    def loss(params):
        preds = rm.apply({"params": params,
                          "batch_stats": variables.get("batch_stats", {})},
                         voxel, test_mode=False, train=True,
                         mutable=["batch_stats"])[0]
        return jnp.sum(preds[-1] ** 2)

    g = jax.grad(loss)(variables["params"])
    assert np.isfinite(
        float(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))


def test_raft_spline_bf16_corr_close_to_f32():
    """corr_dtype='bfloat16' halves the stored pyramid; predictions must stay
    close to the f32 path (dot products still accumulate in f32)."""
    kw = dict(nbins_context=5, nbins_correlation=3, bezier_degree=2,
              ev_target_indices=(2, 4), ev_levels=(1, 2), iters=2)
    voxel = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 8 - 1, 32, 32))
        .astype(np.float32))
    cfg32 = RAFTSplineConfig(**kw)
    model32 = RAFTSpline(cfg32)
    variables = model32.init(jax.random.PRNGKey(0), voxel, test_mode=True)
    _, up32 = model32.apply(variables, voxel, test_mode=True)

    model16 = RAFTSpline(RAFTSplineConfig(corr_dtype="bfloat16", **kw))
    _, up16 = model16.apply(variables, voxel, test_mode=True)
    err = float(jnp.max(jnp.abs(up16 - up32)))
    scale = float(jnp.max(jnp.abs(up32))) + 1e-6
    assert err / scale < 0.05, (err, scale)


def test_raft_spline_with_images():
    cfg = RAFTSplineConfig(
        nbins_context=5, nbins_correlation=3, bezier_degree=1,
        ev_target_indices=(2, 4), ev_levels=(1, 1), use_boundary_images=True,
        img_levels=2, iters=1)
    model = RAFTSpline(cfg)
    rng = np.random.default_rng(1)
    voxel = jnp.asarray(rng.normal(size=(1, cfg.nbins_total, 32, 32)).astype(np.float32))
    images = [jnp.asarray(rng.integers(0, 255, (1, 3, 32, 32)).astype(np.float32))
              for _ in range(2)]
    variables = model.init(jax.random.PRNGKey(0), voxel, images, test_mode=True)
    low, up = model.apply(variables, voxel, images, test_mode=True)
    assert up.shape == (1, 2, 32, 32)


def test_conv7x7s2_s2d_matches_native(rng):
    """The space-to-depth 7x7/s2 form is algebraically identical to the
    native strided conv (same [7,7,C,O] param, taps regrouped by phase)."""
    import jax

    from motionpriorcmax_tpu.models.raft_spline.extractor import Conv7x7S2

    x = jnp.asarray(rng.normal(size=(2, 16, 20, 5)).astype(np.float32))
    m_native = Conv7x7S2(8, impl="native")
    m_s2d = Conv7x7S2(8, impl="s2d")
    variables = m_native.init(jax.random.PRNGKey(0), x)
    y_native = m_native.apply(variables, x)
    y_s2d = m_s2d.apply(variables, x)
    assert y_s2d.shape == y_native.shape == (2, 8, 10, 8)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_native),
                               atol=1e-5)

    # Gradients agree too (the backward is the point of the rewrite).
    def loss(impl):
        m = Conv7x7S2(8, impl=impl)
        return lambda v, xx: jnp.sum(m.apply(v, xx) ** 2)

    gn = jax.grad(loss("native"), argnums=(0, 1))(variables, x)
    gs = jax.grad(loss("s2d"), argnums=(0, 1))(variables, x)
    for a, b in zip(jax.tree_util.tree_leaves(gn),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-4)


def test_window_lookup_matches_pointwise(rng):
    """The contiguous-window lookup must equal per-point bilinear sampling."""
    from motionpriorcmax_tpu.models.raft_spline.corr import _window_lookup

    n, h2, w2, r = 40, 12, 16, 3
    img = jnp.asarray(rng.normal(size=(n, h2, w2)).astype(np.float32))
    cx = jnp.asarray(rng.uniform(-2, w2 + 1, n).astype(np.float32))
    cy = jnp.asarray(rng.uniform(-2, h2 + 1, n).astype(np.float32))

    got = _window_lookup(img, cx, cy, r)

    d = np.arange(-r, r + 1, dtype=np.float32)
    ddx = np.tile(d[None, :], (2 * r + 1, 1)).reshape(-1)
    ddy = np.tile(d[:, None], (1, 2 * r + 1)).reshape(-1)
    want = bilinear_sample_hw(img, cx[:, None] + ddx[None, :],
                              cy[:, None] + ddy[None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_window_lookup_backward_matches_pointwise(rng):
    """_window_extract's custom VJP (gather forward, one-hot matmul
    backward) must produce the same d img and d coords as autodiff through
    the per-point bilinear sampler."""
    from motionpriorcmax_tpu.models.raft_spline.corr import _window_lookup

    n, h2, w2, r = 24, 10, 14, 2
    img = jnp.asarray(rng.normal(size=(n, h2, w2)).astype(np.float32))
    cx = jnp.asarray(rng.uniform(-1, w2, n).astype(np.float32))
    cy = jnp.asarray(rng.uniform(-1, h2, n).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n, (2 * r + 1) ** 2)).astype(np.float32))

    def f_win(im, x, y):
        return jnp.sum(_window_lookup(im, x, y, r) * w)

    d = np.arange(-r, r + 1, dtype=np.float32)
    ddx = np.tile(d[None, :], (2 * r + 1, 1)).reshape(-1)
    ddy = np.tile(d[:, None], (1, 2 * r + 1)).reshape(-1)

    def f_ref(im, x, y):
        s = bilinear_sample_hw(im, x[:, None] + ddx[None, :],
                               y[:, None] + ddy[None, :])
        return jnp.sum(s * w)

    g_win = jax.grad(f_win, argnums=(0, 1, 2))(img, cx, cy)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(img, cx, cy)
    for a, b in zip(g_win, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
