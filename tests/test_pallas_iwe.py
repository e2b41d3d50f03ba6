"""Pallas IWE vote kernel vs the scatter reference (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionpriorcmax_tpu.ops.events import iwe_bilinear_vote
from motionpriorcmax_tpu.ops.pallas.iwe_vote import iwe_vote_pallas

H, W = 24, 36


def make_inputs(rng, b=2, m=700):
    coords = rng.uniform(-2, H + 2, (b, m, 2)).astype(np.float32)
    coords[..., 1] = rng.uniform(-2, W + 2, (b, m)).astype(np.float32)
    wgt = rng.uniform(0, 2, (b, m)).astype(np.float32)
    wgt[:, -60:] = 0.0
    return jnp.asarray(coords), jnp.asarray(wgt)


def scatter_batch(coords, wgt):
    return jax.vmap(lambda c, w: iwe_bilinear_vote(c, w, height=H,
                                                   width=W))(coords, wgt)


def test_pallas_vote_matches_scatter(rng):
    coords, wgt = make_inputs(rng)
    want = np.asarray(scatter_batch(coords, wgt))
    got = np.asarray(iwe_vote_pallas(coords, wgt, H, W, jnp.float32, True))
    np.testing.assert_allclose(got, want, atol=1e-4)

    got16 = np.asarray(iwe_vote_pallas(coords, wgt, H, W, jnp.bfloat16,
                                       True))
    assert np.max(np.abs(got16 - want)) < 0.02 * max(want.max(), 1.0)


def test_pallas_vote_gradients(rng):
    coords, wgt = make_inputs(rng, b=1, m=500)

    def loss_ref(c, w):
        return jnp.sum(jnp.square(scatter_batch(c, w)))

    def loss_pal(c, w):
        return jnp.sum(jnp.square(iwe_vote_pallas(c, w, H, W, jnp.float32,
                                                  True)))

    gc_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(coords, wgt)
    gc_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(coords, wgt)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_r),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               atol=5e-3, rtol=1e-3)


def test_pallas_vote_nonmultiple_m(rng):
    """M not a multiple of the block size pads with zero-weight rows."""
    coords, wgt = make_inputs(rng, b=1, m=333)
    want = np.asarray(scatter_batch(coords, wgt))
    got = np.asarray(iwe_vote_pallas(coords, wgt, H, W, jnp.float32, True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_vote_multiblock(rng):
    """M spanning several (KB * BE) grid steps — the production regime.

    The original kernel used (1, 1, BE) event blocks, which Mosaic refuses
    to lower once the block count exceeds 1 (the (8, 128) trailing-tile
    rule); every test sat below one block so the failure only appeared on
    the real chip at 1M events.  This pins the multi-block path, including
    gradients, in interpret mode."""
    from motionpriorcmax_tpu.ops.pallas.iwe_vote import BE, KB

    m = 2 * KB * BE + 123
    coords, wgt = make_inputs(rng, b=2, m=m)
    want = np.asarray(scatter_batch(coords, wgt))
    got = np.asarray(iwe_vote_pallas(coords, wgt, H, W, jnp.float32, True))
    np.testing.assert_allclose(got, want, atol=1e-3)

    def loss_ref(c, w):
        return jnp.sum(jnp.square(scatter_batch(c, w)))

    def loss_pal(c, w):
        return jnp.sum(jnp.square(iwe_vote_pallas(c, w, H, W, jnp.float32,
                                                  True)))

    gc_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(coords, wgt)
    gc_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(coords, wgt)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_r),
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               atol=5e-3, rtol=1e-3)


def test_segment_sum_pallas_matches_scatter(rng):
    """The one-hot-matmul segment sum (grid-gather backward) vs a plain
    scatter-add, interpret mode."""
    from motionpriorcmax_tpu.ops.pallas.iwe_vote import segment_sum_pallas

    b, r, x, c, m = 2, 16, 12, 2, 900
    ri = rng.integers(0, r, (b, m)).astype(np.int32)
    ci = rng.integers(0, x, (b, m)).astype(np.int32)
    g = rng.normal(size=(b, m, c)).astype(np.float32)

    want = np.zeros((b, r, x, c), np.float32)
    np.add.at(want, (np.arange(b)[:, None], ri, ci), g)

    got = np.asarray(segment_sum_pallas(jnp.asarray(ri), jnp.asarray(ci),
                                        jnp.asarray(g), r, x, True))
    np.testing.assert_allclose(got, want, atol=2e-2 * np.abs(want).max())


def make_sorted_inputs(rng, b=2, m=3000, h=64, w=40, disp=3.0):
    """Events sorted by row (cell-sorted proxy): each 1024-event sub-block
    spans ~h*1024/m rows, so a band > that exercises the banded path."""
    y = np.sort(rng.uniform(0, h - 1, (b, m)), axis=1)
    x = rng.uniform(0, w - 1, (b, m))
    coords = np.stack([y, x], -1).astype(np.float32)
    coords += rng.uniform(-disp, disp, coords.shape).astype(np.float32)
    wgt = rng.uniform(0, 2, (b, m)).astype(np.float32)
    wgt[:, -60:] = 0.0
    return jnp.asarray(coords), jnp.asarray(wgt)


@pytest.mark.parametrize("band", [32, 8])
def test_pallas_vote_sorted_banded(rng, band):
    """Banded kernel matches scatter; band=8 forces the cond fallback."""
    from motionpriorcmax_tpu.ops.pallas.iwe_vote import iwe_vote_pallas_sorted

    h, w = 64, 40
    coords, wgt = make_sorted_inputs(rng, h=h, w=w)

    def scatter(c, ww):
        return jax.vmap(lambda ci, wi: iwe_bilinear_vote(
            ci, wi, height=h, width=w))(c, ww)

    want = np.asarray(scatter(coords, wgt))
    got = np.asarray(iwe_vote_pallas_sorted(coords, wgt, h, w, band,
                                            jnp.float32, True))
    np.testing.assert_allclose(got, want, atol=1e-4)

    # coords gradients (weights stop_gradient'ed, the make_iwes contract)
    def loss_ref(c):
        return jnp.sum(jnp.square(scatter(c, wgt)))

    def loss_band(c):
        return jnp.sum(jnp.square(iwe_vote_pallas_sorted(
            c, wgt, h, w, band, jnp.float32, True)))

    gc_r = jax.grad(loss_ref)(coords)
    gc_b = jax.grad(loss_band)(coords)
    np.testing.assert_allclose(np.asarray(gc_b), np.asarray(gc_r),
                               atol=5e-3, rtol=1e-3)
