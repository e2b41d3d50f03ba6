"""On-chip numerics gates for the RAFT-Spline path (see conftest).

The flow path's kernels all carry on-chip gates (test_onchip.py) after
interpret mode hid a real-hardware Mosaic dot bug in round 2; these extend
the same discipline to the RAFT path's hot formulation — the one-hot corr
window lookup (reference corr.py:304-348) — and pin an absolute train-step
loss golden at the production recipe.
"""

import functools

import numpy as np
import pytest


@pytest.mark.parametrize("impl", ["einsum", "pallas"])
def test_corr_window_lookup_matches_gather_oracle_on_chip(rng, impl):
    """Window lookup vs an XLA gather+lerp oracle at EVIMO2 geometry
    (48x64 level maps, radius 4) on REAL hardware — values AND the coords
    gradient, both corr dtypes, both window-extraction impls.

    'pallas' (VPU masked select) is pure compare+add — exact by
    construction in every dtype.  'einsum' (the production impl) runs
    one-hot MXU dots: a SELECTION (one non-zero per row), so in principle
    exact — but Mosaic's DEFAULT dot has a history of result rounding
    (round-3 interp bug), and the measured b6 step losses differ ~1.4e-3
    relative between the impls, so the einsum gate is set at the
    documented DEFAULT-dot noise class rather than exactness.
    """
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.models.raft_spline.corr import (
        bilinear_sample_hw, build_corr_pyramid, lookup_corr_pyramid)

    b, h1, w1 = 1, 48, 64
    t = 5
    levels = (1, 1, 1, 1, 4)
    radius = 4
    corr_np = rng.normal(size=(t, b, h1 * w1, h1, w1)).astype(np.float32)
    flows = rng.normal(scale=6.0, size=(t, b, 2, h1, w1)).astype(np.float32)
    gy, gx = np.meshgrid(np.arange(h1, dtype=np.float32),
                         np.arange(w1, dtype=np.float32), indexing="ij")
    coords0 = np.broadcast_to(np.stack([gx, gy])[None, None],
                              (t, b, 2, h1, w1))
    coords = jnp.asarray(coords0 + flows)

    def oracle(pyramid, coords, radius):
        """Per-offset bilinear_sample_hw gathers (torch grid_sample twin)."""
        outs = []
        for lvl, (tidx, corr_l) in enumerate(pyramid):
            tl = len(tidx)
            csel = coords[jnp.asarray(tidx)] / (2.0 ** lvl)
            cx = csel[:, :, 0].reshape(-1)
            cy = csel[:, :, 1].reshape(-1)
            h2, w2 = corr_l.shape[-2:]
            img = corr_l.reshape(-1, h2, w2).astype(jnp.float32)
            feats = []
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    feats.append(bilinear_sample_hw(
                        img, (cx + dx)[:, None], (cy + dy)[:, None])[:, 0])
            feat = jnp.stack(feats, -1).reshape(tl, b, h1, w1, -1)
            outs.append(feat)
        out = jnp.concatenate(outs, axis=0)
        out = jnp.transpose(out, (1, 0, 4, 2, 3))
        return out.reshape(b, -1, h1, w1)

    tols = {"pallas": {jnp.float32: 1e-5, jnp.bfloat16: 2e-2},
            "einsum": {jnp.float32: 5e-3, jnp.bfloat16: 2e-2}}
    for dt in (jnp.float32, jnp.bfloat16):
        tol = tols[impl][dt]
        corr = jnp.asarray(corr_np).astype(dt)

        def got_fn(c):
            pyr = build_corr_pyramid(corr, levels)
            out = lookup_corr_pyramid(pyr, c, radius, impl)
            return jnp.sum(out.astype(jnp.float32) ** 2), out

        def want_fn(c):
            pyr = build_corr_pyramid(corr, levels)
            out = oracle(pyr, c, radius)
            return jnp.sum(out ** 2), out

        (_, got), g_got = jax.jit(
            jax.value_and_grad(got_fn, has_aux=True))(coords)
        (_, want), g_want = jax.jit(
            jax.value_and_grad(want_fn, has_aux=True))(coords)
        got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() < tol * scale, (
            dt, np.abs(got - want).max(), scale)
        g_got, g_want = np.asarray(g_got), np.asarray(g_want)
        gscale = np.abs(g_want).max() + 1e-6
        assert np.abs(g_got - g_want).max() < 10 * tol * gscale, (
            dt, np.abs(g_got - g_want).max(), gscale)


@pytest.mark.slow
def test_raft_train_step_loss_pinned_golden(rng):
    """Absolute b1 self-sup RAFT train-step loss pinned to an on-chip
    golden at the production recipe (bf16 corr+compute, dots remat,
    cell-sorted events, banded kernels) — the RAFT twin of
    test_onchip.py::test_train_step_loss_pinned_golden: a silent numerics
    regression in the window lookup, GRU scan, cvx upsample, or any CMax
    kernel on the 41-bin path moves this value.
    """
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.models.raft_spline import RAFTSplineConfig
    from motionpriorcmax_tpu.training.raft_spline import (
        RAFTTrainConfig, create_raft_state, raft_train_step)

    b, h, w = 1, 384, 512
    cfg = RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                           bezier_degree=10,
                           ev_target_indices=(8, 16, 24, 32, 40),
                           ev_levels=(1, 1, 1, 1, 4), iters=12,
                           corr_dtype="bfloat16", compute_dtype="bfloat16",
                           remat_policy="dots")
    loss_cfg = FocusLossConfig(
        image_shape=(h, w), num_bins=41, num_knn=32, smooth_weight=0.06,
        smooth_type="on_flow_to_next", polarity_aware_batching=False,
        knn_method="softmax", knn_block_size=512,
        interp_band_dynamic="per_group")
    r = np.random.default_rng(1234)          # OWN seed: golden stability
    m = 1 << 18
    t = r.uniform(0, 1, (b, m))
    bins = np.clip((t * 41).astype(np.int32), 0, 40).astype(np.float32)
    ev = np.stack([r.uniform(0, h - 1, (b, m)), r.uniform(0, w - 1, (b, m)),
                   t, r.integers(0, 2, (b, m)).astype(np.float32), bins,
                   np.ones((b, m))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), 41, 4) for e in ev]
    batch = {
        "ev_repr": jnp.asarray(r.normal(size=(b, cfg.nbins_total, h, w))
                               .astype(np.float32)),
        "events": jnp.asarray(np.stack([q[0] for q in pairs])),
        "lut_cell_ends": jnp.asarray(np.stack([q[1] for q in pairs])),
    }
    state = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                              jax.random.PRNGKey(0), (h, w))
    step = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                     loss_cfg=loss_cfg))
    _, logs = step(state, batch, jax.random.PRNGKey(1))
    loss = float(logs["train_losses/total"])
    GOLDEN = 0.5891357064247131  # v5e, 2026-08-21, round-5 recipe
    assert abs(loss - GOLDEN) < 1e-3 * max(abs(GOLDEN), 1.0), (loss, GOLDEN)
