"""On-chip numerics regressions (see conftest for how/why to run)."""

import functools

import numpy as np
import pytest


def test_interp_vpu_accurate_on_chip_vs_f64(rng):
    """The vpu weight build must track a float64 host reference on REAL
    hardware at image-scale coordinates.

    History: the single-pass DEFAULT mxu dot was ~0.75 max abs output error
    on chip while interpret mode was exact (Mosaic result rounding) — this
    is the regression test that would have caught it.  The exact-mxu
    (precision=HIGHEST) build is NOT a valid oracle here: its
    q.q + d.d - 2q.d expansion carries a ~5e-3 f32 cancellation floor at
    640 px coordinates; f64 host math is the ground truth.
    """
    import jax.numpy as jnp

    from motionpriorcmax_tpu.ops.pallas.softmax_interp import (
        softmax_interp_pallas)

    g, q, n, c = 4, 1200, 2048, 4
    queries = rng.uniform(0, 640, (q, 2)).astype(np.float32)
    db = rng.uniform(0, 640, (g, n, 2)).astype(np.float32)
    vals = rng.normal(size=(g, n, c)).astype(np.float32)

    got = np.asarray(softmax_interp_pallas(
        jnp.asarray(queries), jnp.asarray(db), jnp.asarray(vals), 25.0,
        False, (0.0, 0.0, 0.0), jnp.float32, "vpu"))

    q64, d64, v64 = (a.astype(np.float64) for a in (queries, db, vals))
    d2 = (((q64[None, :, None, :] - d64[:, None, :, :]) ** 2).sum(-1))
    w = np.exp(-d2 / 25.0)                          # [G, Q, N]
    want = (w @ v64) / w.sum(-1, keepdims=True)
    err = np.abs(got - want).max()
    # Designed noise floor: the values/weights accumulation matmul runs at
    # DEFAULT MXU precision (bf16 operand truncation, ~0.4% relative on the
    # normalized result — measured 8.7e-3 max on chip with N(0,1) values;
    # module docstring).  The bug class this guards against is px-SCALE
    # (0.75 max abs), 30x above this gate.
    assert err < 2.5e-2, err


def test_lut_gather_compiles_at_evimo2_scale(rng):
    """The banded gather must compile AND be exact at 41-bin LUT heights.

    History: the full-height fallback allocated [R_full, BE] VMEM
    temporaries — 16 MB at EVIMO2's 96 * 41 = 3936 rows — and failed
    remote compilation with a scoped-vmem OOM (latent until the RAFT
    bench first fed cell-sorted events).  The fallback is now a
    band-chunked loop; this pins both the compile and the math on chip,
    including deliberately scattered (fallback-forcing) sub-blocks.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.ops.pallas.lut_gather import lut_gather_sorted

    b, r, wq, c, m = 2, 96 * 41, 128, 2, 1 << 16
    lut = rng.normal(size=(b, r, wq, c)).astype(np.float32)
    # Half the stream sorted (banded path), half scattered (fallback path).
    rows_sorted = np.sort(rng.integers(0, r, (b, m // 2)), axis=1)
    rows_scattered = rng.integers(0, r, (b, m // 2))
    rows = np.concatenate([rows_sorted, rows_scattered], 1).astype(np.int32)
    cols = rng.integers(0, wq, (b, m)).astype(np.int32)

    g = jax.jit(functools.partial(lut_gather_sorted, band_rows=41 * 2 + 2))
    got = np.asarray(g(jnp.asarray(lut), jnp.asarray(rows),
                       jnp.asarray(cols)))
    want = np.stack([lut[i, rows[i], cols[i]] for i in range(b)])
    # DEFAULT-precision one-hot dot: ~0.4% relative of the value scale.
    assert np.abs(got - want).max() < 2.5e-2


@pytest.mark.slow
def test_train_step_loss_invariant_to_interp_cross(rng):
    """Full b2 train-step loss must agree between the exact-mxu and vpu
    interp builds on chip (the step exercises every Pallas kernel: banded
    vote, lut gather, interp, stencils)."""
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (TrajectoryNetConfig,
                                              create_train_state, train_step)

    h, w, nbins, b, m = 480, 640, 15, 2, 1 << 18
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins,
                              num_basis=1, patch_size=4,
                              basis_type="polynomial",
                              compute_dtype="bfloat16")
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    events = np.stack([y, x, t, p, bi, np.ones((b, m))],
                      -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, 4) for e in events]
    batch = {
        "voxel": jnp.asarray(rng.normal(size=(b, nbins, h, w))
                             .astype(np.float32)),
        "events": jnp.asarray(np.stack([q[0] for q in pairs])),
        "lut_cell_ends": jnp.asarray(np.stack([q[1] for q in pairs])),
    }
    state0 = create_train_state(cfg, jax.random.PRNGKey(0))

    losses = {}
    for ci in ("mxu", "vpu"):
        loss_cfg = FocusLossConfig(
            image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
            smooth_weight=0.003, lut_superpixel_size=4,
            focus_loss_norm="l1", dist_norm="l2", scale_iwe_by_dt=True,
            mask_image_border=True, polarity_aware_batching=False,
            interpolation_scheme="mean", knn_block_size=512,
            knn_method="softmax", interp_cross=ci)
        step = jax.jit(functools.partial(train_step, cfg=cfg,
                                         loss_cfg=loss_cfg))
        _, logs = step(jax.tree.map(jnp.copy, state0), batch,
                       jax.random.PRNGKey(1))
        losses[ci] = float(logs["train_losses/total"])
    # Measured agreement is ~6e-7 (b8) / passes at b2; the gate leaves
    # ~1000x headroom for seed/chip drift of the designed DEFAULT-precision
    # matmul noise while still catching the px-scale weight-error bug class
    # (which moves the loss in its leading digits).
    assert abs(losses["vpu"] - losses["mxu"]) < 1e-3, losses


def test_banded_vote_grad_matches_scatter_on_chip(rng):
    """Banded sorted-vote forward AND coords-gradient vs the exact XLA
    scatter vote at b2 x 256k on REAL hardware.

    History: the banded vote's grad path had its own bug class (round-2
    per-sub-block pl.when fix, ROADMAP 3d), and a Mosaic regression here
    would otherwise surface only as a silently different loss.  Tolerance
    covers the designed bf16 tap-tile truncation (~0.4% relative of the
    local vote magnitude); the guarded bug class is px-scale.
    """
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops import events as ev_ops
    from motionpriorcmax_tpu.ops.pallas.iwe_vote import iwe_vote_pallas_sorted

    h, w, nbins, b, m, s = 480, 640, 15, 2, 1 << 18, 4
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    ev = np.stack([y, x, t, p, bi, np.ones((b, m))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, s) for e in ev]
    evj = jnp.asarray(np.stack([q[0] for q in pairs]))
    coords = evj[..., :2] + jnp.asarray(
        rng.normal(scale=5.0, size=(b, m, 2)).astype(np.float32))
    wgt = evj[..., 5]

    import jax as _j

    def scalar(vote_fn):
        def f(c):
            out = vote_fn(c)
            return jnp.sum(out ** 2), out
        return _j.jit(_j.value_and_grad(f, has_aux=True))

    (_, out_p), g_p = scalar(
        lambda c: iwe_vote_pallas_sorted(c, wgt, h, w, 144))(coords)
    (_, out_s), g_s = scalar(
        lambda c: ev_ops.iwe_bilinear_vote_batch(
            c, wgt, height=h, width=w, scatter_impl="direct"))(coords)
    out_p, out_s = np.asarray(out_p), np.asarray(out_s)
    g_p, g_s = np.asarray(g_p), np.asarray(g_s)

    vote_scale = np.abs(out_s).max()
    assert np.abs(out_p - out_s).max() < 0.01 * vote_scale, (
        np.abs(out_p - out_s).max(), vote_scale)
    grad_scale = np.abs(g_s).max()
    assert np.abs(g_p - g_s).max() < 0.02 * grad_scale, (
        np.abs(g_p - g_s).max(), grad_scale)


@pytest.mark.slow
def test_train_step_loss_pinned_golden(rng):
    """Absolute b2 train-step loss pinned to an on-chip golden.

    Any silent numerics regression in ANY kernel on the production path
    (banded vote, lut gather, vpu interp, stencils, bf16 UNet) moves this
    value.  Golden recorded on v5e 2026-08-20 (round 4); the gate covers
    documented DEFAULT-precision matmul noise plus seed-stable drift
    (measured re-run agreement ~1e-6).
    """
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (TrajectoryNetConfig,
                                              create_train_state, train_step)

    h, w, nbins, b, m = 480, 640, 15, 2, 1 << 18
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins,
                              num_basis=1, patch_size=4,
                              basis_type="polynomial",
                              compute_dtype="bfloat16")
    r = np.random.default_rng(1234)          # OWN seed: golden stability
    y = r.uniform(0, h - 1, (b, m)); x = r.uniform(0, w - 1, (b, m))
    t = r.uniform(0, 1, (b, m))
    p = r.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    events = np.stack([y, x, t, p, bi, np.ones((b, m))],
                      -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, 4) for e in events]
    batch = {
        "voxel": jnp.asarray(r.normal(size=(b, nbins, h, w))
                             .astype(np.float32)),
        "events": jnp.asarray(np.stack([q[0] for q in pairs])),
        "lut_cell_ends": jnp.asarray(np.stack([q[1] for q in pairs])),
    }
    loss_cfg = FocusLossConfig(
        image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
        smooth_weight=0.003, lut_superpixel_size=4, focus_loss_norm="l1",
        dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
        polarity_aware_batching=False, interpolation_scheme="mean",
        knn_block_size=512, knn_method="softmax")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg))
    _, logs = step(state, batch, jax.random.PRNGKey(1))
    loss = float(logs["train_losses/total"])
    GOLDEN = 0.6620147228240967  # v5e, 2026-08-20, round-4 defaults
    assert abs(loss - GOLDEN) < 1e-3 * max(abs(GOLDEN), 1.0), (loss, GOLDEN)


@pytest.mark.slow
def test_selfsup_learning_on_chip_production_kernels(rng):
    """Self-sup UNet training RECOVERS the flow on real hardware with every
    production kernel engaged (softmax interp vpu-cross, banded Pallas vote,
    Pallas LUT gather, sorted_pallas segsum backward via cell-sorted
    events).  The CPU twin (tests/test_unet_selfsup_learning.py) runs the
    exact-KNN XLA paths — this is the end-to-end GRADIENT check for the
    kernels themselves: a wrong-but-finite kernel gradient shows up as
    failure to converge, which per-step numeric gates cannot see.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (TrajectoryNetConfig,
                                              create_train_state, train_step)
    from motionpriorcmax_tpu.training.trajectory_net import (
        TrajectoryModel, _flow_from_coeffs, voxelize_batch_on_device)
    from tests.test_focus_loss import H, W, NBINS, make_translating_events

    true_flow = (5.0, 7.0)
    ev = make_translating_events(rng, true_flow, n_lines=10, m=2048)
    cfg = TrajectoryNetConfig(image_shape=(H, W), num_bins=NBINS,
                              num_basis=1, patch_size=4, lr=1e-3)
    loss_cfg = FocusLossConfig(image_shape=(H, W), num_bins=NBINS,
                               num_knn=8, smooth_weight=0.003,
                               polarity_aware_batching=False,
                               knn_block_size=64, knn_method="softmax")
    ev_sorted, ends = lut_cell_sort(np.asarray(ev[0]), (H, W), NBINS,
                                    loss_cfg.lut_superpixel_size)
    batch = {"events": jnp.asarray(ev_sorted[None]),
             "lut_cell_ends": jnp.asarray(ends[None])}
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg))

    key = jax.random.PRNGKey(1)
    for _i in range(120):
        key, sub = jax.random.split(key)
        state, logs = step(state, batch, sub)
    assert np.isfinite(float(logs["train_losses/total"]))

    model = TrajectoryModel(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    voxel = voxelize_batch_on_device(cfg, batch["events"])
    coeff = model.apply(variables, voxel, train=False)

    def basis_fn(t):
        return model.apply({"params": state.params}, t,
                           method=TrajectoryModel.basis)

    flow = np.asarray(_flow_from_coeffs(cfg, coeff, basis_fn))[0]
    est = np.array([flow[0].mean(), flow[1].mean()])
    err = np.linalg.norm(est - np.asarray(true_flow))
    assert err < 2.5, f"recovered {est} vs true {true_flow} (err {err:.2f})"


def test_voxel_vote_pallas_matches_scatter_on_chip(rng):
    """Banded Pallas voxel vote vs the exact XLA scatter voxelizer at
    b2 x 256k on REAL hardware (interpret mode hid the round-2 Mosaic dot
    bug — every new kernel gets an on-chip numerics gate).  Tolerance is
    the designed bf16 tap-tile truncation (~0.4% of the vote magnitude)."""
    import jax
    import jax.numpy as jnp

    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops.events import voxel_grid_from_events
    from motionpriorcmax_tpu.ops.pallas.voxel_vote import (
        voxel_vote_pallas_sorted)

    h, w, nbins, b, m, s = 480, 640, 15, 2, 1 << 18, 4
    y = rng.uniform(-1, h, (b, m)).astype(np.float32)
    x = rng.uniform(-1, w, (b, m)).astype(np.float32)
    t = rng.uniform(0, 1, (b, m)).astype(np.float32)
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    valid = (rng.uniform(size=(b, m)) > 0.05).astype(np.float32)
    ev = np.stack([y, x, t, p, bi, valid], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, s) for e in ev]
    evj = jnp.asarray(np.stack([q[0] for q in pairs]))

    got = np.asarray(jax.jit(functools.partial(
        voxel_vote_pallas_sorted, num_bins=nbins, height=h, width=w,
        cell_size=s))(evj))
    evs = np.asarray(evj)
    want = np.stack([np.asarray(voxel_grid_from_events(
        jnp.asarray(evs[i, :, 0]), jnp.asarray(evs[i, :, 1]),
        jnp.asarray(evs[i, :, 2] * (nbins - 1)), jnp.asarray(evs[i, :, 3]),
        jnp.asarray(evs[i, :, 5]), num_bins=nbins, height=h, width=w))
        for i in range(b)])
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.01 * scale + 1e-3, (
        np.abs(got - want).max(), scale)
