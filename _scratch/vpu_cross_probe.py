"""On-chip probe: (1) vpu-cross kernel accuracy at image scale,
(2) b8 x 1M train-step A/B mxu vs vpu, (3) dist2-as-result split-dot
diagnostic (is a single-pass MXU path feasible?)."""
import dataclasses, functools, json, time
import numpy as np


def accuracy():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.ops.pallas.softmax_interp import (
        softmax_interp_pallas, softmax_interp_reference)
    rng = np.random.default_rng(0)
    G, Q, N, C = 4, 1200, 2048, 4
    q = rng.uniform(0, 640, (Q, 2)).astype(np.float32)
    db = rng.uniform(0, 640, (G, N, 2)).astype(np.float32)
    vals = rng.normal(size=(G, N, C)).astype(np.float32)
    ref = np.asarray(jax.jit(softmax_interp_reference, static_argnums=3)(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(vals), 25.0))
    for ci in ("vpu", "mxu"):
        out = np.asarray(softmax_interp_pallas(
            jnp.asarray(q), jnp.asarray(db), jnp.asarray(vals), 25.0,
            False, (0.0, 0.0, 0.0), jnp.float32, ci))
        print(f"acc {ci}: maxerr {np.abs(out - ref).max():.3e}", flush=True)


def dist2_diag():
    """Single MXU pass whose RESULT is dist^2: rows built so
    sum_k qrow_k * drow_k == ||q-d||^2, every row bf16-representable.
    If the on-chip error is ~0.4% RELATIVE to dist^2 (not absolute at
    coordinate-norm scale), a future single-pass path exists."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    BQ, BN = 256, 256
    rng = np.random.default_rng(0)
    q = rng.uniform(0, 640, (2, BQ)).astype(np.float32)
    d = rng.uniform(0, 640, (2, BN)).astype(np.float32)

    def hml(v):  # 3-way bf16-exact split
        hi = v.astype(jnp.bfloat16).astype(jnp.float32)
        r = v - hi
        mid = r.astype(jnp.bfloat16).astype(jnp.float32)
        lo = (r - mid).astype(jnp.bfloat16).astype(jnp.float32)
        return hi, mid, lo

    def build(qt, dt):
        # dist2 = qq + dd - 2 qy dy - 2 qx dx, with each product term
        # split so both factors are bf16-exact.  qq/dd rows split 2-way
        # (values ~4e5: hi+lo bf16 split leaves ~2^-2 residual -> fine
        # RELATIVE to dist2? no — absolute; keep 3-way).
        qq = qt[0] * qt[0] + qt[1] * qt[1]
        dd = dt[0] * dt[0] + dt[1] * dt[1]
        qqh, qqm, qql = hml(qq); ddh, ddm, ddl = hml(dd)
        qyh, qym, qyl = hml(qt[0]); qxh, qxm, qxl = hml(qt[1])
        dyh, dym, dyl = hml(dt[0]); dxh, dxm, dxl = hml(dt[1])
        one = jnp.ones_like(qq); oned = jnp.ones_like(dd)
        qrows, drows = [], []
        # qq terms (q-side data, d-side ones)
        for r in (qqh, qqm, qql):
            qrows.append(r); drows.append(oned)
        # dd terms
        for r in (ddh, ddm, ddl):
            qrows.append(one); drows.append(r)
        # cross terms: -2 * (qy dy + qx dx), 8 combos each coord (skip lo*lo)
        for (qh_, qm_, ql_, dh_, dm_, dl_) in (
                (qyh, qym, qyl, dyh, dym, dyl),
                (qxh, qxm, qxl, dxh, dxm, dxl)):
            for a, bb in ((qh_, dh_), (qh_, dm_), (qh_, dl_),
                          (qm_, dh_), (qm_, dm_), (qm_, dl_),
                          (ql_, dh_), (ql_, dm_)):
                qrows.append(-2.0 * a); drows.append(bb)
        return jnp.stack(qrows), jnp.stack(drows)  # [K, BQ], [K, BN]

    qk, dk = jax.jit(build)(q, d)
    qk = np.asarray(qk); dk = np.asarray(dk)
    K = qk.shape[0]
    print(f"dist2 rows K={K}", flush=True)
    q64, d64 = q.astype(np.float64), d.astype(np.float64)
    want = ((q64.T[:, None, :] - d64.T[None, :, :]) ** 2).sum(-1)  # [BQ,BN]

    def kern(q_ref, d_ref, o_ref):
        qt = jnp.transpose(q_ref[:, :])  # [BQ, K]
        o_ref[:, :] = jax.lax.dot_general(
            qt, d_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    f = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((BQ, BN), jnp.float32))
    out = np.asarray(jax.jit(f)(qk, dk))
    err = np.abs(out - want)
    rel = err / np.maximum(np.abs(want), 1.0)
    # what matters: error where dist2 < 30*temp (=750)
    near = want < 750.0
    print(f"dist2 diag: maxabs {err.max():.3e} maxrel {rel.max():.3e} "
          f"near-maxabs {err[near].max() if near.any() else float('nan'):.3e}",
          flush=True)


def step_ab():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (
        TrajectoryNetConfig, create_train_state, train_step)
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    h, w, nbins = 480, 640, 15
    batch, m = 8, 1 << 20
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins, num_basis=1,
                              patch_size=4, basis_type="polynomial",
                              compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (batch, m)); x = rng.uniform(0, w - 1, (batch, m))
    t = rng.uniform(0, 1, (batch, m))
    p = rng.integers(0, 2, (batch, m)).astype(np.float32)
    b = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    events = np.stack([y, x, t, p, b, np.ones((batch, m))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, 4) for e in events]
    events = np.stack([q[0] for q in pairs])
    cell_ends = np.stack([q[1] for q in pairs])
    voxel = rng.normal(size=(batch, nbins, h, w)).astype(np.float32)
    bd = {"voxel": jax.device_put(voxel), "events": jax.device_put(events),
          "lut_cell_ends": jax.device_put(cell_ends)}
    state0 = create_train_state(cfg, jax.random.PRNGKey(0))

    for ci in ("mxu", "vpu"):
        loss_cfg = FocusLossConfig(
            image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
            smooth_weight=0.003, lut_superpixel_size=4, focus_loss_norm="l1",
            dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
            polarity_aware_batching=False, interpolation_scheme="mean",
            knn_block_size=512, knn_method="softmax", interp_cross=ci)
        step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg),
                       donate_argnums=(0,))
        state = jax.tree.map(jnp.copy, state0)
        state, logs = step(state, bd, jax.random.PRNGKey(1))
        l0 = float(logs["train_losses/total"])
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            state, logs = step(state, bd, jax.random.PRNGKey(i))
        lN = float(logs["train_losses/total"])
        dt = time.perf_counter() - t0
        print(json.dumps({"cross": ci, "ms_per_step": round(dt / iters * 1000, 1),
                          "events_per_s_M": round(batch * m * iters / dt / 1e6, 2),
                          "loss0": l0, "lossN": lN}), flush=True)


if __name__ == "__main__":
    accuracy()
    dist2_diag()
    step_ab()
