"""Round-5: conv1-s2d at step level + encoder standalone re-measure.

  enc_ev_s2d / enc_ctx_s2d   standalone fwd+bwd (vs 89.7 / 61.3 native)
  step_s2d                   full b6 step: einsum lookup + per_group band +
                             s2d conv1 (vs 572.4 without s2d)

PYTHONPATH=/root/repo:/root/.axon_site
"""
import dataclasses, functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline import RAFTSplineConfig
    from motionpriorcmax_tpu.models.raft_spline.extractor import BasicEncoder
    from motionpriorcmax_tpu.training.raft_spline import (
        RAFTTrainConfig, create_raft_state, raft_train_step)
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.utils.profiling import device_timer

    b, h, w = 6, 384, 512
    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16

    def emit(tag, ms, extra=None):
        rec = {"tag": tag, "ms": round(ms, 1)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    # Standalone encoders (s2d auto-engages on the TPU backend).
    enc_ev = BasicEncoder(output_dim=256, norm_fn="instance", dtype=cdt)
    grids = jnp.asarray(rng.normal(size=(6 * b, 25, h, w)).astype(np.float32))
    ev_vars = jax.jit(lambda r, x: enc_ev.init(r, x, False))(
        jax.random.PRNGKey(0), grids)

    def enc_ev_loss(p, x):
        out = enc_ev.apply({"params": p}, x, False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(enc_ev_loss))
    dt, _ = device_timer(g, ev_vars["params"], grids, iters=10, warmup=2)
    emit("enc_ev_s2d", dt * 1e3)

    enc_ctx = BasicEncoder(output_dim=256, norm_fn="batch", dtype=cdt)
    ctx_in = jnp.asarray(rng.normal(size=(b, 41, h, w)).astype(np.float32))
    ctx_vars = jax.jit(lambda r, x: enc_ctx.init(r, x, False))(
        jax.random.PRNGKey(0), ctx_in)

    def enc_ctx_loss(p, bs, x):
        out = enc_ctx.apply({"params": p, "batch_stats": bs}, x, False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(enc_ctx_loss))
    dt, _ = device_timer(g, ctx_vars["params"], ctx_vars["batch_stats"],
                         ctx_in, iters=10, warmup=2)
    emit("enc_ctx_s2d", dt * 1e3)

    # Full step.
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
    voxel = jnp.asarray(rng.normal(size=(b, cfg.nbins_total, h, w))
                        .astype(np.float32))
    m_ev = 1 << 19
    t = rng.uniform(0, 1, (b, m_ev))
    bins = np.clip((t * 41).astype(np.int32), 0, 40).astype(np.float32)
    events_np = np.stack([
        rng.uniform(0, h - 1, (b, m_ev)), rng.uniform(0, w - 1, (b, m_ev)),
        t, rng.integers(0, 2, (b, m_ev)).astype(np.float32), bins,
        np.ones((b, m_ev))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), 41, 4) for e in events_np]
    events = jnp.asarray(np.stack([p[0] for p in pairs]))
    cell_ends = jnp.asarray(np.stack([p[1] for p in pairs]))
    tbatch = {"ev_repr": voxel, "events": events, "lut_cell_ends": cell_ends}
    state = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                              jax.random.PRNGKey(0), (h, w))
    tstep = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                      loss_cfg=loss_cfg))

    def run(s):
        s2, logs = tstep(s, tbatch, jax.random.PRNGKey(3))
        return logs["train_losses/total"]

    dt, out = device_timer(run, state, iters=10, warmup=2)
    emit("step_s2d", dt * 1e3, {"loss": float(np.asarray(out))})


if __name__ == "__main__":
    main()
