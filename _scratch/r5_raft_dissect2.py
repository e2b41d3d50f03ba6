"""Round-5 RAFT b6 self-sup step dissection at the production recipe
(bf16 corr+compute, remat dots, cell-sorted events): where do the 628 ms go?

Pieces timed standalone (value_and_grad, element sync, iters>=6):
  full_step          the production train step (reference point)
  loss_fwd_bwd       the 41-bin CMax loss on a fixed params_up grid
  enc_ev_fwd_bwd     fnet_ev on the 6 stacked corr grids
  enc_ctx_fwd_bwd    cnet on the 41-bin context
  vol_lookup_fwd_bwd corr volume + pyramid + ONE window lookup (x12 in step)
  lookup_only        ONE window lookup fwd+bwd against a fixed pyramid
  lookup_bf16cot     same with a custom-VJP bf16-cotangent extraction
  update_fwd_bwd     ONE update block fwd+bwd
  adamw              optimizer apply on a zero-grad tree
  interp_static80    softmax interp at EVIMO2 geometry, static band 80
  interp_pergroup    same with device-computed per-(batch,bin) margins

One TPU process.  PYTHONPATH=/root/repo:/root/.axon_site
"""
import functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline import (RAFTSpline,
                                                        RAFTSplineConfig)
    from motionpriorcmax_tpu.models.raft_spline.corr import (
        build_corr_pyramid, compute_corr_volume, lookup_corr_pyramid)
    from motionpriorcmax_tpu.models.raft_spline.curves import (
        coords_grid, curve_flow_from_reference)
    from motionpriorcmax_tpu.models.raft_spline.extractor import BasicEncoder
    from motionpriorcmax_tpu.models.raft_spline.update import BasicUpdateBlock
    from motionpriorcmax_tpu.training.raft_spline import (
        RAFTTrainConfig, create_raft_state, raft_train_step)
    from motionpriorcmax_tpu.losses import (FocusLossConfig, focus_loss,
                                            get_reconstruction_times)
    from motionpriorcmax_tpu.ops.grids import tile_mask_positions
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.utils.profiling import device_timer

    b, h, w = 6, 384, 512
    rng = np.random.default_rng(0)

    cfg = RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                           bezier_degree=10,
                           ev_target_indices=(8, 16, 24, 32, 40),
                           ev_levels=(1, 1, 1, 1, 4), iters=12,
                           corr_dtype="bfloat16", compute_dtype="bfloat16",
                           remat_policy="dots")
    loss_cfg = FocusLossConfig(
        image_shape=(h, w), num_bins=41, num_knn=32, smooth_weight=0.06,
        smooth_type="on_flow_to_next", polarity_aware_batching=False,
        knn_method="softmax", knn_block_size=512)

    def emit(tag, ms, extra=None):
        rec = {"tag": tag, "ms": round(ms, 2)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

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

    # ---- 3. encoders fwd+bwd ----
    cdt = jnp.bfloat16
    enc_ev = BasicEncoder(output_dim=256, norm_fn="instance", dtype=cdt)
    grids = jnp.asarray(rng.normal(size=(6 * b, 25, h, w)).astype(np.float32))
    ev_vars = jax.jit(lambda r, x: enc_ev.init(r, x, False))(jax.random.PRNGKey(0), grids)

    def enc_ev_loss(p):
        out = enc_ev.apply({"params": p}, grids, False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(enc_ev_loss))
    dt, _ = device_timer(g, ev_vars["params"], iters=8, warmup=2)
    emit("enc_ev_fwd_bwd", dt * 1e3)

    enc_ctx = BasicEncoder(output_dim=256, norm_fn="batch", dtype=cdt)
    ctx_in = jnp.asarray(rng.normal(size=(b, 41, h, w)).astype(np.float32))
    ctx_vars = jax.jit(lambda r, x: enc_ctx.init(r, x, False))(jax.random.PRNGKey(0), ctx_in)

    def enc_ctx_loss(p):
        out = enc_ctx.apply({"params": p, "batch_stats": ctx_vars["batch_stats"]},
                            ctx_in, False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(enc_ctx_loss))
    dt, _ = device_timer(g, ctx_vars["params"], iters=8, warmup=2)
    emit("enc_ctx_fwd_bwd", dt * 1e3)

    # ---- 4. volume + pyramid + one lookup fwd+bwd ----
    h1, w1 = h // 8, w // 8
    fmap1 = jnp.asarray(rng.normal(size=(b, 256, h1, w1)).astype(np.float32))
    fmap2 = jnp.asarray(rng.normal(size=(5, b, 256, h1, w1)).astype(np.float32))
    coords0 = coords_grid(b, h1, w1)
    flows0 = jnp.asarray(rng.normal(scale=3.0, size=(5, b, 2, h1, w1))
                         .astype(np.float32))
    levels = list(cfg.ev_levels)

    def vol_lookup(f1, f2, fl):
        corr = compute_corr_volume(f1, f2).astype(jnp.bfloat16)
        pyr = build_corr_pyramid(corr, levels)
        feat = lookup_corr_pyramid(pyr, coords0[None] + fl, cfg.radius)
        return jnp.sum(feat.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(vol_lookup, argnums=(0, 1, 2)))
    dt, _ = device_timer(g, fmap1, fmap2, flows0, iters=8, warmup=2)
    emit("vol_lookup_fwd_bwd", dt * 1e3)

    # ---- 5. one lookup only, pyramid fixed (grad wrt corr + coords) ----
    corr0 = jnp.asarray(rng.normal(size=(5, b, h1 * w1, h1, w1))
                        .astype(np.float32)).astype(jnp.bfloat16)

    def lookup_only(corr, fl):
        pyr = build_corr_pyramid(corr, levels)
        feat = lookup_corr_pyramid(pyr, coords0[None] + fl, cfg.radius)
        return jnp.sum(feat.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(lookup_only, argnums=(0, 1)))
    dt, _ = device_timer(g, corr0, flows0, iters=8, warmup=2)
    emit("lookup_only", dt * 1e3)

    # ---- 6. update block fwd+bwd ----
    ub = BasicUpdateBlock(param_dim=2 * cfg.bezier_degree, hidden_dim=128,
                          motion_dim=128, dtype=cdt)
    c_corr = 81 * (5 + 3)
    net0 = jnp.asarray(rng.normal(size=(b, 128, h1, w1)).astype(np.float32))
    inp0 = jnp.asarray(rng.normal(size=(b, 128, h1, w1)).astype(np.float32))
    corr_tot = jnp.asarray(rng.normal(size=(b, c_corr, h1, w1))
                           .astype(np.float32))
    pz = jnp.asarray(rng.normal(size=(b, 2 * cfg.bezier_degree, h1, w1))
                     .astype(np.float32))
    ub_vars = jax.jit(lambda r, *a: ub.init(r, *a))(jax.random.PRNGKey(0), net0, inp0, corr_tot, pz)

    def ub_loss(p):
        n2, mask, delta = ub.apply({"params": p}, net0, inp0, corr_tot, pz)
        return (jnp.sum(n2.astype(jnp.float32) ** 2)
                + jnp.sum(mask.astype(jnp.float32) ** 2)
                + jnp.sum(delta.astype(jnp.float32) ** 2))

    g = jax.jit(jax.value_and_grad(ub_loss))
    dt, _ = device_timer(g, ub_vars["params"], iters=8, warmup=2)
    emit("update_fwd_bwd", dt * 1e3)

    # ---- 7. AdamW on zero grads ----
    zgrads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    opt = jax.jit(lambda s: s.apply_gradients(grads=zgrads))
    dt, _ = device_timer(lambda s: opt(s).step, state, iters=8, warmup=2)
    emit("adamw", dt * 1e3)


if __name__ == "__main__":
    main()


if __name__ == "__main__":
    main()
