"""Round-5: corr-window Pallas kernel at step level (b6 production recipe).

  lookup_kernel     ONE lookup fwd+bwd with the VPU kernel (vs 26.5 einsum)
  step_dots         full step, kernel auto, remat policy 'dots'
  step_dots_window  full step, policy 'dots_window' (windows saved)
  step_dw_pergroup  + interp_band_dynamic='per_group'

PYTHONPATH=/root/repo:/root/.axon_site
"""
import dataclasses, functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline import RAFTSplineConfig
    from motionpriorcmax_tpu.models.raft_spline.corr import (
        build_corr_pyramid, lookup_corr_pyramid)
    from motionpriorcmax_tpu.models.raft_spline.curves import coords_grid
    from motionpriorcmax_tpu.training.raft_spline import (
        RAFTTrainConfig, create_raft_state, raft_train_step)
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.utils.profiling import device_timer

    b, h, w = 6, 384, 512
    h1, w1 = h // 8, w // 8
    rng = np.random.default_rng(0)

    def emit(tag, ms, extra=None):
        rec = {"tag": tag, "ms": round(ms, 1)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    # ---- standalone lookup with the kernel ----
    levels = [1, 1, 1, 1, 4]
    corr0 = jnp.asarray(rng.normal(size=(5, b, h1 * w1, h1, w1))
                        .astype(np.float32)).astype(jnp.bfloat16)
    coords0 = coords_grid(b, h1, w1)
    flows0 = jnp.asarray(rng.normal(scale=3.0, size=(5, b, 2, h1, w1))
                         .astype(np.float32))

    def lookup_loss(corr, fl):
        pyr = build_corr_pyramid(corr, levels)
        feat = lookup_corr_pyramid(pyr, coords0[None] + fl, 4, impl="pallas")
        return jnp.sum(feat.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(lookup_loss, argnums=(0, 1)))
    dt, _ = device_timer(g, corr0, flows0, iters=10, warmup=2)
    emit("lookup_kernel", dt * 1e3)

    g = jax.jit(lookup_loss)
    dt, _ = device_timer(g, corr0, flows0, iters=10, warmup=2)
    emit("lookup_kernel_fwdonly", dt * 1e3)

    # ---- full steps ----
    def make_cfg(policy):
        return RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                                bezier_degree=10,
                                ev_target_indices=(8, 16, 24, 32, 40),
                                ev_levels=(1, 1, 1, 1, 4), iters=12,
                                corr_dtype="bfloat16",
                                compute_dtype="bfloat16",
                                remat_policy=policy)

    base_loss = FocusLossConfig(
        image_shape=(h, w), num_bins=41, num_knn=32, smooth_weight=0.06,
        smooth_type="on_flow_to_next", polarity_aware_batching=False,
        knn_method="softmax", knn_block_size=512)

    cfg = make_cfg("dots")
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

    def run_variant(tag, cfg_v, loss_cfg):
        tstep = jax.jit(functools.partial(raft_train_step, cfg=cfg_v,
                                          loss_cfg=loss_cfg))

        def run(s):
            s2, logs = tstep(s, tbatch, jax.random.PRNGKey(3))
            return logs["train_losses/total"]

        dt, out = device_timer(run, state, iters=8, warmup=2)
        emit(tag, dt * 1e3, {"loss": float(np.asarray(out))})

    run_variant("step_dots", make_cfg("dots"), base_loss)
    run_variant("step_dots_window", make_cfg("dots_window"), base_loss)
    run_variant("step_dw_pergroup", make_cfg("dots_window"),
                dataclasses.replace(base_loss,
                                    interp_band_dynamic="per_group"))


if __name__ == "__main__":
    main()
