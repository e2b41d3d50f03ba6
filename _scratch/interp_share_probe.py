"""Component shares of the 304 ms b8 flow step: interp fwd / fwd+bwd with
production banding (per-bin, vpu cross), UNet bf16 fwd+bwd. One TPU process."""
import dataclasses, functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.losses.focus import interpolate_flow
    from motionpriorcmax_tpu.ops.grids import tile_mask_positions
    from motionpriorcmax_tpu.utils.profiling import device_timer

    h, w, nbins, b = 480, 640, 15, 8
    cfg = FocusLossConfig(
        image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
        smooth_weight=0.003, lut_superpixel_size=4, focus_loss_norm="l1",
        dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
        polarity_aware_batching=False, interpolation_scheme="mean",
        knn_block_size=512, knn_method="softmax", interp_band_per_bin=True)

    rng = np.random.default_rng(0)
    pos = tile_mask_positions((h, w), 4).astype(np.float32)   # [N, 2]
    n = pos.shape[0]
    # per-bin displacements bounded by 60 * t_mid (polynomial k=1 shape)
    t_mid = ((np.arange(nbins) + 0.5) / nbins).astype(np.float32)
    disp = (rng.uniform(-1, 1, (b, nbins, n, 2)).astype(np.float32)
            * (60.0 * t_mid)[None, :, None, None])
    traj_mid = jnp.asarray(pos[None, None] + disp)            # [B, nbins, N, 2]
    traj_ref = jnp.asarray(
        pos[None, None] + rng.uniform(-30, 30, (b, 1, n, 2)).astype(np.float32))

    fwd = jax.jit(lambda tr, tm: interpolate_flow(cfg, tr, tm)[0])
    dt, _ = device_timer(fwd, traj_ref, traj_mid, iters=5, warmup=1,
                         scalarized=True)
    print(json.dumps({"tag": "interp_fwd_ms", "ms": round(dt * 1e3, 1)}),
          flush=True)

    g = jax.jit(jax.grad(
        lambda tr, tm: jnp.sum(interpolate_flow(cfg, tr, tm)[0] ** 2),
        argnums=(0, 1)))
    dt, _ = device_timer(g, traj_ref, traj_mid, iters=5, warmup=1,
                         scalarized=True)
    print(json.dumps({"tag": "interp_fwd_bwd_ms", "ms": round(dt * 1e3, 1)}),
          flush=True)

    # UNet bf16 fwd+bwd at b8
    from motionpriorcmax_tpu.training import (TrajectoryNetConfig,
                                              create_train_state,
                                              TrajectoryModel)
    tcfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins,
                               num_basis=1, patch_size=4,
                               basis_type="polynomial",
                               compute_dtype="bfloat16")
    state = create_train_state(tcfg, jax.random.PRNGKey(0))
    model = TrajectoryModel(tcfg)
    voxel = jnp.asarray(rng.normal(size=(b, nbins, h, w)).astype(np.float32))

    def unet_loss(params, v):
        out, _ = model.apply({"params": params,
                              "batch_stats": state.batch_stats}, v,
                             train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gu = jax.jit(jax.grad(unet_loss))
    dt, _ = device_timer(gu, state.params, voxel, iters=5, warmup=1,
                         scalarized=True)
    print(json.dumps({"tag": "unet_fwd_bwd_ms", "ms": round(dt * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
