"""On-device voxelization cost in the REAL training path: bench.py feeds a
precomputed 'voxel', but the DSEC CLI voxelizes inside the jitted step from
raw events (XLA scatter-add).  Time the full train step with and without
'voxel' in the batch at b8 x 1M, plus the voxelize alone."""
import functools, json, time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (TrajectoryNetConfig,
                                              create_train_state, train_step)
    from motionpriorcmax_tpu.training.trajectory_net import (
        voxelize_batch_on_device)
    from motionpriorcmax_tpu.utils.profiling import device_timer

    h, w, nbins, b, m = 480, 640, 15, 8, 1 << 20
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins, num_basis=1,
                              patch_size=4, basis_type="polynomial",
                              compute_dtype="bfloat16")
    loss_cfg = FocusLossConfig(
        image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
        smooth_weight=0.003, lut_superpixel_size=4, focus_loss_norm="l1",
        dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
        polarity_aware_batching=False, interpolation_scheme="mean",
        knn_block_size=512, knn_method="softmax")
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    ev = np.stack([y, x, t, p, bi, np.ones((b, m))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, 4) for e in ev]
    events = jnp.asarray(np.stack([q[0] for q in pairs]))
    ends = jnp.asarray(np.stack([q[1] for q in pairs]))
    state0 = create_train_state(cfg, jax.random.PRNGKey(0))

    vox = jax.jit(functools.partial(voxelize_batch_on_device, cfg))
    dt, _ = device_timer(lambda e: jnp.sum(vox(e)), events, iters=3, warmup=1)
    print(json.dumps({"variant": "voxelize_only_ms", "ms": round(dt * 1e3, 1)}),
          flush=True)

    for with_voxel in (True, False):
        batch = {"events": events, "lut_cell_ends": ends}
        if with_voxel:
            batch["voxel"] = vox(events)
        step = jax.jit(functools.partial(train_step, cfg=cfg,
                                         loss_cfg=loss_cfg),
                       donate_argnums=(0,))
        state = jax.tree.map(jnp.copy, state0)
        state, logs = step(state, batch, jax.random.PRNGKey(1))
        float(logs["train_losses/total"])
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            state, logs = step(state, batch, jax.random.PRNGKey(i))
        float(logs["train_losses/total"])
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": ("step_precomputed_voxel" if with_voxel
                                      else "step_ondevice_voxelize"),
                          "ms_per_step": round(dt / iters * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
