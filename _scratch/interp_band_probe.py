"""Step-level interp_band_px re-tune at the round-4 KB=4 / vote-band-96 point."""
import functools, json, time
import numpy as np


def main():
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

    for band in (64, 80):
        loss_cfg = FocusLossConfig(
            image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
            smooth_weight=0.003, lut_superpixel_size=4, focus_loss_norm="l1",
            dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
            polarity_aware_batching=False, interpolation_scheme="mean",
            knn_block_size=512, knn_method="softmax", interp_band_px=band)
        step = jax.jit(functools.partial(train_step, cfg=cfg,
                                         loss_cfg=loss_cfg),
                       donate_argnums=(0,))
        state = jax.tree.map(jnp.copy, state0)
        state, logs = step(state, bd, jax.random.PRNGKey(1))
        l0 = float(logs["train_losses/total"])
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            state, logs = step(state, bd, jax.random.PRNGKey(i))
        float(logs["train_losses/total"])
        dt = time.perf_counter() - t0
        print(json.dumps({"band": band,
                          "ms_per_step": round(dt / iters * 1000, 1),
                          "events_per_s_M": round(batch * m * iters / dt / 1e6, 2),
                          "loss0": l0}), flush=True)


if __name__ == "__main__":
    main()
