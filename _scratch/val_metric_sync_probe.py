"""Validation metric accumulation: per-batch float(v) host syncs vs the
round-4 MetricBank.update_device (one transfer per epoch).  Times a 16-batch
eval epoch at DSEC b4 scale on the real chip (the tunneled-TPU transfer tax
is the motivation — VERDICT r3 weak #5 / next #8)."""
import functools, json, time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.metrics import MetricBank
    from motionpriorcmax_tpu.training import (TrajectoryNetConfig,
                                              create_train_state, eval_step)

    h, w, nbins, b, m = 480, 640, 15, 4, 1 << 18
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins, num_basis=1,
                              patch_size=4, basis_type="polynomial",
                              compute_dtype="bfloat16")
    loss_cfg = FocusLossConfig(
        image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
        smooth_weight=0.003, lut_superpixel_size=4, focus_loss_norm="l1",
        polarity_aware_batching=False, interpolation_scheme="mean",
        knn_block_size=512, knn_method="softmax")
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    batch = {
        "voxel": jnp.asarray(rng.normal(size=(b, nbins, h, w))
                             .astype(np.float32)),
        "events": jnp.asarray(np.stack(
            [y, x, t, p, bi, np.ones((b, m))], -1).astype(np.float32)),
        "gt_flow": jnp.asarray(rng.normal(size=(b, 2, h, w))
                               .astype(np.float32)),
    }
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(functools.partial(eval_step, cfg=cfg, loss_cfg=loss_cfg,
                                     num_pos_events=-1))
    key = jax.random.PRNGKey(1)
    logs = step(state, batch, key)          # compile
    _ = {k: float(v) for k, v in logs.items()}

    n_batches = 16
    for mode in ("per_batch_float", "update_device"):
        for _rep in range(2):               # 2nd rep is the timed one
            bank = MetricBank()
            t0 = time.perf_counter()
            for i in range(n_batches):
                logs = step(state, batch, jax.random.PRNGKey(i))
                if mode == "per_batch_float":
                    bank.update({k: float(v) for k, v in logs.items()})
                else:
                    bank.update_device(logs)
            vals = bank.compute()
            dt = time.perf_counter() - t0
        print(json.dumps({"mode": mode, "epoch_s": round(dt, 3),
                          "per_batch_ms": round(dt / n_batches * 1e3, 1),
                          "epe": round(vals.get("val_losses/EPE",
                                                float("nan")), 5)}),
              flush=True)


if __name__ == "__main__":
    main()
