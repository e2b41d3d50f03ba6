"""Batch ladder at current auto defaults (post cell-sort, post exp2 kernel).

Usage: python _scratch/batch_ladder.py [batch ...]   (default 4 8 16)
"""
import functools
import sys
import time

from step_variants import build_batch


def main():
    import jax
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (
        TrajectoryNetConfig, create_train_state, train_step)

    h, w, nbins = 480, 640, 15
    m, lut = 1 << 20, 4
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins, num_basis=1,
                              patch_size=4, basis_type="polynomial",
                              compute_dtype="bfloat16")
    lcfg = FocusLossConfig(
        image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
        smooth_weight=0.003, lut_superpixel_size=lut, focus_loss_norm="l1",
        dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
        polarity_aware_batching=False, interpolation_scheme="mean",
        knn_block_size=512, knn_method="softmax")

    batches = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    for batch in batches:
        batch_dict = build_batch(h, w, nbins, batch, m, lut)
        state = create_train_state(cfg, jax.random.PRNGKey(0))
        step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=lcfg),
                       donate_argnums=(0,))
        state, logs = step(state, batch_dict, jax.random.PRNGKey(1))
        loss0 = float(logs["train_losses/total"])
        iters = 10
        t0 = time.perf_counter()
        for i in range(iters):
            state, logs = step(state, batch_dict, jax.random.PRNGKey(i))
        final = float(logs["train_losses/total"])
        dt = time.perf_counter() - t0
        ms = dt / iters * 1e3
        evs = batch * m * iters / dt
        print(f"b{batch:<3d} {ms:8.1f} ms/step  {evs/1e6:6.2f} M ev/s  "
              f"loss {loss0:.4f}->{final:.4f}", flush=True)


if __name__ == "__main__":
    main()
