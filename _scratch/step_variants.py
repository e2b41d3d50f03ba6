"""Time full train-step variants on the real TPU (tunnel-safe sync).

Variants cover the round-2 opt-in kernels pending on-chip measurement:
  base            current defaults (pallas vote full-height, xla lut gather)
  vote144/vote192 banded pallas IWE vote (vote_band_px)
  lutpal          banded pallas LUT-gather forward (lut_gather_impl='pallas')
  combo           best vote band + pallas gather

Usage: python _scratch/step_variants.py [variant ...]
"""
import functools
import sys
import time

import numpy as np


def build_batch(h, w, nbins, batch, m, lut):
    import jax
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort

    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (batch, m)); x = rng.uniform(0, w - 1, (batch, m))
    t = rng.uniform(0, 1, (batch, m))
    p = rng.integers(0, 2, (batch, m)).astype(np.float32)
    b = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    events = np.stack([y, x, t, p, b, np.ones((batch, m))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, lut) for e in events]
    events = np.stack([pp[0] for pp in pairs])
    cell_ends = np.stack([pp[1] for pp in pairs])
    voxel = rng.normal(size=(batch, nbins, h, w)).astype(np.float32)
    return {
        "voxel": jax.device_put(voxel),
        "events": jax.device_put(events),
        "lut_cell_ends": jax.device_put(cell_ends),
    }


def main():
    import jax
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (
        TrajectoryNetConfig, create_train_state, train_step)

    h, w, nbins = 480, 640, 15
    batch, m, lut = 8, 1 << 20, 4
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins, num_basis=1,
                              patch_size=4, basis_type="polynomial",
                              compute_dtype="bfloat16")

    def loss_cfg(**kw):
        return FocusLossConfig(
            image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
            smooth_weight=0.003, lut_superpixel_size=lut, focus_loss_norm="l1",
            dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
            polarity_aware_batching=False, interpolation_scheme="mean",
            knn_block_size=512, knn_method="softmax", **kw)

    variants = {
        "base": loss_cfg(),
        "vote144": loss_cfg(vote_band_px=144),
        "vote192": loss_cfg(vote_band_px=192),
        "lutpal": loss_cfg(lut_gather_impl="pallas"),
        "combo": loss_cfg(vote_band_px=144, lut_gather_impl="pallas"),
        "expbf16": loss_cfg(interp_exp_dtype="bfloat16"),
        "band64": loss_cfg(interp_band_px=64.0),
        "dynband": loss_cfg(interp_band_dynamic=True),
        "dynall": loss_cfg(interp_band_dynamic=True,
                           interp_exp_dtype="bfloat16", vote_band_px=144,
                           lut_gather_impl="pallas"),
        "perbin0": loss_cfg(interp_band_per_bin=False),
    }
    want = sys.argv[1:] or list(variants)

    batch_dict = build_batch(h, w, nbins, batch, m, lut)

    for name in want:
        lcfg = variants[name]
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
        print(f"{name:8s} {ms:8.1f} ms/step  {evs/1e6:6.2f} M ev/s  "
              f"loss {loss0:.4f}->{final:.4f}", flush=True)


if __name__ == "__main__":
    main()
