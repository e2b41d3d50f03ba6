"""Benchmark: events/s/chip through the full self-supervised train step
(UNet forward + trajectory eval + KNN flow LUT + event warp + IWE scatter +
focus loss + backward + AdamW update) at DSEC scale (480x640, 15 bins).

This is the BASELINE.md north-star metric.  The reference repo publishes no
throughput numbers (SURVEY.md §6); `vs_baseline` is reported against a
DERIVED 10M events/s/chip estimate for the reference PyTorch pipeline on an
A6000 — the conservative edge of the 11-22 M events/s band from the
step-time arithmetic in BASELINE.md §"Reference-throughput derivation"
(UNet 8.4 TFLOP + KeOps KNN + scatter atomics at README.md:111's batch-14 /
2-GPU setup).  vs_baseline = events_per_s / 1.0e7; >= 1.0 means at least
reference parity per chip under assumptions favorable to the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import time

import numpy as np

REFERENCE_EVENTS_PER_S_ESTIMATE = 1.0e7  # PyTorch A6000 estimate (see above)


def main():
    import jax

    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (
        TrajectoryNetConfig, create_train_state, train_step)

    h, w, nbins = 480, 640, 15
    # Production operating point: the flow-train CLI pads DSEC windows to a
    # 2^20 event capacity (cli/main.py --event-capacity default).  Batch 8 —
    # the nearest power of two to the reference's 7 samples/GPU — fills the
    # TPU (8, 128) sublane tiles exactly; measured ladder at 1M events/sample
    # (2026-08-17): b4 310 ms/13.5 M | b6 489/12.9 | b8 459/18.3 |
    # b12 753/16.7 | b16 890/18.9 M events/s (non-power-of-two batches lay
    # out badly).
    batch, m = 8, 1 << 20

    import os

    # Mixed precision by default (bf16 convs on the MXU, f32 params/BN/loss);
    # BENCH_F32=1 forces full f32 for reference-parity timing.
    dtype = "float32" if os.environ.get("BENCH_F32") == "1" else "bfloat16"
    # BENCH_LUT overrides the flow-LUT superpixel size (reference-native
    # knob: 8 = 4x fewer interpolation queries than the default 4).
    lut = int(os.environ.get("BENCH_LUT", "4"))
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins, num_basis=1,
                              patch_size=4, basis_type="polynomial",
                              compute_dtype=dtype)
    # knn_method='softmax': the TPU-native dense interpolation (see
    # losses/focus.py) — measured 20x faster than the reference-parity exact
    # KNN on v5e with numerically equivalent smooth-field behavior.
    loss_cfg = FocusLossConfig(
        image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
        smooth_weight=0.003, lut_superpixel_size=lut, focus_loss_norm="l1",
        dist_norm="l2", scale_iwe_by_dt=True, mask_image_border=True,
        polarity_aware_batching=False, interpolation_scheme="mean",
        knn_block_size=512, knn_method="softmax")

    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (batch, m)); x = rng.uniform(0, w - 1, (batch, m))
    t = rng.uniform(0, 1, (batch, m))
    p = rng.integers(0, 2, (batch, m)).astype(np.float32)
    b = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    events = np.stack([y, x, t, p, b, np.ones((batch, m))], -1).astype(np.float32)
    # Cell-sort events + LUT boundaries on the host, exactly as the loaders
    # do per batch (data/host_ops.py::lut_cell_sort, overlapped with device
    # compute by the prefetch threads): the focus-loss gather backward then
    # runs as an O(M) cumsum difference instead of dense one-hot matmuls.
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort

    pairs = [lut_cell_sort(e, (h, w), nbins, lut) for e in events]
    events = np.stack([p[0] for p in pairs])
    cell_ends = np.stack([p[1] for p in pairs])
    voxel = rng.normal(size=(batch, nbins, h, w)).astype(np.float32)
    batch_dict = {
        "voxel": jax.device_put(voxel),
        "events": jax.device_put(events),
        "lut_cell_ends": jax.device_put(cell_ends),
    }

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg),
                   donate_argnums=(0,))

    # Warmup/compile.  Synchronize by materializing the loss to host:
    # block_until_ready has been observed not to block on tunneled platforms.
    key = jax.random.PRNGKey(1)
    state, logs = step(state, batch_dict, key)
    float(logs["train_losses/total"])

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, logs = step(state, batch_dict, jax.random.PRNGKey(i))
    # The loss of step i depends on the updated state of step i-1, so this
    # host read forces the whole chain.
    float(logs["train_losses/total"])
    dt = time.perf_counter() - t0

    events_per_s = batch * m * iters / dt
    print(json.dumps({
        "metric": "train_step_events_per_s_per_chip",
        "value": round(events_per_s, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_s / REFERENCE_EVENTS_PER_S_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
