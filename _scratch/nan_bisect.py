"""Bisect the NaN train loss at DSEC scale on the real TPU.

Variants toggle one suspect at a time; prints the full logs dict for the
first two steps of each.
"""
import functools
import sys

import numpy as np


def main():
    import jax
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.training import (
        TrajectoryNetConfig, create_train_state, train_step)
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort

    h, w, nbins = 480, 640, 15
    batch, m, lut = 8, 1 << 20, 4

    def net_cfg(**kw):
        base = dict(image_shape=(h, w), num_bins=nbins, num_basis=1,
                    patch_size=4, basis_type="polynomial",
                    compute_dtype="bfloat16")
        base.update(kw)
        return TrajectoryNetConfig(**base)

    def loss_cfg(**kw):
        return FocusLossConfig(
            image_shape=(h, w), num_tref=1, num_bins=nbins, num_knn=32,
            smooth_weight=0.003, lut_superpixel_size=lut,
            focus_loss_norm="l1", dist_norm="l2", scale_iwe_by_dt=True,
            mask_image_border=True, polarity_aware_batching=False,
            interpolation_scheme="mean", knn_block_size=512,
            knn_method="softmax", **kw)

    variants = {
        "base": (net_cfg(), loss_cfg(), True),
        "xla_interp": (net_cfg(), loss_cfg(use_pallas_interp=False), True),
        "matmul_vote": (net_cfg(), loss_cfg(iwe_impl="matmul"), True),
        "unsorted": (net_cfg(), loss_cfg(), False),
        "f32": (net_cfg(compute_dtype="float32"), loss_cfg(), True),
        "b1": (net_cfg(), loss_cfg(), True),
    }
    want = sys.argv[1:] or list(variants)

    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (batch, m)); x = rng.uniform(0, w - 1, (batch, m))
    t = rng.uniform(0, 1, (batch, m))
    p = rng.integers(0, 2, (batch, m)).astype(np.float32)
    b = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    events = np.stack([y, x, t, p, b, np.ones((batch, m))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, lut) for e in events]
    sevents = np.stack([pp[0] for pp in pairs])
    cell_ends = np.stack([pp[1] for pp in pairs])
    voxel = rng.normal(size=(batch, nbins, h, w)).astype(np.float32)

    for name in want:
        ncfg, lcfg, sorted_ = variants[name]
        take = 1 if name == "b1" else batch
        bd = {"voxel": jax.device_put(voxel[:take]),
              "events": jax.device_put(sevents[:take] if sorted_
                                       else events[:take])}
        if sorted_:
            bd["lut_cell_ends"] = jax.device_put(cell_ends[:take])
        state = create_train_state(ncfg, jax.random.PRNGKey(0))
        step = jax.jit(functools.partial(train_step, cfg=ncfg, loss_cfg=lcfg))
        for i in range(2):
            state, logs = step(state, bd, jax.random.PRNGKey(i))
            print(name, i, {k: float(v) for k, v in logs.items()}, flush=True)


if __name__ == "__main__":
    main()
