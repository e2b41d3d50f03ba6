"""Scaling-efficiency harness (BASELINE.md: 1 chip / 1 host / N hosts).

Runs the sharded flow train step over meshes of increasing size and reports
events/s and parallel efficiency.  On real pods this measures ICI scaling;
under `--virtual N` it uses N virtual CPU devices to validate the sharded
program (functional scaling, not performance).

Run:  python -m motionpriorcmax_tpu.benchmarks.scaling [--virtual 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def bench_mesh(data: int, event: int, per_shard_batch: int = 1,
               m: int = 1 << 17, hw=(480, 640), nbins: int = 15,
               iters: int = 5) -> float:
    import jax

    from ..losses import FocusLossConfig
    from ..parallel import (make_mesh, make_sharded_train_step, replicate,
                            shard_batch)
    from ..training import TrajectoryNetConfig, create_train_state, train_step

    h, w = hw
    mesh = make_mesh(data=data, event=event)
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins)
    loss_cfg = FocusLossConfig(image_shape=(h, w), num_bins=nbins,
                               polarity_aware_batching=False,
                               knn_block_size=1200)
    batch = data * per_shard_batch
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (batch, m)); x = rng.uniform(0, w - 1, (batch, m))
    t = rng.uniform(0, 1, (batch, m))
    p = rng.integers(0, 2, (batch, m)).astype(np.float32)
    bn = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    events = np.stack([y, x, t, p, bn, np.ones((batch, m))], -1).astype(np.float32)
    voxel = rng.normal(size=(batch, nbins, h, w)).astype(np.float32)

    state = replicate(mesh, create_train_state(cfg, jax.random.PRNGKey(0)))
    sharded = shard_batch(mesh, {"voxel": voxel, "events": events})
    step = make_sharded_train_step(
        functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg), mesh)

    key = jax.random.PRNGKey(1)
    state, logs = step(state, sharded, key)
    float(logs["train_losses/total"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, logs = step(state, sharded, jax.random.PRNGKey(i))
    float(logs["train_losses/total"])
    dt = (time.perf_counter() - t0) / iters
    return batch * m / dt


def main():
    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--virtual", type=int, default=0,
                        help="force N virtual CPU devices")
    parser.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = parser.parse_args()

    if args.virtual:
        import os

        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.virtual}")
        jax.config.update("jax_platforms", "cpu")

    n = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n]
    base = None
    for s in sizes:
        eps = bench_mesh(data=s, event=1, hw=tuple(args.hw),
                         m=1 << (17 if args.virtual else 19))
        if base is None:
            base = eps
        print(json.dumps({
            "metric": "scaling_events_per_s",
            "devices": s,
            "value": round(eps, 0),
            "efficiency": round(eps / (base * s), 3),
        }))


if __name__ == "__main__":
    main()
