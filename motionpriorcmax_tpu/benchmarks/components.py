"""Component microbenchmarks for the hot ops (SURVEY.md §3 hot loops).

Run:  python -m motionpriorcmax_tpu.benchmarks.components
Prints one JSON line per component: KNN, IWE scatter, voxelize, UNet fwd,
focus loss end-to-end — the data that decides which Pallas kernels to write.
"""

from __future__ import annotations

import functools
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ..losses import FocusLossConfig, focus_loss
    from ..ops.events import iwe_bilinear_vote_batch, voxel_grid_from_events
    from ..ops.grids import tile_mask_positions
    from ..ops.knn import knn_blocked
    from ..utils.profiling import device_timer

    h, w, nbins, k = 480, 640, 15, 32
    b, m = 2, 1 << 19
    rng = np.random.default_rng(0)
    results = {}

    # --- KNN: Q=N=19200 grid/trajectory points, per (b, bin) --------------
    q = (h // 4) * (w // 4)
    queries = jnp.asarray(rng.uniform(0, h, (q, 2)).astype(np.float32))
    db = jnp.asarray(rng.uniform(0, h, (b * nbins, q, 2)).astype(np.float32))
    knn = jax.jit(jax.vmap(lambda d: knn_blocked(queries, d, k,
                                                 block_size=1200)))
    dt, _ = device_timer(knn, db, iters=5)
    results["knn_exact_b2x15_19200x19200_k32_ms"] = round(dt * 1e3, 2)

    knn_a = jax.jit(jax.vmap(lambda d: knn_blocked(queries, d, k,
                                                   block_size=4800,
                                                   method="approx")))
    dt, _ = device_timer(knn_a, db, iters=5)
    results["knn_approx_ms"] = round(dt * 1e3, 2)

    from ..ops.knn import knn_grid_window

    knn_g = jax.jit(jax.vmap(lambda d: knn_grid_window(
        queries, d, k, cell_size=4.0, grid_hw=(h // 4, w // 4),
        window_radius=6, cell_capacity=6)))
    try:
        dt, _ = device_timer(knn_g, db, iters=5)
        results["knn_grid_ms"] = round(dt * 1e3, 2)
    except Exception:
        results["knn_grid_ms"] = -1

    # --- IWE bilinear scatter (forward), both scatter impls ---------------
    coords = jnp.asarray(rng.uniform(0, h - 1, (b, m, 2)).astype(np.float32))
    wgt = jnp.ones((b, m), jnp.float32)
    for impl in ("direct", "sorted"):
        iwe = jax.jit(functools.partial(iwe_bilinear_vote_batch, height=h,
                                        width=w, scatter_impl=impl))
        dt, _ = device_timer(iwe, coords, wgt, iters=5)
        results[f"iwe_scatter_{impl}_events_per_s"] = round(b * m / dt, 0)

    # --- IWE forward+backward --------------------------------------------
    def iwe_loss(c, wg):
        img = iwe_bilinear_vote_batch(c, wg, height=h, width=w)
        return jnp.sum(img * img)

    iwe_grad = jax.jit(jax.grad(iwe_loss))
    dt, _ = device_timer(iwe_grad, coords, wgt, iters=5)
    results["iwe_scatter_fwd_bwd_events_per_s"] = round(b * m / dt, 0)

    # --- IWE as MXU one-hot outer products (the TPU production path) ------
    iwe_mm = jax.jit(functools.partial(iwe_bilinear_vote_batch, height=h,
                                       width=w, scatter_impl="matmul"))
    dt, _ = device_timer(iwe_mm, coords, wgt, iters=5)
    results["iwe_matmul_events_per_s"] = round(b * m / dt, 0)

    def iwe_mm_loss(c, wg):
        img = iwe_bilinear_vote_batch(c, wg, height=h, width=w,
                                      scatter_impl="matmul")
        return jnp.sum(img * img)

    iwe_mm_grad = jax.jit(jax.grad(iwe_mm_loss))
    dt, _ = device_timer(iwe_mm_grad, coords, wgt, iters=5)
    results["iwe_matmul_fwd_bwd_events_per_s"] = round(b * m / dt, 0)

    # --- Voxelize on device ----------------------------------------------
    y = jnp.asarray(rng.uniform(0, h - 1, (m,)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, w - 1, (m,)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, nbins - 1, (m,)).astype(np.float32))
    p = jnp.asarray(rng.integers(0, 2, (m,)).astype(np.float32))
    v = jnp.ones((m,), jnp.float32)
    vox = jax.jit(functools.partial(voxel_grid_from_events, num_bins=nbins,
                                    height=h, width=w))
    dt, _ = device_timer(vox, y, x, t, p, v, iters=5)
    results["voxelize_events_per_s"] = round(m / dt, 0)

    # --- Focus loss end-to-end (no model) --------------------------------
    loss_cfg = FocusLossConfig(image_shape=(h, w), num_bins=nbins, num_knn=k,
                               polarity_aware_batching=False,
                               knn_block_size=1200)
    n_traj = q
    pos = tile_mask_positions((h, w), 4).astype(np.float32)
    times = jnp.concatenate([jnp.asarray([0.5]),
                             jnp.asarray((np.arange(nbins) + 0.5) / nbins)])
    traj = jnp.asarray(np.broadcast_to(pos[None, None], (b, nbins + 1, n_traj, 2)).copy())
    bins = jnp.asarray(rng.integers(0, nbins, (b, m)).astype(np.float32))
    events = jnp.stack([
        jnp.asarray(rng.uniform(0, h - 1, (b, m)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, w - 1, (b, m)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (b, m)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2, (b, m)).astype(np.float32)),
        bins, jnp.ones((b, m))], axis=-1)

    floss = jax.jit(lambda tr, ev: focus_loss(loss_cfg, tr, times, ev)[0])
    dt, _ = device_timer(floss, traj, events, iters=5)
    results["focus_loss_exact_fwd_events_per_s"] = round(b * m / dt, 0)

    fgrad = jax.jit(jax.grad(lambda tr, ev: focus_loss(loss_cfg, tr, times, ev)[0]))
    dt, _ = device_timer(fgrad, traj, events, iters=5)
    results["focus_loss_exact_fwd_bwd_events_per_s"] = round(b * m / dt, 0)

    # Production path: dense softmax interpolation (banded Pallas on TPU).
    import dataclasses

    soft_cfg = dataclasses.replace(loss_cfg, knn_method="softmax",
                                   knn_block_size=512)
    fgrad_s = jax.jit(jax.grad(
        lambda tr, ev: focus_loss(soft_cfg, tr, times, ev)[0]))
    dt, _ = device_timer(fgrad_s, traj, events, iters=5)
    results["focus_loss_softmax_fwd_bwd_events_per_s"] = round(b * m / dt, 0)

    # Cell-sorted production path: O(M) sorted segment-sum gather backward
    # (+ optional banded vote / pallas gather via config).
    from ..data.host_ops import lut_cell_sort

    pairs = [lut_cell_sort(np.asarray(events[i]), (h, w), nbins, 4)
             for i in range(b)]
    ev_sorted = jnp.asarray(np.stack([pp[0] for pp in pairs]))
    ends = jnp.asarray(np.stack([pp[1] for pp in pairs]))
    fgrad_sorted = jax.jit(jax.grad(
        lambda tr, ev: focus_loss(soft_cfg, tr, times, ev,
                                  cell_ends=ends)[0]))
    dt, _ = device_timer(fgrad_sorted, traj, ev_sorted, iters=5)
    results["focus_loss_sorted_fwd_bwd_events_per_s"] = round(b * m / dt, 0)

    for key, val in results.items():
        print(json.dumps({"metric": key, "value": val}))


if __name__ == "__main__":
    main()
