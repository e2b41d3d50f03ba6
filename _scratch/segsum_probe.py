"""Decompose the sorted segment-sum backward at b8 x 1M: full function vs
its cumsum vs the boundary gather, on chip.  If the [S*R*X] boundary gather
dominates, it is a sorted-row gather and can reuse the banded pallas
LUT-gather (csum viewed as a [rows, 128, C] grid)."""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops import events as ev_ops

    h, w, nbins, b, m, s = 480, 640, 15, 8, 1 << 20, 4
    hq, wq = h // s, w // s
    cells = nbins * hq * wq
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    ev = np.stack([y, x, t, p, bi, np.ones((b, m))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, s) for e in ev]
    evj = np.stack([q[0] for q in pairs])
    ends = jax.device_put(np.stack([q[1] for q in pairs]))   # [B, cells]
    # NOTE: rows is bin-major (bin*hq + yq) while lut_cell_sort orders events
    # by the y-major key (yq*nbins + bin)*wq + xq (data/host_ops.py), so the
    # flat_idx fed to _segment_sum_sorted below is NOT ascending.  Harmless
    # for TIMING only because flat_idx is dead when cell_ends is supplied —
    # do not reuse this probe for correctness checks of cell labels.
    rows = jax.device_put(
        (evj[..., 4].astype(np.int32) * hq
         + np.clip(evj[..., 0], 0, h - 1).astype(np.int32) // s))
    cols = jax.device_put(np.clip(evj[..., 1], 0, w - 1).astype(np.int32) // s)
    grads = jax.device_put(rng.normal(size=(b, m, 2)).astype(np.float32))

    def timeit(f, *a):
        g = jax.jit(f)
        out = g(*a)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*a)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        return (time.perf_counter() - t0) / iters * 1e3

    full = lambda ri, ci, g, ce: jax.vmap(
        lambda a, c2, g2, e2: ev_ops._segment_sum_sorted(
            a * wq + c2, g2, num_cells=cells, cell_ends=e2))(ri, ci, g, ce)
    t_full = timeit(full, rows, cols, grads, ends)
    print(json.dumps({"variant": "full_segsum_bwd", "ms": round(t_full, 2)}),
          flush=True)

    t_cs = timeit(lambda g: jnp.cumsum(g, axis=1), grads)
    print(json.dumps({"variant": "cumsum_only", "ms": round(t_cs, 2)}),
          flush=True)

    csum = jnp.concatenate(
        [jnp.zeros((b, 1, 2), jnp.float32),
         jnp.cumsum(grads, axis=1)], axis=1)

    t_g = timeit(lambda cs, ce: jnp.take_along_axis(
        cs, ce[..., None], axis=1), csum, ends)
    print(json.dumps({"variant": "boundary_gather_only", "ms": round(t_g, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
