"""Banded Pallas voxel vote vs XLA scatter voxelize at b8 x 1M on chip:
compile, numerics, timing, band sweep."""
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops.events import voxel_grid_from_events
    from motionpriorcmax_tpu.ops.pallas.voxel_vote import (
        voxel_vote_pallas_sorted)
    from motionpriorcmax_tpu.utils.profiling import device_timer

    h, w, nbins, b, m, s = 480, 640, 15, 8, 1 << 20, 4
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    ev = np.stack([y, x, t, p, bi, np.ones((b, m))], -1).astype(np.float32)
    prs = [lut_cell_sort(e, (h, w), nbins, s) for e in ev]
    evj = jnp.asarray(np.stack([q[0] for q in prs]))

    def scatter(e):
        return jax.vmap(lambda r: voxel_grid_from_events(
            r[:, 0], r[:, 1], r[:, 2] * (nbins - 1), r[:, 3], r[:, 5],
            num_bins=nbins, height=h, width=w))(e)

    f_sc = jax.jit(lambda e: jnp.sum(scatter(e) ** 2))
    want = np.asarray(jax.jit(scatter)(evj[:1]))
    dt, _ = device_timer(f_sc, evj, iters=3, warmup=1)
    print(json.dumps({"impl": "xla_scatter", "ms": round(dt * 1e3, 1)}),
          flush=True)

    for band in (128, 96, 192):
        f = jax.jit(lambda e, band=band: voxel_vote_pallas_sorted(
            e, num_bins=nbins, height=h, width=w, cell_size=s, band=band))
        got = np.asarray(f(evj[:1]))
        err = float(np.abs(got - want).max())
        scale = float(np.abs(want).max())
        g = jax.jit(lambda e, band=band: jnp.sum(voxel_vote_pallas_sorted(
            e, num_bins=nbins, height=h, width=w, cell_size=s,
            band=band) ** 2))
        dt, _ = device_timer(g, evj, iters=5, warmup=1)
        print(json.dumps({"impl": "pallas_sorted", "band": band,
                          "ms": round(dt * 1e3, 1),
                          "maxerr": err, "scale": scale}), flush=True)


if __name__ == "__main__":
    main()
