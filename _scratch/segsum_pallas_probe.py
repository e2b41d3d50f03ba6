"""sorted vs sorted_pallas grid_gather backward at b8 x 1M flow shape:
timing + max grad deviation (must be ~exact: HIGHEST one-hot gather)."""
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops import events as ev_ops
    from motionpriorcmax_tpu.utils.profiling import device_timer

    h, w, nbins, b, m, s = 480, 640, 15, 8, 1 << 20, 4
    hq, wq = h // s, w // s
    r = hq * nbins
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    ev = np.stack([y, x, t, p, bi, np.ones((b, m))], -1).astype(np.float32)
    prs = [lut_cell_sort(e, (h, w), nbins, s) for e in ev]
    evj = np.stack([q[0] for q in prs])
    ends = jnp.asarray(np.stack([q[1] for q in prs]))
    rows = jnp.asarray((np.clip(evj[..., 0], 0, h - 1) // s).astype(np.int32)
                       * nbins + evj[..., 4].astype(np.int32))
    cols = jnp.asarray(np.clip(evj[..., 1], 0, w - 1).astype(np.int32) // s)
    grid = jnp.asarray(rng.normal(size=(b, r, wq, 2)).astype(np.float32))

    grads = {}
    for impl in ("sorted", "sorted_pallas"):
        f = jax.jit(jax.grad(lambda g: jnp.sum(ev_ops.grid_gather(
            g, rows, cols, impl, ends, "pallas_sorted", nbins * 2 + 2) ** 2)))
        grads[impl] = np.asarray(f(grid))
        dt, _ = device_timer(f, grid, iters=5, warmup=1)
        print(json.dumps({"impl": impl, "fwd_bwd_ms": round(dt * 1e3, 1)}),
              flush=True)
    err = float(np.abs(grads["sorted_pallas"] - grads["sorted"]).max())
    scale = float(np.abs(grads["sorted"]).max())
    print(json.dumps({"grad_maxerr": err, "grad_scale": scale}), flush=True)


if __name__ == "__main__":
    main()
