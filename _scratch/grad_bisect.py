"""Bisect the pallas IWE-vote gradient-path overhead on the real TPU.

CLAUDE.md round-2 note: jax.grad of the vote measured ~500 ms more than the
raw fwd kernel + bwd kernel (~48.6 ms standalone).  Suspects: XLA layout
copies feeding the 12 per-event pallas operands, or the _prep recompute.

Times, at b8 x 1M warped coords (cell-sorted, DSEC-like displacements):
  fwd            jit(iwe_vote_pallas)
  raw fwd+bwd    jit of _vjp_fwd + _vjp_bwd called directly (fixed cotangent)
  grad           jit(jax.grad(sum(vote)))
  sorted fwd / raw / grad for band in {144, 192}
"""
import functools
import time

import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.ops.pallas import iwe_vote as iv

    h, w = 480, 640
    b, m = 8, 1 << 20
    rng = np.random.default_rng(0)
    # Cell-sorted-like coords: y ascending within each sample + small warp.
    y = np.sort(rng.uniform(0, h - 1, (b, m)), axis=1)
    x = rng.uniform(0, w - 1, (b, m))
    dy = rng.uniform(-30, 30, (b, m)); dx = rng.uniform(-30, 30, (b, m))
    coords = np.stack([y + dy, x + dx], -1).astype(np.float32)
    wgt = rng.uniform(0.5, 1.0, (b, m)).astype(np.float32)
    coords = jax.device_put(jnp.asarray(coords))
    wgt = jax.device_put(jnp.asarray(wgt))
    g_out = jnp.ones((b, h, w), jnp.float32)

    # --- full-height kernel ---
    fwd = jax.jit(lambda c, v: iv.iwe_vote_pallas(c, v, h, w))
    print(f"full fwd            {timeit(fwd, coords, wgt):8.1f} ms", flush=True)

    def raw(c, v):
        out, res = iv._vjp_fwd(c, v, h, w, jnp.bfloat16, False)
        dc, dv = iv._vjp_bwd(h, w, jnp.bfloat16, False, res, g_out)
        return out, dc, dv
    print(f"full raw fwd+bwd    {timeit(jax.jit(raw), coords, wgt):8.1f} ms",
          flush=True)

    def loss(c, v):
        return jnp.sum(iv.iwe_vote_pallas(c, v, h, w))
    gradf = jax.jit(jax.grad(loss, argnums=(0, 1)))
    print(f"full grad           {timeit(gradf, coords, wgt):8.1f} ms", flush=True)

    vgf = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    print(f"full val+grad       {timeit(vgf, coords, wgt):8.1f} ms", flush=True)

    # --- banded sorted kernel ---
    for band in (144, 192):
        sfwd = jax.jit(lambda c, v, band=band:
                       iv.iwe_vote_pallas_sorted(c, v, h, w, band))
        print(f"sorted{band} fwd       {timeit(sfwd, coords, wgt):8.1f} ms",
              flush=True)

        def sraw(c, v, band=band):
            out, res = iv._sorted_vjp_fwd(c, v, h, w, band, jnp.bfloat16,
                                          False)
            dc, dv = iv._sorted_vjp_bwd(h, w, band, jnp.bfloat16, False,
                                        res, g_out)
            return out, dc, dv
        print(f"sorted{band} raw f+b   {timeit(jax.jit(sraw), coords, wgt):8.1f}"
              " ms", flush=True)

        def sloss(c, v, band=band):
            return jnp.sum(iv.iwe_vote_pallas_sorted(c, v, h, w, band))
        sgrad = jax.jit(jax.grad(sloss, argnums=(0, 1)))
        print(f"sorted{band} grad      {timeit(sgrad, coords, wgt):8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
