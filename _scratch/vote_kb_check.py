"""Vote kernel KB sweep: correctness vs the matmul vote + fwd / fwd+bwd
timing at b8 x 1M."""
import functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops import events as ev_ops
    from motionpriorcmax_tpu.ops.pallas import iwe_vote as iv
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
    coords = evj[..., :2] + jnp.asarray(
        rng.normal(scale=5.0, size=(b, m, 2)).astype(np.float32))
    wgt = evj[..., 5]

    want = np.asarray(jax.jit(functools.partial(
        ev_ops.iwe_bilinear_vote_batch, height=h, width=w,
        scatter_impl="matmul"))(coords, wgt))

    for kb in (8, 4, 2):
        okb = iv.KB
        iv.KB = kb
        try:
            f = jax.jit(lambda c, g: iv.iwe_vote_pallas_sorted(c, g, h, w,
                                                               144))
            got = np.asarray(f(coords, wgt))
            err = float(np.abs(got - want).max())
            dt, _ = device_timer(f, coords, wgt, iters=5, warmup=1)
            fg = jax.jit(jax.grad(lambda c: jnp.sum(
                iv.iwe_vote_pallas_sorted(c, wgt, h, w, 144) ** 2)))
            dtg, _ = device_timer(fg, coords, iters=5, warmup=1)
            print(json.dumps({"kb": kb, "fwd_ms": round(dt * 1e3, 1),
                              "fwd_bwd_ms": round(dtg * 1e3, 1),
                              "maxerr": err}), flush=True)
        finally:
            iv.KB = okb


if __name__ == "__main__":
    main()
