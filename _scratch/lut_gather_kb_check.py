"""Correctness + timing of lut_gather KB/BE variants vs the XLA gather."""
import functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops.pallas import lut_gather as lg
    from motionpriorcmax_tpu.utils.profiling import device_timer

    h, w, nbins, b, m, s = 480, 640, 15, 8, 1 << 20, 4
    hq, wq = h // s, w // s
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    ev = np.stack([y, x, t, p, bi, np.ones((b, m))], -1).astype(np.float32)
    prs = [lut_cell_sort(e, (h, w), nbins, s) for e in ev]
    evj = jnp.asarray(np.stack([q[0] for q in prs]))
    it = evj[..., 4].astype(jnp.int32)
    iy = jnp.floor(evj[..., 0] / s).astype(jnp.int32)
    ix = jnp.floor(evj[..., 1] / s).astype(jnp.int32)
    rows = jnp.clip(iy, 0, hq - 1) * nbins + jnp.clip(it, 0, nbins - 1)
    cols = jnp.clip(ix, 0, wq - 1)
    lut = jnp.asarray(rng.normal(size=(b, hq * nbins, wq, 2))
                      .astype(np.float32))
    want = np.asarray(jnp.take_along_axis(
        lut.reshape(b, -1, 2), (rows * wq + cols)[..., None], axis=1))

    for kb, be in ((8, 1024), (4, 1024), (2, 1024), (1, 1024), (2, 2048)):
        okb, obe = lg.KB, lg.BE
        lg.KB, lg.BE = kb, be
        try:
            g = jax.jit(functools.partial(lg.lut_gather_sorted,
                                          band_rows=nbins * 2 + 2))
            got = np.asarray(g(lut, rows, cols))
            err = float(np.abs(got - want).max())
            dt, _ = device_timer(g, lut, rows, cols, iters=5, warmup=1)
            print(json.dumps({"kb": kb, "be": be, "ms": round(dt * 1e3, 1),
                              "maxerr": err}), flush=True)
        finally:
            lg.KB, lg.BE = okb, obe


if __name__ == "__main__":
    main()
