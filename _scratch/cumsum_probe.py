"""Isolated probe: the segsum-backward cumsum at b8 x 1M, current
jnp.cumsum vs a two-level blocked reformulation (cumsum within K-blocks +
exclusive block-offset cumsum).  Association changes only the rounding
order; values stay f32-exact-class."""
import json
import time

import numpy as np


def blocked_cumsum(x, k=4096):
    """[B, M, C] cumsum along axis=1 as within-block + block-offset."""
    import jax.numpy as jnp

    b, m, c = x.shape
    r = m // k
    xr = x.reshape(b, r, k, c)
    inner = jnp.cumsum(xr, axis=2)                        # [B, R, K, C]
    tot = inner[:, :, -1, :]                              # [B, R, C]
    offs = jnp.cumsum(tot, axis=1) - tot                  # exclusive [B, R, C]
    return (inner + offs[:, :, None, :]).reshape(b, m, c)


def main():
    import jax
    import jax.numpy as jnp

    b, m, c = 8, 1 << 20, 2
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(b, m, c)).astype(np.float32))

    def timeit(f, *a):
        g = jax.jit(f)
        out = g(*a)
        float(jnp.sum(out))                               # sync via host read
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*a)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / iters * 1e3, out

    t_cur, ref = timeit(lambda v: jnp.cumsum(v, axis=1), x)
    print(json.dumps({"variant": "jnp.cumsum", "ms": round(t_cur, 2)}),
          flush=True)
    for k in (1024, 4096, 16384):
        t_blk, out = timeit(lambda v, kk=k: blocked_cumsum(v, kk), x)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(json.dumps({"variant": f"blocked{k}", "ms": round(t_blk, 2),
                          "maxerr": err}), flush=True)


if __name__ == "__main__":
    main()
