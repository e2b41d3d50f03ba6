"""Check softmax_interp_pallas VALUES on the real TPU at DSEC scale.

Compares against the XLA reference on identical inputs; bisects band
on/off, query count, db size.
"""
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.ops.pallas import (softmax_interp_pallas,
                                                softmax_interp_reference)

    h, w, s = 480, 640, 4
    hq, wq = h // s, w // s
    rng = np.random.default_rng(0)

    def grid(hq, wq):
        ys = np.arange(hq) * s + s / 2 - 0.5
        xs = np.arange(wq) * s + s / 2 - 0.5
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        return np.stack([gy.reshape(-1), gx.reshape(-1)], -1).astype(np.float32)

    cases = [
        ("full_g8", 8, hq, wq, 0.0),
        ("band80_g8", 8, hq, wq, 80.0),
        ("full_g1", 1, hq, wq, 0.0),
        ("band80_g1", 1, hq, wq, 80.0),
        ("full_small", 2, 30, 40, 0.0),
        ("band80_small", 2, 30, 40, 80.0),
    ]
    want = sys.argv[1:] or [c[0] for c in cases]

    for name, g, chq, cwq, margin in cases:
        if name not in want:
            continue
        q = grid(chq, cwq)
        n = q.shape[0]
        db = (q[None] + rng.uniform(-5, 5, (g, n, 2))).astype(np.float32)
        vals = rng.normal(size=(g, n, 2)).astype(np.float32)
        qj, dbj, vj = map(jnp.asarray, (q, db, vals))
        band = (margin, float(s), float(cwq))
        out = jax.jit(lambda a, b, c: softmax_interp_pallas(
            a, b, c, 25.0, False, band))(qj, dbj, vj)
        out = np.asarray(out)
        # Small-N reference on device too (dense; fine at these sizes).
        finite = np.isfinite(out).all()
        line = f"{name:14s} finite={finite}"
        if not finite:
            bad = np.argwhere(~np.isfinite(out))
            line += f" n_bad={len(bad)} first={bad[0]}"
        elif g * n * n <= 2 * 1200 * 1200 * 4:
            # Dense [G, Q, N] reference only at small sizes (giant
            # intermediates crash the remote compiler).
            ref = np.asarray(jax.jit(softmax_interp_reference)(qj, dbj, vj))
            err = np.max(np.abs(out - ref))
            line += f" maxerr={err:.3e}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
