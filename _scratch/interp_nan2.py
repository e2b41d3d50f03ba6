"""Run the interp value check against a specific kernel-module file.

Usage: python _scratch/interp_nan2.py <module_path.py> [case ...]
"""
import importlib.util
import sys

import numpy as np


def load(path):
    spec = importlib.util.spec_from_file_location("si_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax
    import jax.numpy as jnp

    mod = load(sys.argv[1])
    s = 4
    rng = np.random.default_rng(0)

    def grid(hq, wq):
        ys = np.arange(hq) * s + s / 2 - 0.5
        xs = np.arange(wq) * s + s / 2 - 0.5
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        return np.stack([gy.reshape(-1), gx.reshape(-1)], -1).astype(np.float32)

    cases = {
        "small": (2, 30, 40, 0.0),
        "g1": (1, 120, 160, 0.0),
        "band80_g1": (1, 120, 160, 80.0),
    }
    want = sys.argv[2:] or list(cases)
    for name in want:
        g, chq, cwq, margin = cases[name]
        q = grid(chq, cwq)
        n = q.shape[0]
        db = (q[None] + rng.uniform(-5, 5, (g, n, 2))).astype(np.float32)
        vals = rng.normal(size=(g, n, 2)).astype(np.float32)
        qj, dbj, vj = map(jnp.asarray, (q, db, vals))
        band = (margin, float(s), float(cwq))
        out = np.asarray(jax.jit(lambda a, b, c: mod.softmax_interp_pallas(
            a, b, c, 25.0, False, band))(qj, dbj, vj))
        finite = np.isfinite(out).all()
        line = f"{name:12s} finite={finite}"
        if finite and g * n * n <= 2 * 1200 * 1200 * 4:
            ref = np.asarray(jax.jit(mod.softmax_interp_reference)(qj, dbj, vj))
            line += f" maxerr={np.max(np.abs(out - ref)):.3e}"
        elif finite:
            # blockwise XLA check on a query subset
            sub = slice(0, 1024)
            dy = qj[None, sub, None, 0] - dbj[:, None, :, 0]
            dx = qj[None, sub, None, 1] - dbj[:, None, :, 1]
            w = jnp.exp(-(dy * dy + dx * dx) / 25.0)
            ref = jnp.einsum("gqn,gnc->gqc", w, vj) / jnp.sum(
                w, -1, keepdims=True)
            line += f" maxerr[0:1024]={np.max(np.abs(out[:, sub] - np.asarray(ref))):.3e}"
        elif not finite:
            bad = np.argwhere(~np.isfinite(out))
            line += f" n_bad={len(bad)} first={bad[0]}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
