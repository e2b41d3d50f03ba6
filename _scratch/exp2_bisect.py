"""Bisect the on-chip interp error: old vs new kernel file, padded vs exact Q."""
import importlib.util
import subprocess
import sys

import numpy as np


def load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def check(mod, q, tag):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    g, n, c = 3, 2048, 2
    db = rng.uniform(0, 100, (g, n, 2)).astype(np.float32)
    queries = rng.uniform(0, 100, (q, 2)).astype(np.float32)
    vals = rng.normal(size=(g, n, c)).astype(np.float32)
    f = jax.jit(lambda qq, dd, vv: mod.softmax_interp_pallas(qq, dd, vv, 25.0))
    out = np.asarray(f(queries, db, vals))
    ref = np.asarray(mod.softmax_interp_reference(
        jnp.asarray(queries), jnp.asarray(db), jnp.asarray(vals), 25.0))
    err = np.abs(out - ref)
    bad = int((err > 1e-3).sum())
    print(f"{tag:20s} q={q:5d} maxerr={err.max():.6f} bad={bad} "
          f"argmax={np.unravel_index(err.argmax(), err.shape)}", flush=True)


def main():
    subprocess.run(
        ["git", "show", "HEAD:motionpriorcmax_tpu/ops/pallas/softmax_interp.py"],
        stdout=open("/tmp/si_old.py", "w"), check=True, cwd="/root/repo")
    old = load("/tmp/si_old.py", "si_old")
    new = load("/root/repo/motionpriorcmax_tpu/ops/pallas/softmax_interp.py",
               "si_new")
    for q in (512, 700):
        check(old, q, "old")
        check(new, q, "new")


if __name__ == "__main__":
    main()
