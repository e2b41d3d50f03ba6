"""On-chip correctness check of the exp2-prescaled softmax interp kernel."""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.ops.pallas.softmax_interp import (
        softmax_interp_pallas, softmax_interp_reference)

    rng = np.random.default_rng(0)
    g, n, c, q = 3, 2048, 2, 700   # q not a BQ multiple -> edge padding
    # Row-major-ish grid db + jitter, queries near them.
    db = rng.uniform(0, 100, (g, n, 2)).astype(np.float32)
    queries = rng.uniform(0, 100, (q, 2)).astype(np.float32)
    vals = rng.normal(size=(g, n, c)).astype(np.float32)

    f = jax.jit(lambda qq, dd, vv: softmax_interp_pallas(qq, dd, vv, 25.0))
    out = np.asarray(f(queries, db, vals))
    ref = np.asarray(softmax_interp_reference(
        jnp.asarray(queries), jnp.asarray(db), jnp.asarray(vals), 25.0))
    err = np.max(np.abs(out - ref))
    print("fwd max abs err:", err)
    assert err < 1e-4, err

    # Backward (d vals) vs the dense reference.
    def loss_pallas(vv):
        return jnp.sum(softmax_interp_pallas(queries, db, vv, 25.0) ** 2)

    def loss_ref(vv):
        return jnp.sum(softmax_interp_reference(
            jnp.asarray(queries), jnp.asarray(db), vv, 25.0) ** 2)

    gp = np.asarray(jax.jit(jax.grad(loss_pallas))(jnp.asarray(vals)))
    gr = np.asarray(jax.jit(jax.grad(loss_ref))(jnp.asarray(vals)))
    gerr = np.max(np.abs(gp - gr)) / (np.max(np.abs(gr)) + 1e-30)
    print("bwd max rel err:", gerr)
    assert gerr < 1e-4, gerr
    print("ok")


if __name__ == "__main__":
    main()
