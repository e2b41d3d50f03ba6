"""Isolate the on-chip split16 cross-term failure.

Runs tiny pallas kernels on the real chip comparing against host math:
  crossA  sublane-sublane dot_general(q16 [16,BQ], d16 [16,BN]) DEFAULT
  crossB  same with precision=HIGHEST (should be exact -> is the DOT wrong?)
  crossC  in-kernel transpose to [BQ,16] @ [16,BN] DEFAULT
  recon   h+m+l row sums vs host (is the SPLIT/slicing wrong?)
"""
import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    BQ, BN = 256, 256
    rng = np.random.default_rng(0)
    q = (rng.uniform(-320, 320, (2, BQ))).astype(np.float32)
    d = (rng.uniform(-320, 320, (2, BN))).astype(np.float32)

    def hml(v):
        hi = v.astype(jnp.bfloat16).astype(jnp.float32)
        r = v - hi
        mid = r.astype(jnp.bfloat16).astype(jnp.float32)
        lo = (r - mid).astype(jnp.bfloat16).astype(jnp.float32)
        return hi, mid, lo

    def split_q(qt):
        rows = []
        for coord in (qt[0], qt[1]):
            h, m, l = hml(coord)
            rows += [h, h, h, m, m, m, l, l]
        return jnp.stack(rows)

    def split_d(dt):
        rows = []
        for c in range(2):
            h, m, l = hml(dt[c])
            rows += [h, m, l, h, m, l, h, m]
        return jnp.stack(rows)

    q16 = np.asarray(jax.jit(split_q)(q))
    d16 = np.asarray(jax.jit(split_d)(d))
    want = q.T @ d  # [BQ, BN] f64-ish reference
    want64 = q.astype(np.float64).T @ d.astype(np.float64)

    def kA(q_ref, d_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            q_ref[:, :], d_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def kB(q_ref, d_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            q_ref[:, :], d_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def kC(q_ref, d_ref, o_ref):
        qt = jnp.transpose(q_ref[:, :])
        o_ref[:, :] = jax.lax.dot_general(
            qt, d_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def run(kern, name):
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((BQ, BN), jnp.float32))
        out = np.asarray(jax.jit(f)(q16, d16))
        err = np.abs(out - want64)
        print(f"{name}: maxerr {err.max():.3e} rel {(err/np.abs(want64+1e-9)).max():.3e}",
              flush=True)

    run(kA, "crossA sublane-sublane DEFAULT")
    run(kB, "crossB sublane-sublane HIGHEST")
    run(kC, "crossC transpose-then-dot DEFAULT")

    # recon: do the in-kernel row sums reconstruct the coordinates?
    def kR(d_ref, o_ref):
        dy = d_ref[0:1, :] + d_ref[1:2, :] + d_ref[2:3, :]
        dx = d_ref[8:9, :] + d_ref[9:10, :] + d_ref[10:11, :]
        o_ref[:, :] = jnp.concatenate([dy, dx], axis=0)

    f = pl.pallas_call(
        kR, out_shape=jax.ShapeDtypeStruct((2, BN), jnp.float32))
    out = np.asarray(jax.jit(f)(d16))
    print("recon maxerr:", np.abs(out - d).max(), flush=True)



def more():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    BQ, BN = 256, 256
    rng = np.random.default_rng(0)
    q = (rng.uniform(-320, 320, (2, BQ))).astype(np.float32)
    d = (rng.uniform(-320, 320, (2, BN))).astype(np.float32)

    def hml(v):
        hi = v.astype(jnp.bfloat16).astype(jnp.float32)
        r = v - hi
        mid = r.astype(jnp.bfloat16).astype(jnp.float32)
        lo = (r - mid).astype(jnp.bfloat16).astype(jnp.float32)
        return hi, mid, lo

    def split_q(qt):
        rows = []
        for coord in (qt[0], qt[1]):
            h, m, l = hml(coord)
            rows += [h, h, h, m, m, m, l, l]
        return jnp.stack(rows).astype(jnp.bfloat16)

    def split_d(dt):
        rows = []
        for c in range(2):
            h, m, l = hml(dt[c])
            rows += [h, m, l, h, m, l, h, m]
        return jnp.stack(rows).astype(jnp.bfloat16)

    q16 = np.asarray(jax.jit(split_q)(q))
    d16 = np.asarray(jax.jit(split_d)(d))
    want64 = q.astype(np.float64).T @ d.astype(np.float64)

    def kD(q_ref, d_ref, o_ref):  # bf16 operands, f32 accum
        o_ref[:, :] = jax.lax.dot_general(
            q_ref[:, :], d_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    f = pl.pallas_call(kD, out_shape=jax.ShapeDtypeStruct((BQ, BN), jnp.float32))
    out = np.asarray(jax.jit(f)(q16, d16))
    err = np.abs(out - want64)
    print(f"crossD bf16-operands DEFAULT: maxerr {err.max():.3e} rel {(err/np.abs(want64+1e-9)).max():.3e}", flush=True)

    def kE(q_ref, d_ref, o_ref):  # raw [2,*] operands, HIGH (3-pass)
        o_ref[:, :] = jax.lax.dot_general(
            q_ref[:, :], d_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH)

    f = pl.pallas_call(kE, out_shape=jax.ShapeDtypeStruct((BQ, BN), jnp.float32))
    out = np.asarray(jax.jit(f)(q, d))
    err = np.abs(out - want64)
    print(f"crossE raw k=2 HIGH: maxerr {err.max():.3e} rel {(err/np.abs(want64+1e-9)).max():.3e}", flush=True)


if __name__ == "__main__":
    more()
