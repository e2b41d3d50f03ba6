"""Round-5 pieces, take 3: encoder/update/adamw timings (inputs as ARGS —
closing over a 707 MB array embedded it as a compile-payload constant,
HTTP 413) + window-lookup formulation sweep at level-0 geometry.

PYTHONPATH=/root/repo:/root/.axon_site
"""
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline import RAFTSplineConfig
    from motionpriorcmax_tpu.models.raft_spline.corr import (
        build_corr_pyramid, lookup_corr_pyramid)
    from motionpriorcmax_tpu.models.raft_spline.curves import coords_grid
    from motionpriorcmax_tpu.models.raft_spline.extractor import BasicEncoder
    from motionpriorcmax_tpu.models.raft_spline.update import BasicUpdateBlock
    from motionpriorcmax_tpu.utils.profiling import device_timer

    b, h, w = 6, 384, 512
    h1, w1 = h // 8, w // 8
    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16

    def emit(tag, ms, extra=None):
        rec = {"tag": tag, "ms": round(ms, 2)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    # ---- encoders / update block / adamw (args, not closures) ----
    enc_ev = BasicEncoder(output_dim=256, norm_fn="instance", dtype=cdt)
    grids = jnp.asarray(rng.normal(size=(6 * b, 25, h, w)).astype(np.float32))
    ev_vars = jax.jit(lambda r, x: enc_ev.init(r, x, False))(
        jax.random.PRNGKey(0), grids)

    def enc_ev_loss(p, x):
        out = enc_ev.apply({"params": p}, x, False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(enc_ev_loss))
    dt, _ = device_timer(g, ev_vars["params"], grids, iters=10, warmup=2)
    emit("enc_ev", dt * 1e3)

    enc_ctx = BasicEncoder(output_dim=256, norm_fn="batch", dtype=cdt)
    ctx_in = jnp.asarray(rng.normal(size=(b, 41, h, w)).astype(np.float32))
    ctx_vars = jax.jit(lambda r, x: enc_ctx.init(r, x, False))(
        jax.random.PRNGKey(0), ctx_in)

    def enc_ctx_loss(p, bs, x):
        out = enc_ctx.apply({"params": p, "batch_stats": bs}, x, False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(enc_ctx_loss))
    dt, _ = device_timer(g, ctx_vars["params"], ctx_vars["batch_stats"],
                         ctx_in, iters=10, warmup=2)
    emit("enc_ctx", dt * 1e3)

    ub = BasicUpdateBlock(param_dim=20, hidden_dim=128, motion_dim=128,
                          dtype=cdt)
    c_corr = 81 * (5 + 3)
    net0 = jnp.asarray(rng.normal(size=(b, 128, h1, w1)).astype(np.float32))
    inp0 = jnp.asarray(rng.normal(size=(b, 128, h1, w1)).astype(np.float32))
    corr_tot = jnp.asarray(rng.normal(size=(b, c_corr, h1, w1))
                           .astype(np.float32))
    pz = jnp.asarray(rng.normal(size=(b, 20, h1, w1)).astype(np.float32))
    ub_vars = jax.jit(lambda r, *a: ub.init(r, *a))(
        jax.random.PRNGKey(0), net0, inp0, corr_tot, pz)

    def ub_loss(p, a0, a1, a2, a3):
        n2, mask, delta = ub.apply({"params": p}, a0, a1, a2, a3)
        return (jnp.sum(n2.astype(jnp.float32) ** 2)
                + jnp.sum(mask.astype(jnp.float32) ** 2)
                + jnp.sum(delta.astype(jnp.float32) ** 2))

    g = jax.jit(jax.value_and_grad(ub_loss, argnums=(0, 1, 3)))
    dt, _ = device_timer(g, ub_vars["params"], net0, inp0, corr_tot, pz,
                         iters=10, warmup=2)
    emit("update_block", dt * 1e3)

    # ---- lookup: fwd-only + formulation variants ----
    levels = [1, 1, 1, 1, 4]
    corr0 = jnp.asarray(rng.normal(size=(5, b, h1 * w1, h1, w1))
                        .astype(np.float32)).astype(cdt)
    coords0 = coords_grid(b, h1, w1)
    flows0 = jnp.asarray(rng.normal(scale=3.0, size=(5, b, 2, h1, w1))
                         .astype(np.float32))

    def lookup_fwd(corr, fl):
        pyr = build_corr_pyramid(corr, levels)
        feat = lookup_corr_pyramid(pyr, coords0[None] + fl, cfg_radius)
        return jnp.sum(feat.astype(jnp.float32) ** 2)

    cfg_radius = 4
    g = jax.jit(lookup_fwd)
    dt, _ = device_timer(g, corr0, flows0, iters=10, warmup=2)
    emit("lookup_fwdonly", dt * 1e3)

    g = jax.jit(jax.value_and_grad(lookup_fwd, argnums=(0, 1)))
    dt, _ = device_timer(g, corr0, flows0, iters=10, warmup=2)
    emit("lookup_fwdbwd", dt * 1e3)

    # grad wrt flows only (d_corr path excluded) — isolates the volume
    # cotangent cost.
    g = jax.jit(jax.value_and_grad(lookup_fwd, argnums=(1,)))
    dt, _ = device_timer(g, corr0, flows0, iters=10, warmup=2)
    emit("lookup_fwd_dflows", dt * 1e3)

    # Variant: right-first association (corr @ w_oh first, lane contraction)
    def window_rightfirst(corr_flat, cx, cy, r):
        n, h2, w2 = corr_flat.shape
        win = 2 * r + 2
        x0 = jnp.floor(cx); y0 = jnp.floor(cy)
        fx = (cx - x0)[:, None, None]; fy = (cy - y0)[:, None, None]
        offs = jnp.arange(-r, r + 2, dtype=jnp.int32)
        rows = y0.astype(jnp.int32)[:, None] + offs[None, :]
        cols = x0.astype(jnp.int32)[:, None] + offs[None, :]
        row_ok = (rows >= 0) & (rows < h2)
        col_ok = (cols >= 0) & (cols < w2)
        dt_ = corr_flat.dtype
        h_oh = ((rows[:, :, None] == jnp.arange(h2, dtype=jnp.int32))
                & row_ok[:, :, None]).astype(dt_)
        w_oh = ((cols[:, None, :] == jnp.arange(w2, dtype=jnp.int32)[:, None])
                & col_ok[:, None, :]).astype(dt_)
        colband = jnp.einsum("nhw,nwj->nhj", corr_flat, w_oh,
                             preferred_element_type=dt_)
        window = jnp.einsum("nih,nhj->nij", h_oh, colband,
                            preferred_element_type=dt_)
        w00 = window[:, :-1, :-1]; w01 = window[:, :-1, 1:]
        w10 = window[:, 1:, :-1]; w11 = window[:, 1:, 1:]
        feat = ((1 - fy) * ((1 - fx) * w00 + fx * w01)
                + fy * ((1 - fx) * w10 + fx * w11))
        return feat.reshape(n, (2 * r + 1) ** 2)

    def lookup_variant(window_fn, corr, fl):
        out_levels = []
        pyr = build_corr_pyramid(corr, levels)
        coords = coords0[None] + fl
        t0 = coords.shape[0]
        for lvl, (tidx, corr_l) in enumerate(pyr):
            tl = len(tidx)
            csel = coords[jnp.asarray(tidx)] / (2.0 ** lvl)
            cx = csel[:, :, 0].reshape(-1)
            cy = csel[:, :, 1].reshape(-1)
            h2, w2 = corr_l.shape[-2:]
            img = corr_l.reshape(-1, h2, w2)
            feat = window_fn(img, cx, cy, 4)
            feat = feat.reshape(tl, b, h1, w1, 81)
            out_levels.append(feat)
        out = jnp.concatenate(out_levels, axis=0)
        out = jnp.transpose(out, (1, 0, 4, 2, 3)).reshape(b, -1, h1, w1)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    import functools
    g = jax.jit(jax.value_and_grad(
        functools.partial(lookup_variant, window_rightfirst),
        argnums=(0, 1)))
    dt, _ = device_timer(g, corr0, flows0, iters=10, warmup=2)
    emit("lookup_rightfirst", dt * 1e3)


if __name__ == "__main__":
    main()
