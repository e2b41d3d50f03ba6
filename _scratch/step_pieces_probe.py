"""Direct timing of the remaining b8x1M step pieces: LUT-gather fwd
(pallas vs xla), banded vote fwd / fwd+grad, blur+objective, AdamW."""
import functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops import events as ev_ops
    from motionpriorcmax_tpu.ops import gradients as grad_ops
    from motionpriorcmax_tpu.ops.pallas.iwe_vote import iwe_vote_pallas_sorted
    from motionpriorcmax_tpu.ops.pallas.lut_gather import lut_gather_sorted
    from motionpriorcmax_tpu.utils.profiling import device_timer

    h, w, nbins, b, m, s = 480, 640, 15, 8, 1 << 20, 4
    hq, wq = h // s, w // s
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    events = np.stack([y, x, t, p, bi, np.ones((b, m))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), nbins, s) for e in events]
    ev = jnp.asarray(np.stack([q[0] for q in pairs]))

    def emit(tag, ms):
        print(json.dumps({"tag": tag, "ms": round(ms, 1)}), flush=True)

    it = ev[..., 4].astype(jnp.int32)
    iy = jnp.floor(ev[..., 0] / s).astype(jnp.int32)
    ix = jnp.floor(ev[..., 1] / s).astype(jnp.int32)
    rows = jnp.clip(iy, 0, hq - 1) * nbins + jnp.clip(it, 0, nbins - 1)
    cols = jnp.clip(ix, 0, wq - 1)
    lut = jnp.asarray(rng.normal(size=(b, hq * nbins, wq, 2))
                      .astype(np.float32))

    g_pal = jax.jit(functools.partial(lut_gather_sorted,
                                      band_rows=nbins * 2 + 2))
    dt, _ = device_timer(g_pal, lut, rows, cols, iters=5, warmup=1)
    emit("lut_gather_pallas_fwd", dt * 1e3)

    g_xla = jax.jit(lambda l, r, c: jnp.take_along_axis(
        l.reshape(b, -1, 2), (r * wq + c)[..., None], axis=1))
    dt, _ = device_timer(g_xla, lut, rows, cols, iters=5, warmup=1)
    emit("lut_gather_xla_fwd", dt * 1e3)

    coords = ev[..., :2]
    wgt = ev[..., 5]
    vote = jax.jit(lambda c, g: iwe_vote_pallas_sorted(c, g, h, w, 144))
    dt, _ = device_timer(vote, coords, wgt, iters=5, warmup=1)
    emit("vote_sorted144_fwd", dt * 1e3)

    vote_g = jax.jit(jax.grad(
        lambda c: jnp.sum(iwe_vote_pallas_sorted(c, wgt, h, w, 144) ** 2)))
    dt, _ = device_timer(vote_g, coords, iters=5, warmup=1)
    emit("vote_sorted144_fwd_bwd", dt * 1e3)

    iwes = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))
    obj = jax.jit(jax.grad(lambda im: jnp.sum(
        1.0 / (grad_ops.gradient_magnitude(
            ev_ops.gaussian_blur_3x3(im, sigma=1.0)) + 1e-6))))
    dt, _ = device_timer(obj, iwes, iters=5, warmup=1)
    emit("blur_objective_fwd_bwd", dt * 1e3)

    from motionpriorcmax_tpu.training import (TrajectoryNetConfig,
                                              create_train_state)
    cfg = TrajectoryNetConfig(image_shape=(h, w), num_bins=nbins,
                              num_basis=1, patch_size=4,
                              basis_type="polynomial",
                              compute_dtype="bfloat16")
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    zeros = jax.tree.map(jnp.zeros_like, state.params)
    upd = jax.jit(lambda st: st.apply_gradients(grads=zeros))
    dt, _ = device_timer(upd, state, iters=5, warmup=1)
    emit("adamw_update", dt * 1e3)


if __name__ == "__main__":
    main()
