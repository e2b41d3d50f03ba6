"""Isolate RAFT-Spline b6 step parts: fwd iters slope, corr lookup alone,
update block alone, encoder+volume intercept. One TPU process."""
import functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline import (RAFTSpline,
                                                        RAFTSplineConfig)
    from motionpriorcmax_tpu.models.raft_spline.corr import (
        build_corr_pyramid, compute_corr_volume, lookup_corr_pyramid)
    from motionpriorcmax_tpu.training.raft_spline import (RAFTTrainConfig,
                                                          create_raft_state)
    from motionpriorcmax_tpu.utils.profiling import device_timer

    h, w, b = 384, 512, 6
    rng = np.random.default_rng(0)
    cfg = RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                           bezier_degree=10,
                           ev_target_indices=(8, 16, 24, 32, 40),
                           ev_levels=(1, 1, 1, 1, 4), iters=12,
                           corr_dtype="bfloat16")
    voxel = jnp.asarray(rng.normal(size=(b, cfg.nbins_total, h, w))
                        .astype(np.float32))
    state = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                              jax.random.PRNGKey(0), (h, w))
    model = RAFTSpline(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def emit(tag, ms):
        print(json.dumps({"tag": tag, "ms": round(ms, 2)}), flush=True)

    # fwd at 4 iters (with fwd12 = 178.6 known -> slope/intercept)
    fwd4 = jax.jit(lambda va, v: model.apply(va, v, test_mode=True, iters=4))
    dt, _ = device_timer(fwd4, variables, voxel, iters=5, warmup=1,
                         scalarized=True)
    emit("fwd4_testmode", dt * 1e3)

    # corr volume build + pyramid alone (bf16)
    h8, w8 = h // 8, w // 8
    fmap1 = jnp.asarray(rng.normal(size=(b, 256, h8, w8)).astype(np.float32))
    fmap2 = jnp.asarray(rng.normal(size=(5, b, 256, h8, w8)).astype(np.float32))

    def vol(f1, f2):
        c = compute_corr_volume(f1, f2).astype(jnp.bfloat16)
        return build_corr_pyramid(c, list(cfg.ev_levels))

    volj = jax.jit(vol)
    dt, pyr = device_timer(volj, fmap1, fmap2, iters=5, warmup=1,
                           scalarized=True)
    emit("corr_volume_plus_pyramid", dt * 1e3)

    # one corr-pyramid lookup (the per-iteration hot op), x12 = loop share
    pyramid = volj(fmap1, fmap2)
    coords = jnp.asarray(
        rng.uniform(0, min(h8, w8) - 1, (5, b, 2, h8, w8)).astype(np.float32))
    look = jax.jit(lambda p, c: lookup_corr_pyramid(p, c, cfg.radius))
    dt, _ = device_timer(look, pyramid, coords, iters=10, warmup=1,
                         scalarized=True)
    emit("corr_lookup_once", dt * 1e3)

    # update block alone
    net = jnp.asarray(rng.normal(size=(b, 128, h8, w8)).astype(np.float32))
    inp = jnp.asarray(rng.normal(size=(b, 128, h8, w8)).astype(np.float32))
    tot_ch = sum((2 * cfg.radius + 1) ** 2 * lv for lv in cfg.ev_levels)
    corr_tot = jnp.asarray(
        rng.normal(size=(b, tot_ch, h8, w8)).astype(np.float32))
    params0 = jnp.asarray(
        rng.normal(size=(b, cfg.param_dim, h8, w8)).astype(np.float32))
    ub = jax.jit(lambda va, n, i, c, p: model.apply(
        va, n, i, c, p, method=lambda m, *a: m.update_block(*a)))
    dt, _ = device_timer(ub, variables, net, inp, corr_tot, params0,
                         iters=10, warmup=1, scalarized=True)
    emit("update_block_once", dt * 1e3)


if __name__ == "__main__":
    main()
