"""Measure gather-fwd/one-hot-bwd corr windows: fwd12 b6, selfsup train b6,
and remat_iters=False variant. One TPU process."""
import functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline import (RAFTSpline,
                                                        RAFTSplineConfig)
    from motionpriorcmax_tpu.training.raft_spline import (
        RAFTTrainConfig, create_raft_state, raft_train_step)
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.utils.profiling import device_timer

    b, h, w = 6, 384, 512
    rng = np.random.default_rng(0)

    def make(remat_iters=True):
        return RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                                bezier_degree=10,
                                ev_target_indices=(8, 16, 24, 32, 40),
                                ev_levels=(1, 1, 1, 1, 4), iters=12,
                                corr_dtype="bfloat16",
                                remat_iters=remat_iters)

    cfg = make()
    voxel = jnp.asarray(rng.normal(size=(b, cfg.nbins_total, h, w))
                        .astype(np.float32))
    state = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                              jax.random.PRNGKey(0), (h, w))
    model = RAFTSpline(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def emit(tag, ms, extra=None):
        d = {"tag": tag, "ms": round(ms, 1)}
        if extra:
            d.update(extra)
        print(json.dumps(d), flush=True)

    fwd = jax.jit(lambda va, v: model.apply(va, v, test_mode=True))
    dt, _ = device_timer(fwd, variables, voxel, iters=5, warmup=1,
                         scalarized=True)
    emit("fwd12_b6_gatherfwd", dt * 1e3)

    loss_cfg = FocusLossConfig(
        image_shape=(h, w), num_bins=41, num_knn=32, smooth_weight=0.06,
        smooth_type="on_flow_to_next", polarity_aware_batching=False,
        knn_method="softmax", knn_block_size=512)
    m_ev = 1 << 19
    t = rng.uniform(0, 1, (b, m_ev))
    bins = np.clip((t * 41).astype(np.int32), 0, 40).astype(np.float32)
    events = jnp.asarray(np.stack([
        rng.uniform(0, h - 1, (b, m_ev)), rng.uniform(0, w - 1, (b, m_ev)),
        t, rng.integers(0, 2, (b, m_ev)).astype(np.float32), bins,
        np.ones((b, m_ev))], -1).astype(np.float32))
    tbatch = {"ev_repr": voxel, "events": events}

    for remat in (True, False):
        cfg_i = make(remat_iters=remat)
        st = create_raft_state(cfg_i, RAFTTrainConfig(use_scheduler=False),
                               jax.random.PRNGKey(0), (h, w))
        tstep = jax.jit(functools.partial(raft_train_step, cfg=cfg_i,
                                          loss_cfg=loss_cfg))

        def run(s):
            s2, logs = tstep(s, tbatch, jax.random.PRNGKey(3))
            return logs["train_losses/total"]

        try:
            dt, out = device_timer(run, st, iters=3, warmup=1)
            emit(f"trainstep_b6_remat{int(remat)}", dt * 1e3,
                 {"loss": float(out)})
        except Exception as e:  # OOM expected for remat=False maybe
            print(json.dumps({"tag": f"trainstep_b6_remat{int(remat)}",
                              "error": type(e).__name__,
                              "msg": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
