"""Dissect the b6 self-sup RAFT-Spline train step at the round-4 bf16
operating point (736.6 ms): iters sweep for the per-iteration slope +
intercept.  One TPU process."""
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

    def make(iters):
        return RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                                bezier_degree=10,
                                ev_target_indices=(8, 16, 24, 32, 40),
                                ev_levels=(1, 1, 1, 1, 4), iters=iters,
                                corr_dtype="bfloat16",
                                compute_dtype="bfloat16",
                                remat_policy="dots")

    cfg = make(12)
    voxel = jnp.asarray(rng.normal(size=(b, cfg.nbins_total, h, w))
                        .astype(np.float32))
    state = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                              jax.random.PRNGKey(0), (h, w))
    model = RAFTSpline(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

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

    def emit(tag, ms):
        print(json.dumps({"tag": tag, "ms": round(ms, 1)}), flush=True)

    # 12-iter test-mode forward (no loss, no grad)
    fwd = jax.jit(lambda va, v: model.apply(va, v, test_mode=True))
    dt, _ = device_timer(fwd, variables, voxel, iters=3, warmup=1)
    emit("fwd12_testmode", dt * 1e3)

    # full train step at iters = 12 / 4 (GRU-scan share from the slope)
    for it in (12, 4, 1):
        cfg_i = make(it)
        st = create_raft_state(cfg_i, RAFTTrainConfig(use_scheduler=False),
                               jax.random.PRNGKey(0), (h, w))
        tstep = jax.jit(functools.partial(raft_train_step, cfg=cfg_i,
                                          loss_cfg=loss_cfg))

        def run(s):
            s2, logs = tstep(s, tbatch, jax.random.PRNGKey(3))
            return logs["train_losses/total"]

        dt, _ = device_timer(run, st, iters=3, warmup=1)
        emit(f"trainstep_it{it}", dt * 1e3)


if __name__ == "__main__":
    main()
