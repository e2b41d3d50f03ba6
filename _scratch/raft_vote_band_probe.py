"""RAFT self-sup b6 production recipe: vote_band_px re-tune at EVIMO2
geometry (384 rows, 41 bins).  The flow-path default 96 was tuned on
480-row DSEC at 15 bins; the band is a pure perf knob (stragglers take the
full-height pl.when path).  One TPU process, sequential variants."""
import functools, json, time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.models.raft_spline import (RAFTSpline,
                                                        RAFTSplineConfig)
    from motionpriorcmax_tpu.training.raft_spline import (
        RAFTTrainConfig, create_raft_state, raft_train_step)
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.utils.profiling import device_timer

    cfg = RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                           bezier_degree=10,
                           ev_target_indices=(8, 16, 24, 32, 40),
                           ev_levels=(1, 1, 1, 1, 4), iters=12,
                           corr_dtype="bfloat16", compute_dtype="bfloat16",
                           remat_policy="dots")
    h, w, b = 384, 512, 6
    rng = np.random.default_rng(0)
    voxel = jnp.asarray(rng.normal(size=(b, cfg.nbins_total, h, w))
                        .astype(np.float32))
    state0 = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                               jax.random.PRNGKey(0), (h, w))

    m_ev = 1 << 19
    t = rng.uniform(0, 1, (b, m_ev))
    bins = np.clip((t * 41).astype(np.int32), 0, 40).astype(np.float32)
    events_np = np.stack([
        rng.uniform(0, h - 1, (b, m_ev)), rng.uniform(0, w - 1, (b, m_ev)),
        t, rng.integers(0, 2, (b, m_ev)).astype(np.float32), bins,
        np.ones((b, m_ev))], -1).astype(np.float32)
    pairs = [lut_cell_sort(e, (h, w), 41, 4) for e in events_np]
    events = jnp.asarray(np.stack([p[0] for p in pairs]))
    cell_ends = jnp.asarray(np.stack([p[1] for p in pairs]))
    tbatch = {"ev_repr": voxel, "events": events,
              "lut_cell_ends": cell_ends}

    for band in (None, 64, 48):
        loss_cfg = FocusLossConfig(
            image_shape=(h, w), num_bins=41, num_knn=32, smooth_weight=0.06,
            smooth_type="on_flow_to_next", polarity_aware_batching=False,
            knn_method="softmax", knn_block_size=512, vote_band_px=band)
        tstep = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                          loss_cfg=loss_cfg, gamma=None))

        def run(s):
            s2, logs = tstep(s, tbatch, jax.random.PRNGKey(3))
            return logs["train_losses/total"]

        dt, loss = device_timer(run, state0, iters=3, warmup=1)
        print(json.dumps({"vote_band_px": band if band else "auto96",
                          "ms_per_step": round(dt * 1e3, 1),
                          "loss": float(loss)}), flush=True)


if __name__ == "__main__":
    main()
