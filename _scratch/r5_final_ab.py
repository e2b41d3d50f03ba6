"""Round-5 final A/B at the shipped recipe (b6, einsum lookup, per_group
band, s2d conv1, bf16+dots):

  step_expbf16      + interp_exp_dtype='bfloat16' (did not stack on the
                    flow path round 2; 41-bin geometry re-check)
  step_gamma_k3     gamma=0.8, gamma_sample_k=3 at the FINAL recipe
                    (records the shipped affordable-gamma figure)

PYTHONPATH=/root/repo:/root/.axon_site
"""
import dataclasses, functools, json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline import RAFTSplineConfig
    from motionpriorcmax_tpu.training.raft_spline import (
        RAFTTrainConfig, create_raft_state, raft_train_step)
    from motionpriorcmax_tpu.losses import FocusLossConfig
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.utils.profiling import device_timer

    b, h, w = 6, 384, 512
    rng = np.random.default_rng(0)
    cfg = RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                           bezier_degree=10,
                           ev_target_indices=(8, 16, 24, 32, 40),
                           ev_levels=(1, 1, 1, 1, 4), iters=12,
                           corr_dtype="bfloat16", compute_dtype="bfloat16",
                           remat_policy="dots")
    base_loss = FocusLossConfig(
        image_shape=(h, w), num_bins=41, num_knn=32, smooth_weight=0.06,
        smooth_type="on_flow_to_next", polarity_aware_batching=False,
        knn_method="softmax", knn_block_size=512,
        interp_band_dynamic="per_group")

    voxel = jnp.asarray(rng.normal(size=(b, cfg.nbins_total, h, w))
                        .astype(np.float32))
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
    tbatch = {"ev_repr": voxel, "events": events, "lut_cell_ends": cell_ends}
    state = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                              jax.random.PRNGKey(0), (h, w))

    def run_variant(tag, loss_cfg, gamma=None, k=None, iters=8):
        tstep = jax.jit(functools.partial(raft_train_step, cfg=cfg,
                                          loss_cfg=loss_cfg, gamma=gamma,
                                          gamma_sample_k=k))

        def run(s):
            s2, logs = tstep(s, tbatch, jax.random.PRNGKey(3))
            return logs["train_losses/total"]

        dt, out = device_timer(run, state, iters=iters, warmup=2)
        print(json.dumps({"tag": tag, "ms": round(dt * 1e3, 1),
                          "loss": float(np.asarray(out))}), flush=True)

    run_variant("step_expbf16",
                dataclasses.replace(base_loss,
                                    interp_exp_dtype="bfloat16"))
    run_variant("step_gamma_k3", base_loss, gamma=0.8, k=3, iters=5)


if __name__ == "__main__":
    main()
