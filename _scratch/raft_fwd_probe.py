"""Scalarized-sync RAFT 12-iter test-mode forward timing at b1/b6."""
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline import (RAFTSpline,
                                                        RAFTSplineConfig)
    from motionpriorcmax_tpu.training.raft_spline import (RAFTTrainConfig,
                                                          create_raft_state)
    from motionpriorcmax_tpu.utils.profiling import device_timer

    h, w = 384, 512
    rng = np.random.default_rng(0)
    for b, cd in ((1, "float32"), (6, "bfloat16")):
        cfg = RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                               bezier_degree=10,
                               ev_target_indices=(8, 16, 24, 32, 40),
                               ev_levels=(1, 1, 1, 1, 4), iters=12,
                               corr_dtype=cd)
        voxel = jnp.asarray(rng.normal(size=(b, cfg.nbins_total, h, w))
                            .astype(np.float32))
        state = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                                  jax.random.PRNGKey(0), (h, w))
        model = RAFTSpline(cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fwd = jax.jit(lambda va, v: model.apply(va, v, test_mode=True))
        for sync in ("element", "sum"):
            dt, _ = device_timer(fwd, variables, voxel, iters=5, warmup=1,
                                 sync=sync)
            print(json.dumps({"tag": f"fwd12_b{b}_{cd}_{sync}",
                              "ms": round(dt * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
