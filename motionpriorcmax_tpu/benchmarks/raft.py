"""RAFT-Spline benchmark: steady-state forward at EVIMO2 scale.

Run:  python -m motionpriorcmax_tpu.benchmarks.raft
Prints JSON lines with forward latency (test mode, 12 iters) and the
validation-step latency including the metric suite.
"""

from __future__ import annotations

import functools
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ..models.raft_spline import RAFTSpline, RAFTSplineConfig
    from ..training.raft_spline import (RAFTTrainConfig, create_raft_state,
                                        raft_validation_step)
    from ..utils.profiling import device_timer

    cfg = RAFTSplineConfig(nbins_context=41, nbins_correlation=25,
                           bezier_degree=10,
                           ev_target_indices=(8, 16, 24, 32, 40),
                           ev_levels=(1, 1, 1, 1, 4), iters=12)
    h, w, b = 384, 512, 1
    rng = np.random.default_rng(0)
    voxel = jnp.asarray(rng.normal(size=(b, cfg.nbins_total, h, w))
                        .astype(np.float32))

    state = create_raft_state(cfg, RAFTTrainConfig(use_scheduler=False),
                              jax.random.PRNGKey(0), (h, w))
    model = RAFTSpline(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    fwd = jax.jit(lambda va, v: model.apply(va, v, test_mode=True))
    dt, _ = device_timer(fwd, variables, voxel, iters=5, warmup=1)
    print(json.dumps({"metric": "raft_spline_fwd_12it_evimo2_ms",
                      "value": round(dt * 1e3, 1), "batch": b}))

    m = 6
    batch = {
        "ev_repr": voxel,
        "flow": jnp.asarray(rng.normal(size=(b, m, 2, h, w)).astype(np.float32)),
        "flow_valid": jnp.asarray(rng.uniform(size=(b, m, h, w)) > 0.3),
    }
    ts = tuple(np.linspace(0, 1, m + 1)[1:].tolist())
    step = jax.jit(functools.partial(raft_validation_step, cfg=cfg,
                                     flow_timestamps=ts))
    dt, _ = device_timer(step, state, batch, iters=3, warmup=1)
    print(json.dumps({"metric": "raft_spline_valstep_ms",
                      "value": round(dt * 1e3, 1), "batch": b}))


if __name__ == "__main__":
    main()
