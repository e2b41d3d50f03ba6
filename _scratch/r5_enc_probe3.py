"""Round-5 encoder probe 3: why did s2d only save 5 ms on fnet_ev (batch 36)
when the isolated ctx conv saved 17?

  c7_native_36 / c7_s2d_36     Conv7x7S2 impls @ [36, 384, 512, 25] fwd+bwd
  c7_s2d_norm_36               s2d + instance norm + relu composed
  c7_native_norm_36            native + instance norm + relu composed

PYTHONPATH=/root/repo:/root/.axon_site
"""
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline.extractor import (Conv7x7S2,
                                                                  _norm)
    from motionpriorcmax_tpu.utils.profiling import device_timer

    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(36, 384, 512, 25)).astype(np.float32)
                    ).astype(cdt)

    def emit(tag, ms):
        print(json.dumps({"tag": tag, "ms": round(ms, 2)}), flush=True)

    def bench(tag, impl, with_norm):
        from flax import linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, xx):
                y = Conv7x7S2(64, dtype=cdt, impl=impl)(xx)
                if with_norm:
                    y = _norm("instance", True, cdt)(y)
                    y = nn.relu(y).astype(cdt)
                return y

        m = M()
        variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)

        def loss(p, xx):
            return jnp.sum(m.apply({"params": p}, xx).astype(jnp.float32)
                           ** 2)

        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        dt, _ = device_timer(g, variables["params"], x, iters=10, warmup=2)
        emit(tag, dt * 1e3)

    bench("c7_native_36", "native", False)
    bench("c7_s2d_36", "s2d", False)
    bench("c7_native_norm_36", "native", True)
    bench("c7_s2d_norm_36", "s2d", True)


if __name__ == "__main__":
    main()
