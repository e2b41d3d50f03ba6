"""Round-5 encoder dissection: why are BasicEncoder fwd+bwd times ~2-9x
their conv roofline?  (enc_ev 89.7 ms, enc_ctx 61.3 ms standalone; conv
FLOPs predict ~36 / ~7 ms.)

Ablations (all b6-equivalent inputs, bf16 compute, iters=10):
  ev_instance      baseline [36, 25, 384, 512] instance norm
  ev_nonorm        norm_fn='none' — isolates the norm cost
  ev_f32           f32 compute (is bf16 helping at all?)
  ctx_batch        baseline [6, 41, 384, 512] batch norm (frozen stats)
  ctx_nonorm       norm-free
  ctx_nhwc         NHWC in/out (transpose wrapper cost)

PYTHONPATH=/root/repo:/root/.axon_site
"""
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.models.raft_spline.extractor import BasicEncoder
    from motionpriorcmax_tpu.utils.profiling import device_timer

    rng = np.random.default_rng(0)
    h, w = 384, 512

    def emit(tag, ms):
        print(json.dumps({"tag": tag, "ms": round(ms, 2)}), flush=True)

    def bench(tag, norm, dtype, x, nhwc=False):
        enc = BasicEncoder(output_dim=256, norm_fn=norm, dtype=dtype)
        variables = jax.jit(lambda r, xx: enc.init(r, xx, False))(
            jax.random.PRNGKey(0), x)

        def loss(p, xx):
            va = {"params": p}
            if "batch_stats" in variables:
                va["batch_stats"] = variables["batch_stats"]
            out = enc.apply(va, xx, False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.value_and_grad(loss))
        dt, _ = device_timer(g, variables["params"], x, iters=10, warmup=2)
        emit(tag, dt * 1e3)

    ev_in = jnp.asarray(rng.normal(size=(36, 25, h, w)).astype(np.float32))
    ctx_in = jnp.asarray(rng.normal(size=(6, 41, h, w)).astype(np.float32))

    bench("ev_instance", "instance", jnp.bfloat16, ev_in)
    bench("ev_nonorm", "none", jnp.bfloat16, ev_in)
    bench("ev_f32", "instance", jnp.float32, ev_in)
    bench("ctx_batch", "batch", jnp.bfloat16, ctx_in)
    bench("ctx_nonorm", "none", jnp.bfloat16, ctx_in)


if __name__ == "__main__":
    main()
