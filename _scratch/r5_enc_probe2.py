"""Round-5 encoder probe 2: is the strided-conv backward the encoder wall?

Pieces (bf16, iters=10, grads wrt params AND input):
  ctx_nonorm_fwdonly   norm-free context encoder forward only
  conv7s2              Conv(64, 7x7, s2) @ [6, 384, 512, 41]   fwd+bwd
  conv7s2_fwd          same forward-only
  conv4s1_s2d          Conv(64, 4x4, s1) @ [6, 192, 256, 164]  (s2d form)
  conv3s2              Conv(96, 3x3, s2) @ [6, 192, 256, 64]   fwd+bwd
  conv2s1_s2d          Conv(96, 2x2, s1) @ [6, 96, 128, 256]   (s2d form)
  conv3s1_ref          Conv(96, 3x3, s1) @ [6, 96, 128, 96]    (post-stride
                       reference shape: what layer2's non-strided conv costs)
  enc36_conv7s2        the same at the fnet_ev batch (36)

PYTHONPATH=/root/repo:/root/.axon_site
"""
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from motionpriorcmax_tpu.models.raft_spline.extractor import BasicEncoder
    from motionpriorcmax_tpu.utils.profiling import device_timer

    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16

    def emit(tag, ms):
        print(json.dumps({"tag": tag, "ms": round(ms, 2)}), flush=True)

    def bench_conv(tag, feats, kernel, strides, x_shape, fwd_only=False):
        conv = nn.Conv(feats, kernel, strides=strides, dtype=cdt)
        x = jnp.asarray(rng.normal(size=x_shape).astype(np.float32)
                        ).astype(cdt)
        variables = jax.jit(conv.init)(jax.random.PRNGKey(0), x)

        def loss(p, xx):
            out = conv.apply({"params": p}, xx)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        if fwd_only:
            g = jax.jit(loss)
        else:
            g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        dt, _ = device_timer(g, variables["params"], x, iters=10, warmup=2)
        emit(tag, dt * 1e3)

    # Norm-free context encoder forward only.
    enc = BasicEncoder(output_dim=256, norm_fn="none", dtype=cdt)
    ctx_in = jnp.asarray(rng.normal(size=(6, 41, 384, 512))
                         .astype(np.float32))
    variables = jax.jit(lambda r, x: enc.init(r, x, False))(
        jax.random.PRNGKey(0), ctx_in)
    f = jax.jit(lambda p, x: jnp.sum(
        enc.apply({"params": p}, x, False).astype(jnp.float32) ** 2))
    dt, _ = device_timer(f, variables["params"], ctx_in, iters=10, warmup=2)
    emit("ctx_nonorm_fwdonly", dt * 1e3)

    bench_conv("conv7s2", 64, (7, 7), 2, (6, 384, 512, 41))
    bench_conv("conv7s2_fwd", 64, (7, 7), 2, (6, 384, 512, 41),
               fwd_only=True)
    bench_conv("conv4s1_s2d", 64, (4, 4), 1, (6, 192, 256, 164))
    bench_conv("conv3s2", 96, (3, 3), 2, (6, 192, 256, 64))
    bench_conv("conv2s1_s2d", 96, (2, 2), 1, (6, 96, 128, 256))
    bench_conv("conv3s1_ref", 96, (3, 3), 1, (6, 96, 128, 96))
    bench_conv("enc36_conv7s2", 64, (7, 7), 2, (36, 384, 512, 25))


if __name__ == "__main__":
    main()
