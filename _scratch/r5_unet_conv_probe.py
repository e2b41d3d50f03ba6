"""Round-5 UNet conv probe: localize the full-res 64-channel conv
inefficiency (inc 16% / down1 22% / up4 27% of peak vs up3's 66%).

All convs 3x3 s1 pad1 bf16, b8, value_and_grad wrt (params, input) unless
split noted:
  c64_480      64->64  @480x640  fwd+bwd       (inc conv2 / up4 conv2)
  c64_480_fwd  forward only
  c64_480_din  fwd + d_input only (params grad excluded)
  c64_480_dw   fwd + d_params only (input grad excluded)
  c128_240     128->128 @240x320 fwd+bwd       (down1 conv2)
  c128_240_dw  fwd + d_params only
  c256_120     256->256 @120x160 fwd+bwd       (down2 conv2 — the 41% tier)
  cwide_240    256->128 @240x320 fwd+bwd       (up3 conv1 tier, 66% ref)

PYTHONPATH=/root/repo:/root/.axon_site
"""
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from motionpriorcmax_tpu.utils.profiling import device_timer

    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16
    b = 8

    def emit(tag, ms, gflop):
        tf = gflop / ms
        print(json.dumps({"tag": tag, "ms": round(ms, 2),
                          "eff_tflops": round(tf, 1),
                          "pct_peak": round(100 * tf / 197.0, 1)}),
              flush=True)

    def bench(tag, cin, cout, h, w, mode="full"):
        conv = nn.Conv(cout, (3, 3), padding=1, dtype=cdt)
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32)
                        ).astype(cdt)
        variables = jax.jit(conv.init)(jax.random.PRNGKey(0), x)

        def loss(p, xx):
            out = conv.apply({"params": p}, xx)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        if mode == "fwd":
            g = jax.jit(loss)
            mult = 1.0
        elif mode == "din":
            g = jax.jit(jax.value_and_grad(loss, argnums=1))
            mult = 2.0
        elif mode == "dw":
            g = jax.jit(jax.value_and_grad(loss, argnums=0))
            mult = 2.0
        else:
            g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
            mult = 3.0
        dt, _ = device_timer(g, variables["params"], x, iters=10, warmup=2)
        gflop = mult * b * h * w * 9 * cin * cout * 2 / 1e9
        emit(tag, dt * 1e3, gflop)

    bench("c64_480", 64, 64, 480, 640)
    bench("c64_480_fwd", 64, 64, 480, 640, "fwd")
    bench("c64_480_din", 64, 64, 480, 640, "din")
    bench("c64_480_dw", 64, 64, 480, 640, "dw")
    bench("c128_240", 128, 128, 240, 320)
    bench("c128_240_dw", 128, 128, 240, 320, "dw")
    bench("c256_120", 256, 256, 120, 160)
    bench("cwide_240", 256, 128, 240, 320)


if __name__ == "__main__":
    main()
