"""Round-5 UNet per-layer audit at the production flow operating point
(b8, 480x640, 15 bins, bf16 compute, widths 64..1024, out 2).

Times each stage standalone fwd+bwd (value_and_grad of sum^2 wrt params AND
input — the input cotangent is what the real backward pays between stages)
and reports achieved TFLOP/s on NOMINAL (unpadded) FLOPs vs the v5e bf16
peak (~197 TFLOP/s), plus the whole-net fwd+bwd for cross-check.

Experiments bolted on:
  whole_unet            the production net (reference point ~120.7 ms)
  inc_pad16             inc with the 15-channel input zero-padded to 16

One TPU process.  PYTHONPATH=/root/repo:/root/.axon_site
"""
import json
import numpy as np


def stage_flops(h, w, cin, cout):
    return h * w * 9 * cin * cout * 2


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from motionpriorcmax_tpu.models.unet import (ConvTranspose2x2, DoubleConv,
                                                 Down, Up, UNet)
    from motionpriorcmax_tpu.utils.profiling import device_timer

    b, h, w = 8, 480, 640
    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def bench_mod(tag, mod, x_shape, flops_fwd, extra_args=()):
        x = jnp.asarray(rng.normal(size=x_shape).astype(np.float32)
                        ).astype(cdt)
        args = tuple(
            jnp.asarray(rng.normal(size=s).astype(np.float32)).astype(cdt)
            for s in extra_args)
        variables = jax.jit(
            lambda r, xx, *aa: mod.init(r, xx, *aa))(
                jax.random.PRNGKey(0), x, *args)

        def loss(p, xx, *aa):
            va = dict(variables)
            va = {**va, "params": p}
            out = mod.apply(va, xx, *aa,
                            mutable=[k for k in va if k != "params"])[0]
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        dt_s, _ = device_timer(g, variables["params"], x, *args,
                               iters=10, warmup=2)
        tf = 3.0 * flops_fwd * b / dt_s / 1e12
        emit(tag=tag, ms=round(dt_s * 1e3, 2), nominal_tflops=round(tf, 1),
             pct_bf16_peak=round(100 * tf / 197.0, 1))
        return dt_s

    # Whole net first (reference point).
    unet = UNet(n_channels=15, n_classes=2, dtype=cdt)
    x0 = jnp.asarray(rng.normal(size=(b, 15, h, w)).astype(np.float32))
    uvars = jax.jit(lambda r, xx: unet.init(r, xx, train=True))(
        jax.random.PRNGKey(0), x0)

    def uloss(p, xx):
        out, _ = unet.apply({"params": p,
                             "batch_stats": uvars["batch_stats"]},
                            xx, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(uloss, argnums=(0, 1)))
    dt_s, _ = device_timer(g, uvars["params"], x0, iters=10, warmup=2)
    total_fwd = (stage_flops(h, w, 15, 64) + stage_flops(h, w, 64, 64)
                 + sum(stage_flops(h >> s, w >> s, 64 << (s - 1), 64 << s)
                       + stage_flops(h >> s, w >> s, 64 << s, 64 << s)
                       for s in (1, 2, 3, 4))
                 + sum((h >> s) * (w >> s) * (64 << s) * (128 << s) * 2 // 2
                       + stage_flops(h >> (s - 1), w >> (s - 1), 64 << s,
                                     32 << s)
                       + stage_flops(h >> (s - 1), w >> (s - 1), 32 << s,
                                     32 << s)
                       for s in (4, 3, 2, 1))
                 + h * w * 64 * 2 * 2)
    emit(tag="whole_unet", ms=round(dt_s * 1e3, 2),
         nominal_tflops=round(3 * total_fwd * b / dt_s / 1e12, 1),
         pct_bf16_peak=round(100 * 3 * total_fwd * b / dt_s / 1e12 / 197, 1))

    # Per-stage (train=False to skip BN mutability; stats cost is tiny).
    specs = [
        ("inc", DoubleConv(64, dtype=cdt, use_running_average=True),
         (b, h, w, 15),
         stage_flops(h, w, 15, 64) + stage_flops(h, w, 64, 64), ()),
        ("down1", Down(128, dtype=cdt, use_running_average=True),
         (b, h, w, 64),
         stage_flops(h // 2, w // 2, 64, 128)
         + stage_flops(h // 2, w // 2, 128, 128), ()),
        ("down2", Down(256, dtype=cdt, use_running_average=True),
         (b, h // 2, w // 2, 128),
         stage_flops(h // 4, w // 4, 128, 256)
         + stage_flops(h // 4, w // 4, 256, 256), ()),
        ("down3", Down(512, dtype=cdt, use_running_average=True),
         (b, h // 4, w // 4, 256),
         stage_flops(h // 8, w // 8, 256, 512)
         + stage_flops(h // 8, w // 8, 512, 512), ()),
        ("down4", Down(1024, dtype=cdt, use_running_average=True),
         (b, h // 8, w // 8, 512),
         stage_flops(h // 16, w // 16, 512, 1024)
         + stage_flops(h // 16, w // 16, 1024, 1024), ()),
        ("up1", Up(512, dtype=cdt, use_running_average=True),
         (b, h // 16, w // 16, 1024),
         (h // 16) * (w // 16) * 1024 * 2048 * 2
         + stage_flops(h // 8, w // 8, 1024, 512)
         + stage_flops(h // 8, w // 8, 512, 512),
         ((b, h // 8, w // 8, 512),)),
        ("up2", Up(256, dtype=cdt, use_running_average=True),
         (b, h // 8, w // 8, 512),
         (h // 8) * (w // 8) * 512 * 1024 * 2
         + stage_flops(h // 4, w // 4, 512, 256)
         + stage_flops(h // 4, w // 4, 256, 256),
         ((b, h // 4, w // 4, 256),)),
        ("up3", Up(128, dtype=cdt, use_running_average=True),
         (b, h // 4, w // 4, 256),
         (h // 4) * (w // 4) * 256 * 512 * 2
         + stage_flops(h // 2, w // 2, 256, 128)
         + stage_flops(h // 2, w // 2, 128, 128),
         ((b, h // 2, w // 2, 128),)),
        ("up4", Up(64, dtype=cdt, use_running_average=True),
         (b, h // 2, w // 2, 128),
         (h // 2) * (w // 2) * 128 * 256 * 2
         + stage_flops(h, w, 128, 64) + stage_flops(h, w, 64, 64),
         ((b, h, w, 64),)),
    ]
    stage_ms = {}
    for tag, mod, xs, fl, extra in specs:
        stage_ms[tag] = bench_mod(tag, mod, xs, fl, extra) * 1e3

    emit(tag="stage_sum", ms=round(sum(stage_ms.values()), 2))

    # Experiment: pad the 15-channel input to 16 before inc.
    inc16 = DoubleConv(64, dtype=cdt, use_running_average=True)
    bench_mod("inc_pad16", inc16, (b, h, w, 16),
              stage_flops(h, w, 15, 64) + stage_flops(h, w, 64, 64), ())


if __name__ == "__main__":
    main()
