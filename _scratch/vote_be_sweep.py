"""Vote kernel BE x KB x band sweep at the round-4 operating point.

Smaller BE (events per MXU dot) narrows each sub-block's row extent —
compounding with the band — at the cost of more dots; KB re-checked at the
new band.  Standalone fwd+bwd, b8 x 1M, cell-sorted + scale-5 noise.
"""
import json
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from motionpriorcmax_tpu.data.host_ops import lut_cell_sort
    from motionpriorcmax_tpu.ops.pallas import iwe_vote as iv
    from motionpriorcmax_tpu.utils.profiling import device_timer

    h, w, nbins, b, m, s = 480, 640, 15, 8, 1 << 20, 4
    rng = np.random.default_rng(0)
    y = rng.uniform(0, h - 1, (b, m)); x = rng.uniform(0, w - 1, (b, m))
    t = rng.uniform(0, 1, (b, m))
    p = rng.integers(0, 2, (b, m)).astype(np.float32)
    bi = np.clip((t * nbins).astype(np.int32), 0, nbins - 1)
    ev = np.stack([y, x, t, p, bi, np.ones((b, m))], -1).astype(np.float32)
    prs = [lut_cell_sort(e, (h, w), nbins, s) for e in ev]
    evj = jnp.asarray(np.stack([q[0] for q in prs]))
    coords = evj[..., :2] + jnp.asarray(
        rng.normal(scale=5.0, size=(b, m, 2)).astype(np.float32))
    wgt = evj[..., 5]

    ref_grad = None
    obe, okb = iv.BE, iv.KB
    try:
        for be, kb, band in ((1024, 4, 96), (512, 8, 96), (512, 4, 64),
                             (512, 8, 64), (2048, 2, 96), (1024, 2, 96),
                             (1024, 8, 96)):
            iv.BE, iv.KB = be, kb
            fg = jax.jit(jax.grad(lambda c: jnp.sum(
                iv.iwe_vote_pallas_sorted(c, wgt, h, w, band) ** 2)))
            got = np.asarray(fg(coords))
            if ref_grad is None:
                ref_grad = got
            err = float(np.abs(got - ref_grad).max())
            dtg, _ = device_timer(fg, coords, iters=5, warmup=1)
            print(json.dumps({"BE": be, "KB": kb, "band": band,
                              "fwd_bwd_ms": round(dtg * 1e3, 1),
                              "grad_maxerr": err}), flush=True)
    finally:
        iv.BE, iv.KB = obe, okb


if __name__ == "__main__":
    main()
