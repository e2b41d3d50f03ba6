"""RAFT-Spline training/validation steps (reference C9 + the missing trainer).

The reference RAFTSplineModule (src/modules/raft_spline.py) is validation-only
(no training_step in the snapshot); here both paths exist:

  raft_validation_step — reference :87-215: forward in test mode, evaluate
    the upsampled curve at every GT flow timestamp, compute plain / masked /
    ev-masked single+multi metrics and the linear-assumption baseline.
  raft_train_step — the 'ours-selfsup' composition (experiment yaml
    raft-spline_evimo2-300ms_ours-selfsup_Tab2L5.yaml): RAFT-Spline forward +
    FocusLoss on the predicted curves, exactly as the flow path does for the
    UNet (SURVEY.md §7.2 step 5).

Optimizer: AdamW(lr, weight_decay) + optional OneCycle linear schedule
(reference configure_optimizers :217-265).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..losses import FocusLossConfig, focus_loss, get_reconstruction_times
from ..metrics.core import (ae_masked, ae_masked_multi, epe_masked,
                            epe_masked_multi, n_pixel_error_masked,
                            predictions_from_lin_assumption,
                            trajectory_flow_metrics)
from ..models.raft_spline import RAFTSpline, RAFTSplineConfig
from ..models.raft_spline.curves import (curve_flow_from_reference,
                                         cvx_upsample)
from ..ops.grids import tile_mask_positions


@dataclasses.dataclass(frozen=True)
class RAFTTrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    use_scheduler: bool = True
    total_steps: int = 100000
    pct_start: float = 0.05
    # Gradient accumulation (optax.MultiSteps): apply the optimizer every N
    # train steps, averaging gradients in between.  N microbatches of size
    # B == one update at effective batch N*B — the single-chip route to the
    # reference's batch-6 config (batch 3 fits one v5e; see ROADMAP ladder).
    accumulate_steps: int = 1


class RAFTTrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(tc: RAFTTrainConfig):
    """AdamW + OneCycle (linear anneal, cycle_momentum=False) — reference
    :227-265 uses total_steps+100 and per-step updates."""
    import optax

    if not tc.use_scheduler:
        tx = optax.adamw(tc.learning_rate, weight_decay=tc.weight_decay)
    else:
        sched = optax.linear_onecycle_schedule(
            transition_steps=tc.total_steps + 100,
            peak_value=tc.learning_rate,
            pct_start=tc.pct_start,
            pct_final=1.0,
        )
        tx = optax.adamw(sched, weight_decay=tc.weight_decay)
    if tc.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tc.accumulate_steps)
    return tx


def create_raft_state(cfg: RAFTSplineConfig, tc: RAFTTrainConfig,
                      rng: jax.Array, image_hw: Tuple[int, int] = (384, 512)
                      ) -> RAFTTrainState:
    model = RAFTSpline(cfg)
    h, w = image_hw
    dummy = jnp.zeros((1, cfg.nbins_total, h, w), jnp.float32)
    dummy_imgs = ([jnp.zeros((1, 3, h, w), jnp.float32)] * 2
                  if cfg.use_boundary_images else None)
    # jit the init: eager init dispatches every op individually, which is
    # minutes of round-trips on a tunneled TPU (~240 s at EVIMO2 scale).
    init = jax.jit(lambda r, v, im: RAFTSpline(cfg).init(r, v, im,
                                                         test_mode=True))
    variables = init(rng, dummy, dummy_imgs)
    return RAFTTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_optimizer(tc),
        batch_stats=variables.get("batch_stats", {}),
    )


def _forward(cfg: RAFTSplineConfig, params, batch_stats, voxel, images,
             test_mode: bool, train: bool, return_sequences: bool = False):
    model = RAFTSpline(cfg)
    variables = {"params": params, "batch_stats": batch_stats}
    if train and batch_stats:
        out, mutated = model.apply(variables, voxel, images,
                                   test_mode=test_mode, train=True,
                                   return_sequences=return_sequences,
                                   mutable=["batch_stats"])
        return out, mutated["batch_stats"]
    out = model.apply(variables, voxel, images, test_mode=test_mode,
                      return_sequences=return_sequences)
    return out, batch_stats


def raft_validation_step(state: RAFTTrainState, batch: Dict[str, jnp.ndarray],
                         cfg: RAFTSplineConfig,
                         flow_timestamps: Tuple[float, ...],
                         min_traj_len: float | None = None,
                         max_traj_len: float | None = None,
                         ) -> Dict[str, jnp.ndarray]:
    """Evaluate the curve at each GT timestamp; compute the metric suite.

    Args:
      batch: 'ev_repr' [B, nbins_total, H, W], 'flow' [B, M, 2, H, W]
        (channel 0 = x, EVIMO2 convention), optional 'flow_valid' [B, M, H, W],
        optional 'img' pair.
      flow_timestamps: static GT timestamps (EVIMO2: linspace(0,1,M+1)[1:]).
      min_traj_len, max_traj_len: optional GT-arc-length gate for the multi
        metrics (reference EPE_MULTI/FLOW_METRICS_MULTI options,
        src/modules/utils.py:357-393, 496-511).

    Returns:
      dict of metric (value, weight) pairs keyed like the reference printout
      (val/masked_TEPE etc., scripts/trajectory_inference.py:91-97).
    """
    from ..ops.padding import pad_to_multiple, requires_padding, unpad

    ev_repr = batch["ev_repr"]
    images = batch.get("img")
    # Pad H, W to multiples of 8 around the forward, as the reference does
    # for every val batch (src/modules/raft_spline.py:114-120, 136-154);
    # predictions are pointwise in the upsampled curve params, so unpadding
    # params_up == unpadding each predicted flow.
    h0, w0 = ev_repr.shape[-2:]
    padded = requires_padding(h0, w0, 8)
    if padded:
        ev_repr = pad_to_multiple(ev_repr, 8)
        if images is not None:
            images = [pad_to_multiple(x, 8) for x in images]
    (_, params_up), _ = _forward(cfg, state.params, state.batch_stats,
                                 ev_repr, images, test_mode=True, train=False)
    if padded:
        params_up = unpad(params_up, h0, w0, 8)

    ts = jnp.asarray(flow_timestamps, jnp.float32)
    preds = curve_flow_from_reference(params_up, ts, cfg.curve_type)
    # preds: [M, B, 2, H, W] — channel order (x, y) matches EVIMO2 GT.
    gt = jnp.moveaxis(batch["flow"], 1, 0)  # [M, B, 2, H, W]

    event_mask = jnp.any(jnp.abs(batch["ev_repr"]) > 0, axis=1)  # [B, H, W]
    flow_valid = batch.get("flow_valid")
    if flow_valid is not None:
        valid = jnp.moveaxis(flow_valid, 1, 0).astype(bool)  # [M, B, H, W]
        masks_ev = valid & event_mask[None]
        masks = valid
    else:
        masks_ev = jnp.broadcast_to(event_mask[None], gt.shape[:2] + gt.shape[3:])
        masks = None

    logs: Dict[str, jnp.ndarray] = {}

    def put(prefix, name, pair):
        logs[f"{prefix}{name}"] = pair[0]
        logs[f"{prefix}{name}__weight"] = pair[1]

    # Plain single metrics on the last step (reference :159-162).
    put("val/", "epe", epe_masked(preds[-1], gt[-1]))
    put("val/", "ae", ae_masked(preds[-1], gt[-1]))
    for n in (1, 2, 3):
        put("val/", f"{n}pe", n_pixel_error_masked(preds[-1], gt[-1], None, n))
    # Plain multi metrics.  The traj-len gate applies to EPE_MULTI and
    # FLOW_METRICS_MULTI only (AE_MULTI has no such option in the reference).
    tl = dict(min_traj_len=min_traj_len, max_traj_len=max_traj_len)
    put("val/", "epe_multi", epe_masked_multi(preds, gt, **tl))
    put("val/", "ae_multi", ae_masked_multi(preds, gt))
    for k, v in trajectory_flow_metrics(preds, gt, **tl).items():
        logs[f"val/{k}"] = v

    # Event-masked single on last step (reference :166-168).
    put("val/masked_", "epe", epe_masked(preds[-1], gt[-1], event_mask.astype(bool)))
    put("val/masked_", "ae", ae_masked(preds[-1], gt[-1], event_mask.astype(bool)))
    for n in (1, 2, 3):
        put("val/masked_", f"{n}pe",
            n_pixel_error_masked(preds[-1], gt[-1], event_mask.astype(bool), n))

    # Multi, flow-valid masked and ev-masked (reference :170-188).
    if masks is not None:
        put("val/masked_", "epe_multi", epe_masked_multi(preds, gt, masks, **tl))
        put("val/masked_", "ae_multi", ae_masked_multi(preds, gt, masks))
        for k, v in trajectory_flow_metrics(preds, gt, masks, **tl).items():
            logs[f"val/masked_{k}"] = v
    put("val/ev_masked_", "epe_multi", epe_masked_multi(preds, gt, masks_ev, **tl))
    put("val/ev_masked_", "ae_multi", ae_masked_multi(preds, gt, masks_ev))
    for k, v in trajectory_flow_metrics(preds, gt, masks_ev, **tl).items():
        logs[f"val/ev_masked_{k}"] = v

    # Linear-assumption baseline (reference :190-196).
    preds_lin = predictions_from_lin_assumption(preds[-1], ts)
    put("val/", "epe_multi_lin", epe_masked_multi(preds_lin, gt))
    put("val/", "ae_multi_lin", ae_masked_multi(preds_lin, gt))
    return logs


def raft_supervised_train_step(
    state: RAFTTrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array,
    cfg: RAFTSplineConfig, gamma: float = 0.8,
) -> Tuple[RAFTTrainState, Dict[str, jnp.ndarray]]:
    """Supervised MultiFlow training: gamma-weighted masked L1 over every
    refinement iteration against the GT multi-step flow (the paper's
    RAFT-Spline training recipe — exponentially weighted sequence loss from
    the RAFT lineage; the reference snapshot ships no training_step, so this
    reconstructs it from the paper + the shipped validation contract,
    SURVEY.md §7.2-5).

    Memory design: the model returns the LOW-RES per-iteration params/masks
    (return_sequences=True) and each iteration is upsampled + scored inside
    a jax.checkpoint'ed lax.map body, so no [iters, B, C, H, W] full-res
    stack is ever live (the stacked variant's backward materialized a 9 GB
    padded temp at batch 6).

    Args:
      batch: 'ev_repr' [B, nbins_total, H, W]; 'flow' [B, T, 2, H, W]
        (channel 0 = x); 'flow_timestamps' [B, T] with one shared cadence
        across the batch (MultiFlow serves a fixed grid — row 0 is used);
        optional 'flow_valid' [B, T, H, W]; optional 'img' pair.
      gamma: per-iteration decay; iteration i gets gamma^(iters-1-i).
    """
    assert cfg.curve_type != "LEARNED", (
        "supervised step evaluates the basis outside the model; LEARNED "
        "basis needs the MLP params — use the self-supervised step")
    del rng
    gt = jnp.moveaxis(batch["flow"], 1, 0)          # [T, B, 2, H, W]
    ts = batch["flow_timestamps"][0]
    valid = batch.get("flow_valid")
    if valid is not None:
        vmask = jnp.moveaxis(valid, 1, 0)[:, :, None]  # [T, B, 1, H, W]

    def loss_fn(params):
        (params_seq, mask_seq), new_bs = _forward(
            cfg, params, state.batch_stats, batch["ev_repr"],
            batch.get("img"), test_mode=False, train=True,
            return_sequences=True)

        @jax.checkpoint
        def iter_loss(pm):
            p, m = pm
            up = cvx_upsample(p, m)                         # [B, 2*deg, H, W]
            pred = curve_flow_from_reference(up, ts, cfg.curve_type)
            err = jnp.abs(pred - gt)                        # [T, B, 2, H, W]
            if valid is not None:
                err = err * vmask
                return jnp.sum(err) / (2.0 * jnp.maximum(jnp.sum(vmask), 1.0))
            return jnp.mean(err)

        losses = jax.lax.map(iter_loss, (params_seq, mask_seq))  # [iters]
        n = losses.shape[0]
        weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=losses.dtype)
        loss = jnp.sum(weights * losses)
        logs = {"train_losses/l1_final": losses[-1],
                "train_losses/total": loss}
        return loss, (logs, new_bs)

    (loss, (logs, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads, batch_stats=new_bs)
    return state, logs


def raft_train_step(state: RAFTTrainState, batch: Dict[str, jnp.ndarray],
                    rng: jax.Array, cfg: RAFTSplineConfig,
                    loss_cfg: FocusLossConfig, num_pos_events: int = -1,
                    gamma: float | None = None,
                    gamma_sample_k: int | None = None,
                    ) -> Tuple[RAFTTrainState, Dict[str, jnp.ndarray]]:
    """Self-supervised trajectory training: CMax loss on the predicted curve
    (the 'ours-selfsup' experiment; the snapshot ships no reference
    training_step — composition per SURVEY.md §7.2-5).

    gamma=None supervises only the FINAL iteration's upsampled curve.
    gamma=g scores EVERY refinement iteration, weighted g^(iters-1-i) — the
    RAFT-lineage exponentially-weighted sequence loss (raft.py:191-193
    returns all iterations for exactly this).  Memory design mirrors the
    supervised step: low-res per-iteration params (return_sequences=True),
    each iteration upsampled + scored inside a jax.checkpoint'ed lax.map
    body, so no [iters, B, C, H, W] full-res stack is ever live (the stacked
    variant's backward materialized a 9 GB padded temp at batch 6).

    gamma_sample_k=K (with gamma set) scores the final iteration plus only
    K iterations drawn uniformly WITHOUT replacement from the first
    iters-1, each reweighted by (iters-1)/K — an unbiased estimator of the
    full gamma sum (E[loss] and E[grad] match exactly; K = iters-1
    reproduces it identically).  The full gamma loss runs the CMax pipeline
    iters times per step (measured 2476 vs 628 ms at b6 EVIMO2); K trades
    per-step variance for ~(K+1)/iters of that cost."""
    h, w = loss_cfg.image_shape
    offsets = jnp.asarray(
        tile_mask_positions((h, w), loss_cfg.lut_superpixel_size)
        .astype(np.float32))                                   # [N, 2] (y, x)
    times = get_reconstruction_times(loss_cfg, rng)

    def curve_focus_loss(params_up):
        """CMax loss of one full-res upsampled curve-param grid."""
        s = loss_cfg.lut_superpixel_size
        off = s // 2
        sel = params_up[:, :, off::s, off::s]              # [B, 2*deg, Hn, Wn]
        flows = curve_flow_from_reference(sel, times, cfg.curve_type)
        # flows: [T, B, 2, Hn, Wn], curve channels (x, y) -> flip to the
        # loss's (y, x) trajectory convention.
        t_, b = flows.shape[:2]
        flows_yx = jnp.stack([flows[:, :, 1], flows[:, :, 0]], axis=2)
        flows_list = flows_yx.reshape(t_, b, 2, -1)        # [T, B, 2, N]
        traj = offsets[None, None] + jnp.transpose(flows_list, (1, 0, 3, 2))
        return focus_loss(loss_cfg, traj, times, batch["events"],
                          num_pos_events=num_pos_events,
                          cell_ends=batch.get("lut_cell_ends"))

    def loss_fn(params):
        if gamma is None:
            # Final-iteration supervision: test_mode=True upsamples ONLY the
            # last iteration (cheapest path; the measured bench operating
            # point).
            (_, params_up), new_bs = _forward(
                cfg, params, state.batch_stats, batch["ev_repr"],
                batch.get("img"), test_mode=True, train=True)
            loss, log_data, _ = curve_focus_loss(params_up)
            logs = {f"train_losses/{k}": v for k, v in log_data.items()}
            return loss, (logs, new_bs)

        (params_seq, mask_seq), new_bs = _forward(
            cfg, params, state.batch_stats, batch["ev_repr"],
            batch.get("img"), test_mode=False, train=True,
            return_sequences=True)

        @jax.checkpoint
        def iter_loss(pm):
            p, m = pm
            return curve_focus_loss(cvx_upsample(p, m))[0]

        n = params_seq.shape[0]
        if gamma_sample_k is not None and 0 < gamma_sample_k < n - 1:
            # Unbiased subsample: final iteration + K uniform draws (without
            # replacement) from the first n-1, reweighted by (n-1)/K.
            # fold_in keeps the reconstruction-times draw (rng above)
            # byte-identical to the full-gamma and final-only paths.
            k = gamma_sample_k
            idx = jax.random.choice(jax.random.fold_in(rng, 1), n - 1, (k,),
                                    replace=False)
            idx = jnp.concatenate([idx, jnp.full((1,), n - 1, idx.dtype)])
            sel = jax.tree_util.tree_map(
                lambda a: jnp.take(a, idx, axis=0), (params_seq, mask_seq))
            losses = jax.lax.map(iter_loss, sel)              # [K + 1]
            weights = gamma ** (n - 1 - idx).astype(losses.dtype)
            scale = jnp.full((k + 1,), (n - 1) / k, losses.dtype
                             ).at[-1].set(1.0)
            loss = jnp.sum(weights * scale * losses)
        else:
            losses = jax.lax.map(iter_loss, (params_seq, mask_seq))  # [iters]
            weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=losses.dtype)
            loss = jnp.sum(weights * losses)
        logs = {"train_losses/focus_final": losses[-1]}
        return loss, (logs, new_bs)

    (loss, (logs, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads, batch_stats=new_bs)
    logs["train_losses/total"] = loss
    return state, logs
