"""Flow-training loop: the reference `trainer.fit` path, functional.

Replaces Lightning Trainer + DDP (scripts/flow_training.py:125-130) with:
  * a ('data', 'event') mesh + jit-compiled train/eval steps (parallel/)
  * per-epoch validation with psum-style metric accumulation (MetricBank)
  * orbax checkpointing of the best-k states on val EPE
    (ModelCheckpoint(save_top_k=5, monitor='val_losses/EPE'),
    flow_training.py:110-116)
  * scalar logging to JSONL (+ TensorBoard when available)
"""

from __future__ import annotations

import functools
import json
import time
from pathlib import Path
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from ..losses import FocusLossConfig
from ..metrics import MetricBank
from ..parallel import make_mesh, make_sharded_train_step, replicate, shard_batch
from .checkpoint import save_checkpoint
from .trajectory_net import (TrajectoryNetConfig, create_train_state, eval_step,
                             train_step)


class ScalarLogger:
    """JSONL scalar logger with optional TensorBoard mirroring (reference
    logs to W&B-or-TB, flow_training.py:82-86 — TB/JSONL here; W&B needs
    network egress)."""

    def __init__(self, logdir: str):
        self.path = Path(logdir)
        self.path.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path / "scalars.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.path / "tb"))
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def make_flow_render_fn(state, cfg: TrajectoryNetConfig,
                        loss_cfg: FocusLossConfig, rng_seed: int = 0):
    """Render the C23 image panel for one collated batch.

    Produces: unwarped event IWE, predicted IWE (t_ref=0 reconstruction),
    predicted flow, GT flow, and the GT-flow-warped IWE sanity image
    (reference src/utils/logging.py:53-120).
    """
    import jax.numpy as jnp

    from ..losses import focus_loss
    from ..ops.events import iwe_bilinear_vote_batch, gaussian_blur_3x3
    from .trajectory_net import _step, predict_flow

    def render(batch):
        out = {}
        events = jnp.asarray(batch["events"])
        h, w = loss_cfg.image_shape
        # Unwarped event image (logging.py:76-86).
        unwarped = gaussian_blur_3x3(iwe_bilinear_vote_batch(
            events[..., :2], events[..., 5], height=h, width=w))
        out["unwarped_iwe"] = np.asarray(unwarped[0])

        rng = jax.random.PRNGKey(rng_seed)
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if not isinstance(v, (list, str))}
        num_pos = batch.get("num_pos_events", -1)
        _, (_, misc, _, basis_fn) = _step(cfg, loss_cfg, state.params,
                                          state.batch_stats, dev_batch, rng,
                                          train=False, num_pos_events=num_pos)
        iwes = np.asarray(misc["iwes"])  # [B, n_tref, (2,) H, W]
        out["pred_iwe"] = iwes[0, 0, 0] if iwes.ndim == 5 else iwes[0, 0]
        if "voxel" not in dev_batch:
            from .trajectory_net import voxelize_batch_on_device

            dev_batch["voxel"] = voxelize_batch_on_device(
                cfg, dev_batch["events"])
        flow = predict_flow(state, dev_batch["voxel"], cfg)
        out["pred_flow"] = np.asarray(flow[0])

        if "forward_flow" in batch:
            gt_flow = np.asarray(batch["forward_flow"][0])
            out["gt_flow"] = gt_flow
            # GT IWE sanity: treat the GT flow as a degree-1 polynomial
            # coefficient grid and run the loss pipeline on it
            # (logging.py:101-120; polynomial k=1 only).
            if cfg.basis_type == "polynomial" and cfg.num_basis == 1:
                from ..losses import get_reconstruction_times
                from .trajectory_net import calculate_trajectories

                coeff = jnp.asarray(batch["forward_flow"])
                times = get_reconstruction_times(loss_cfg, rng)
                times = times.at[0].set(0.0)
                traj = calculate_trajectories(cfg, coeff, times, True, basis_fn)
                _, _, misc_gt = focus_loss(loss_cfg, traj, times, events,
                                           num_pos_events=num_pos)
                gt_iwes = np.asarray(misc_gt["iwes"])
                out["gt_iwe"] = (gt_iwes[0, 0, 0] if gt_iwes.ndim == 5
                                 else gt_iwes[0, 0])
        return out

    return render


def train_flow(
    cfg: TrajectoryNetConfig,
    loss_cfg: FocusLossConfig,
    train_loader: Iterable,
    val_loader: Optional[Iterable],
    workdir: str,
    *,
    max_epochs: int = 100,
    num_pos_events: int = -1,
    mesh=None,
    seed: int = 0,
    log_every: int = 200,
    monitor: str = "val_losses/EPE",
    resume_state=None,
    image_log_dataset=None,
    image_log_collate=None,
) -> Dict[str, float]:
    """Self-supervised DSEC flow training (reference §3.1 call stack).

    Multi-host (jax.process_count() > 1, set up via
    parallel.initialize_distributed): each process feeds HOST-LOCAL batches —
    train batches are assembled into global sharded arrays
    (host_local_batch_to_global), validation runs on each host's shard and
    the (sum, count) metric states are summed across processes
    (MetricBank.reduce_across_processes ≡ Lightning sync_dist).  Scalars and
    image panels are written by process 0 only (reference rank-0 guard,
    src/utils/metrics.py:7-8); orbax checkpointing is collective.
    """
    if mesh is None:
        mesh = make_mesh(event=1)
    multiprocess = jax.process_count() > 1
    is_main = jax.process_index() == 0
    logger = ScalarLogger(workdir) if is_main else None

    state = resume_state or create_train_state(cfg, jax.random.PRNGKey(seed))
    state = replicate(mesh, state)

    # One compiled step per (num_pos_events, event-capacity) combination:
    # bucketed collate (collate.py capacity_buckets) varies both, and jit
    # caches per shape — so at most len(buckets) compilations, keyed here on
    # the static num_pos_events.
    @functools.lru_cache(maxsize=None)
    def step_for(npos):
        return make_sharded_train_step(
            functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg,
                              num_pos_events=npos), mesh)

    @functools.lru_cache(maxsize=None)
    def eval_for(npos):
        return jax.jit(functools.partial(eval_step, cfg=cfg,
                                         loss_cfg=loss_cfg,
                                         num_pos_events=npos))

    best = float("inf")
    key = jax.random.PRNGKey(seed + 1)
    step = int(state.step)
    t_last = time.perf_counter()

    for epoch in range(max_epochs):
        for batch in train_loader:
            key, sub = jax.random.split(key)
            batch = dict(batch)
            npos = batch.pop("num_pos_events", num_pos_events)
            if multiprocess:
                from ..parallel.distributed import host_local_batch_to_global

                sharded = host_local_batch_to_global(mesh, batch)
            else:
                sharded = shard_batch(mesh, batch)
            state, logs = step_for(npos)(state, sharded, sub)
            step += 1
            if step % log_every == 0 and is_main:
                scalars = {k: float(v) for k, v in logs.items()}
                dt = time.perf_counter() - t_last
                scalars["steps_per_s"] = log_every / dt
                t_last = time.perf_counter()
                logger.log(step, scalars)

        if (is_main and image_log_dataset is not None
                and image_log_collate is not None):
            from ..utils.image_logging import ImagePanelLogger, \
                log_flow_epoch_images

            panel = ImagePanelLogger(workdir, tb_writer=logger._tb)
            render_state = _host_local_state(state) if multiprocess else state
            render = make_flow_render_fn(render_state, cfg, loss_cfg)
            log_flow_epoch_images(panel, image_log_dataset, image_log_collate,
                                  render, step, "val/")

        if val_loader is not None:
            # Multi-host: each process evaluates its OWN val shard with a
            # host-local state copy (local jit, no SPMD), then the (sum,
            # count) states are summed across processes — the Lightning
            # per-rank validation + sync_dist design.
            eval_state = _host_local_state(state) if multiprocess else state
            bank = MetricBank()
            for batch in val_loader:
                key, sub = jax.random.split(key)
                vb = dict(batch)
                if "forward_flow" in vb:
                    vb["gt_flow"] = vb.pop("forward_flow")
                npos = vb.pop("num_pos_events", num_pos_events)
                vb = vb if multiprocess else shard_batch(mesh, vb)
                # Accumulate on device; one transfer per epoch at compute().
                bank.update_device(eval_for(npos)(eval_state, vb, sub))
            bank = bank.reduce_across_processes()
            val = bank.compute()
            if is_main:
                logger.log(step, val)
            metric = val.get(monitor, val.get("val_losses/total"))
            if metric is not None:
                # Best-k retention on the monitored metric (reference
                # ModelCheckpoint save_top_k=5 mode='min').
                save_checkpoint(str(Path(workdir) / "checkpoints"), state,
                                step=step, metric=metric)
            if metric is not None and metric < best:
                best = metric
                # Best-run summary: push '<key>_at_best' for every metric at
                # the new best step (reference log_best_metrics,
                # src/utils/metrics.py:5-31).
                if is_main:
                    logger.log(step, {f"{k}_at_best": v for k, v in val.items()})
        else:
            save_checkpoint(str(Path(workdir) / "checkpoints"), state, step=step)

    if logger is not None:
        logger.close()
    return {"best": best, "steps": step}


def _host_local_state(state):
    """Host-local numpy copy of a fully-replicated global TrainState, for
    process-local jit (validation / rendering) under multi-host."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), state)
