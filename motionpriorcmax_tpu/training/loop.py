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
) -> Dict[str, float]:
    """Self-supervised DSEC flow training (reference §3.1 call stack)."""
    if mesh is None:
        mesh = make_mesh(event=1)
    logger = ScalarLogger(workdir)

    state = resume_state or create_train_state(cfg, jax.random.PRNGKey(seed))
    state = replicate(mesh, state)

    step_fn = make_sharded_train_step(
        functools.partial(train_step, cfg=cfg, loss_cfg=loss_cfg,
                          num_pos_events=num_pos_events), mesh)
    eval_fn = jax.jit(functools.partial(eval_step, cfg=cfg, loss_cfg=loss_cfg,
                                        num_pos_events=num_pos_events))

    best = float("inf")
    key = jax.random.PRNGKey(seed + 1)
    step = int(state.step)
    t_last = time.perf_counter()

    for epoch in range(max_epochs):
        for batch in train_loader:
            key, sub = jax.random.split(key)
            state, logs = step_fn(state, shard_batch(mesh, batch), sub)
            step += 1
            if step % log_every == 0:
                scalars = {k: float(v) for k, v in logs.items()}
                dt = time.perf_counter() - t_last
                scalars["steps_per_s"] = log_every / dt
                t_last = time.perf_counter()
                logger.log(step, scalars)

        if val_loader is not None:
            bank = MetricBank()
            for batch in val_loader:
                key, sub = jax.random.split(key)
                vb = dict(batch)
                if "forward_flow" in vb:
                    vb["gt_flow"] = vb.pop("forward_flow")
                logs = eval_fn(state, shard_batch(mesh, vb), sub)
                bank.update({k: float(v) for k, v in logs.items()})
            val = bank.compute()
            logger.log(step, val)
            metric = val.get(monitor, val.get("val_losses/total"))
            if metric is not None and metric < best:
                best = metric
                # Best-run summary: push '<key>_at_best' for every metric at
                # the new best step (reference log_best_metrics,
                # src/utils/metrics.py:5-31).
                logger.log(step, {f"{k}_at_best": v for k, v in val.items()})
                save_checkpoint(str(Path(workdir) / "checkpoints"), state,
                                step=step)
        else:
            save_checkpoint(str(Path(workdir) / "checkpoints"), state, step=step)

    logger.close()
    return {"best": best, "steps": step}
