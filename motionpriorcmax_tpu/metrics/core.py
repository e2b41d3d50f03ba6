"""Masked flow metrics, trajectory metrics, and sum-reduced state banks.

Spec-identical reimplementation of the reference metric math
(src/modules/utils.py:85-296, 335-541) so values are directly comparable:
  * epe_masked        (:87-104)   — EPE over a bool mask, None when empty
  * ae_masked         (:147-184)  — Middlebury extended 3-vector angular error
  * n_pixel_error     (:186-218)  — NPE with the 5% relative-error gate, in %
  * multi variants    (:106-144)  — mean over the M per-timestep values
  * trajectory bundle (:465-541)  — TEPE/TAE/T3PE + per-step EPE (M = 6)

JAX deltas from torch, by design:
  * "None when the mask is empty" becomes (value, weight) pairs — weight 0
    marks an empty update so accumulation stays jit-able.
  * Multi-step inputs are stacked arrays [M, N, ...] (static M), not lists.
  * State is a dict of (sum, count) arrays; `MetricBank.reduce_across` psums
    it over a mesh axis (== torchmetrics dist_reduce_fx='sum').
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.flow_error import calculate_flow_error


def _masked_mean(values: jnp.ndarray, mask: Optional[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean over mask, weight) with weight=0 when the mask is empty."""
    if mask is None:
        return jnp.mean(values), jnp.asarray(1.0, values.dtype)
    m = mask.astype(values.dtype)
    denom = jnp.sum(m)
    val = jnp.where(denom > 0, jnp.sum(values * m) / jnp.maximum(denom, 1.0), 0.0)
    return val, (denom > 0).astype(values.dtype)


def epe_masked(source: jnp.ndarray, target: jnp.ndarray,
               valid_mask: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EPE over valid pixels.  source/target [N, C, ...]; mask [N, ...]."""
    epe = jnp.sqrt(jnp.sum(jnp.square(source - target), axis=1))
    return _masked_mean(epe, valid_mask)


def ae_masked(source: jnp.ndarray, target: jnp.ndarray,
              valid_mask: Optional[jnp.ndarray] = None, degrees: bool = True
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Middlebury 3-vector angular error (utils.py:147-184)."""
    ones = jnp.ones_like(source[:, :1])
    s_ext = jnp.concatenate([source, ones], axis=1)
    t_ext = jnp.concatenate([target, ones], axis=1)
    nom = jnp.sum(s_ext * t_ext, axis=1)
    den = jnp.linalg.norm(s_ext, axis=1) * jnp.linalg.norm(t_ext, axis=1)
    ae = jnp.arccos(jnp.clip(nom / den, -1.0, 1.0))
    if degrees:
        ae = ae / jnp.pi * 180.0
    return _masked_mean(ae, valid_mask)


def n_pixel_error_masked(source: jnp.ndarray, target: jnp.ndarray,
                         valid_mask: Optional[jnp.ndarray], n_pixels: float
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """%% of valid pixels with error > n px AND relative error >= 5%
    (utils.py:186-218)."""
    gt_magn = jnp.linalg.norm(target, axis=1)
    err_magn = jnp.linalg.norm(source - target, axis=1)
    rel = err_magn / jnp.clip(gt_magn, 1e-6)
    err_map = ((err_magn > n_pixels) & (rel >= 0.05)).astype(source.dtype)
    val, wgt = _masked_mean(err_map, valid_mask)
    return val * 100.0, wgt


def traj_len_filter_mask(target: jnp.ndarray,
                         valid_mask: Optional[jnp.ndarray],
                         min_traj_len: Optional[float] = None,
                         max_traj_len: Optional[float] = None
                         ) -> Optional[jnp.ndarray]:
    """Intersect a validity mask with a trajectory-arc-length gate.

    Reference: EPE_MULTI.update / FLOW_METRICS_MULTI.update
    (src/modules/utils.py:357-393, 496-511) — traj_len is the GT arc length
    over steps; valid_len = all-True, &= (len >= min), &= (len <= max); when
    valid_mask is None the gate mask itself becomes the per-step mask
    (the reference clones it per step), else it is intersected per step.

    target [M, N, 2, ...]; valid_mask [M, N, ...] or None.  Returns the
    (possibly new) mask, or None when no gate is configured.
    """
    if min_traj_len is None and max_traj_len is None:
        return valid_mask
    traj_len = compute_traj_len(target)          # [N, ...]
    valid_len = jnp.ones(traj_len.shape, bool)
    if min_traj_len is not None:
        valid_len &= traj_len >= min_traj_len
    if max_traj_len is not None:
        valid_len &= traj_len <= max_traj_len
    m = target.shape[0]
    gate = jnp.broadcast_to(valid_len[None], (m,) + valid_len.shape)
    if valid_mask is None:
        return gate
    return valid_mask & gate


def epe_masked_multi(source: jnp.ndarray, target: jnp.ndarray,
                     valid_mask: Optional[jnp.ndarray] = None,
                     min_traj_len: Optional[float] = None,
                     max_traj_len: Optional[float] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean of per-step masked EPE over the step axis (utils.py:106-126).

    source/target [M, N, C, ...]; valid_mask [M, N, ...] or None.  Steps with
    an empty mask are skipped from the mean (the reference's None handling).
    min/max_traj_len gate pixels by GT arc length (utils.py:380-391).
    """
    valid_mask = traj_len_filter_mask(target, valid_mask,
                                      min_traj_len, max_traj_len)
    m = source.shape[0]
    vals, wgts = [], []
    for i in range(m):
        v, wg = epe_masked(source[i], target[i],
                           None if valid_mask is None else valid_mask[i])
        vals.append(v); wgts.append(wg)
    vals = jnp.stack(vals); wgts = jnp.stack(wgts)
    denom = jnp.sum(wgts)
    val = jnp.where(denom > 0, jnp.sum(vals * wgts) / jnp.maximum(denom, 1.0), 0.0)
    return val, (denom > 0).astype(vals.dtype)


def ae_masked_multi(source: jnp.ndarray, target: jnp.ndarray,
                    valid_mask: Optional[jnp.ndarray] = None,
                    degrees: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean of per-step AE over M steps (utils.py:128-145; no empty-skip in
    the reference — empty masks produce nan there, we keep weight tracking)."""
    m = source.shape[0]
    vals = []
    for i in range(m):
        v, _ = ae_masked(source[i], target[i],
                         None if valid_mask is None else valid_mask[i], degrees)
        vals.append(v)
    return jnp.mean(jnp.stack(vals)), jnp.asarray(1.0)


def trajectory_flow_metrics(source: jnp.ndarray, target: jnp.ndarray,
                            valid_mask: Optional[jnp.ndarray] = None,
                            min_traj_len: Optional[float] = None,
                            max_traj_len: Optional[float] = None
                            ) -> Dict[str, jnp.ndarray]:
    """TEPE/TAE/T3PE + per-step EPE (utils.py:465-541, FLOW_METRICS_MULTI).

    Args:
      source, target: [M, N, 2, H, W] (M timesteps; reference num_steps = 6).
      valid_mask: [M, N, H, W] bool or None.
      min_traj_len, max_traj_len: optional GT-arc-length gate intersected
        into the mask (utils.py:496-511).

    Returns:
      {'TEPE', 'TAE', 'T3PE', 'EPE_STEP00'..}: same semantics as the
      reference — T* use calculate_flow_error over the flattened step axis
      (which intersects with its own GT-validity mask), per-step EPE uses
      calculate_flow_error per step.
    """
    valid_mask = traj_len_filter_mask(target, valid_mask,
                                      min_traj_len, max_traj_len)
    m, n = source.shape[:2]
    src_flat = source.reshape((-1,) + source.shape[2:])
    tgt_flat = target.reshape((-1,) + target.shape[2:])
    mask_flat = None if valid_mask is None else valid_mask.reshape(
        (-1,) + valid_mask.shape[2:])
    errors = calculate_flow_error(tgt_flat, src_flat, event_mask=mask_flat)
    out = {"TEPE": errors["EPE"], "TAE": errors["AE"], "T3PE": errors["3PE"]}
    for i in range(m):
        e = calculate_flow_error(target[i], source[i],
                                 None if valid_mask is None else valid_mask[i])
        out[f"EPE_STEP{str(i).zfill(2)}"] = e["EPE"]
    return out


def predictions_from_lin_assumption(source: jnp.ndarray,
                                    target_timestamps) -> jnp.ndarray:
    """Linear-in-time baseline: t * final flow (utils.py:67-74).

    source [N, 2, H, W], timestamps [M] -> [M, N, 2, H, W]."""
    ts = jnp.asarray(target_timestamps, source.dtype)
    return ts[:, None, None, None, None] * source[None]


def compute_traj_len(target: jnp.ndarray) -> jnp.ndarray:
    """Trajectory arc length over steps: [M, N, 2, H, W] -> [N, H, W]
    (utils.py:366-370, 483-487)."""
    diff = target[1:] - target[:-1]
    return jnp.sqrt(jnp.sum(jnp.square(diff), axis=2)).sum(axis=0)


class MetricBank:
    """Accumulates (sum, count) per metric; jit/psum friendly.

    Equivalent role to the reference's torchmetrics MetricCollections
    (src/modules/raft_spline.py:50-73) with dist_reduce_fx='sum' states.
    """

    def __init__(self):
        self.state: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}

    def update(self, values: Dict[str, jnp.ndarray],
               weights: Optional[Dict[str, jnp.ndarray]] = None):
        for key, val in values.items():
            w = 1.0 if weights is None else weights.get(key, 1.0)
            s, c = self.state.get(key, (0.0, 0.0))
            self.state[key] = (s + np.float64(val) * np.float64(w),
                               c + np.float64(w))

    def update_device(self, logs: Dict[str, jnp.ndarray]):
        """Accumulate a step's raw output dict (metric values + optional
        '<key>__weight' entries) ON DEVICE: one jitted (sum, count) pytree
        update per batch, no host transfer until compute().  Replaces the
        per-batch-per-metric float(v) round-trips (one device sync each on a
        tunneled TPU) in the validation loops."""
        vals = {k: v for k, v in logs.items() if not k.endswith("__weight")}
        wgts = {k: logs.get(f"{k}__weight", 1.0) for k in vals}
        if not self.state:
            self.state = {k: (jnp.zeros((), jnp.float64
                                        if jax.config.jax_enable_x64
                                        else jnp.float32),) * 2 for k in vals}
        self.state = self._accumulate(self.state, vals, wgts)

    def compute(self) -> Dict[str, float]:
        state = jax.device_get(self.state)  # single transfer for the bank
        return {k: float(s / c) if c > 0 else float("nan")
                for k, (s, c) in state.items()}

    def reset(self):
        self.state = {}

    @staticmethod
    @jax.jit
    def _accumulate(state, vals, wgts):
        return {k: (state[k][0] + vals[k] * wgts[k], state[k][1] + wgts[k])
                for k in vals}

    @staticmethod
    def reduce_across(state_tree, axis_name: str):
        """psum a (sum, count) state pytree across a mesh axis — the NCCL
        sum-reduction analog (SURVEY.md §2.3)."""
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis_name), state_tree)

    def reduce_across_processes(self) -> "MetricBank":
        """Sum (sum, count) states across jax.distributed processes — the
        Lightning sync_dist=True / torchmetrics dist_reduce_fx='sum' analog
        for per-host validation shards (src/modules/trajectory_net.py:165-169).

        Every process must call this with the SAME metric keys; the reduced
        bank is identical on all processes.  No-op single-process.
        """
        if jax.process_count() == 1:
            return self
        from jax.experimental import multihost_utils

        keys = sorted(self.state)
        state = jax.device_get(self.state)
        local = np.array([[float(state[k][0]), float(state[k][1])]
                          for k in keys], np.float64)
        if not keys:
            local = np.zeros((0, 2), np.float64)
        gathered = np.asarray(multihost_utils.process_allgather(local))
        total = gathered.sum(axis=0)       # [K, 2]
        out = MetricBank()
        out.state = {k: (total[i, 0], total[i, 1])
                     for i, k in enumerate(keys)}
        return out
