"""Explicit event-axis parallelism for the contrast-maximization loss.

BASELINE.json config 5: "events sharded over N>=2 hosts (boundary-event
exchange via collectives)".  Under plain jit, XLA's SPMD partitioner already
handles event-sharded batches; this module provides the *explicit* shard_map
formulation — each shard warps its local event slice and scatter-adds a
partial IWE, and one `psum` over the 'event' axis combines them (events are
points, so the "halo exchange" of a pixel-decomposed stencil reduces to the
psum of overlapping partial images).  The loss tail (blur, gradient
magnitude) runs on the combined IWE identically on every shard.

Numerically identical to the unsharded loss up to float reduction order
(tested on the virtual CPU mesh).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..losses.focus import (FocusLossConfig, calculate_smooth_loss,
                            interpolate_flow, make_iwes, warp_events)
from ..ops import gradients as grad_ops


def focus_loss_event_sharded(
    cfg: FocusLossConfig,
    trajectories: jnp.ndarray,
    times: jnp.ndarray,
    events: jnp.ndarray,
    mesh,
    num_pos_events: int = -1,
    event_axis: str = "event",
    cell_ends: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Focus loss with the event dimension explicitly sharded over `mesh`.

    Args:
      trajectories: [B, T, N, 2] (replicated over the event axis).
      events: [B, M, 6], M divisible by the event-axis size; with
        polarity-aware batching each shard must keep the positives-first
        layout, so M/n_shards must also split num_pos_events evenly
        (static capacities make this a collate-time guarantee).
      cell_ends: optional [B, S * num_cells] GLOBAL LUT-cell boundaries for
        cell-sorted events (data/host_ops.py::lut_cell_sort).  A contiguous
        shard of a sorted array is sorted, and the cumsum-difference segment
        sum is linear, so each shard clips the global boundaries into its
        own range and the replicated-LUT cotangent psum reassembles the
        exact global gradient.
    """
    # Flow LUT from trajectories only — computed once, replicated.
    t_ref = times[: cfg.num_tref]
    traj_at_tref = trajectories[:, : cfg.num_tref]
    traj_at_tmid = trajectories[:, cfg.num_tref:]
    flow_lut, flow_to_next = interpolate_flow(cfg, traj_at_tref, traj_at_tmid)

    n_shards = mesh.shape[event_axis]
    assert events.shape[1] % n_shards == 0
    local_pos = -1
    if cfg.polarity_aware_batching:
        assert num_pos_events % n_shards == 0 and \
            (events.shape[1] - num_pos_events) % n_shards == 0, (
                "polarity-aware event sharding needs pos/neg capacities "
                "divisible by the event-axis size")
        local_pos = num_pos_events // n_shards

    local_m = events.shape[1] // n_shards

    def _local_ends(ends):
        """Global [B, S*cells] boundaries -> this shard's local ones."""
        idx = jax.lax.axis_index(event_axis)
        if not cfg.polarity_aware_batching:
            return jnp.clip(ends - idx * local_m, 0, local_m)
        cells = ends.shape[1] // 2
        pm = num_pos_events // n_shards
        nm = local_m - pm
        pos_e = jnp.clip(ends[:, :cells] - idx * pm, 0, pm)
        neg_e = pm + jnp.clip(
            ends[:, cells:] - num_pos_events - idx * nm, 0, nm)
        return jnp.concatenate([pos_e, neg_e], axis=1)

    def local_iwes(lut, ev_local, ends):
        # Per-shard: warp the local slice, vote a PARTIAL IWE (the blur is
        # linear, so it commutes with the psum and runs after).
        local_ends = None if ends is None else _local_ends(ends)
        warped = warp_events(cfg, ev_local, lut, local_ends)
        partial = make_iwes(cfg, warped, t_ref, local_pos,
                            cell_sorted=local_ends is not None)
        return jax.lax.psum(partial, event_axis)

    # Positives-first layout: shard pos and neg halves separately so each
    # shard sees a positives-first local slice.
    if cfg.polarity_aware_batching:
        pos, neg = (events[:, :num_pos_events], events[:, num_pos_events:])
        b = events.shape[0]
        pm = pos.shape[1] // n_shards
        nm = neg.shape[1] // n_shards
        ev_resharded = jnp.concatenate([
            pos.reshape(b, n_shards, pm, 6),
            neg.reshape(b, n_shards, nm, 6)], axis=2)
        ev_resharded = ev_resharded.reshape(b, n_shards * (pm + nm), 6)
    else:
        ev_resharded = events

    if cell_ends is None:
        shard = jax.shard_map(
            lambda lut, ev: local_iwes(lut, ev, None), mesh=mesh,
            in_specs=(P(), P(None, event_axis, None)),
            out_specs=P(),
            check_vma=False,
        )
        iwes = shard(flow_lut, ev_resharded)
    else:
        shard = jax.shard_map(
            local_iwes, mesh=mesh,
            in_specs=(P(), P(None, event_axis, None), P()),
            out_specs=P(),
            check_vma=False,
        )
        iwes = shard(flow_lut, ev_resharded, cell_ends)

    focus = grad_ops.focus_objective(iwes, loss_type=cfg.loss_type,
                                     norm=cfg.focus_loss_norm)
    smooth = calculate_smooth_loss(cfg, flow_lut, flow_to_next)
    loss = focus + smooth

    h, w = cfg.image_shape
    b = events.shape[0]
    n_tref = cfg.num_tref
    if cfg.polarity_aware_batching:
        iwes_out = iwes.reshape(b, n_tref, 2, h, w)
    else:
        iwes_out = iwes.reshape(b, n_tref, h, w)
    log_metadata = {
        "focus_loss": jax.lax.stop_gradient(focus),
        "smoothness_loss": jax.lax.stop_gradient(smooth),
    }
    return loss, log_metadata, {"iwes": jax.lax.stop_gradient(iwes_out)}
