"""Optical-flow error math (EPE / NPE / AE).

TPU-native reimplementation of src/utils/flow.py:18-71 (duplicated at
src/modules/utils.py:220-273 in the reference) with spec-identical masking and
reductions so metric values are directly comparable.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def calculate_flow_error(
    flow_gt: jnp.ndarray,
    flow_pred: jnp.ndarray,
    event_mask: Optional[jnp.ndarray] = None,
    time_scale: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Flow error over GT-valid (non-inf, nonzero) pixels.

    Reference semantics (src/utils/flow.py:37-71): valid = finite AND both
    |u|>0 and |v|>0; optional event mask intersected; per-image mean over
    valid pixels then batch mean; AE is the Middlebury 3-vector angular error
    in degrees.

    Args:
      flow_gt, flow_pred: [B, 2, H, W].
      event_mask: optional [B, H, W] or [B, 1, H, W] bool.
      time_scale: optional [B] multiplier on both flows.

    Returns:
      dict with 'EPE', '1PE', '2PE', '3PE', 'AE' scalars.
    """
    u_gt, v_gt = flow_gt[:, 0], flow_gt[:, 1]
    flow_mask = (
        jnp.isfinite(u_gt) & jnp.isfinite(v_gt)
        & (jnp.abs(u_gt) > 0) & (jnp.abs(v_gt) > 0)
    )  # [B, H, W]
    if event_mask is not None:
        if event_mask.ndim == 4:
            event_mask = event_mask[:, 0]
        flow_mask = flow_mask & (event_mask > 0)

    mask = flow_mask[:, None].astype(flow_gt.dtype)  # [B, 1, H, W]
    gt_masked = jnp.where(jnp.isfinite(flow_gt), flow_gt, 0.0) * mask
    pred_masked = flow_pred * mask
    n_points = jnp.sum(mask, axis=(1, 2, 3)) + 1e-5  # [B]

    if time_scale is not None:
        ts = time_scale.reshape(-1, 1, 1, 1)
        gt_masked = gt_masked * ts
        pred_masked = pred_masked * ts

    err = jnp.linalg.norm(gt_masked - pred_masked, axis=1)  # [B, H, W]
    errors = {
        "EPE": jnp.mean(jnp.sum(err, axis=(1, 2)) / n_points),
        "1PE": jnp.mean(jnp.sum((err > 1).astype(err.dtype), axis=(1, 2)) / n_points),
        "2PE": jnp.mean(jnp.sum((err > 2).astype(err.dtype), axis=(1, 2)) / n_points),
        "3PE": jnp.mean(jnp.sum((err > 3).astype(err.dtype), axis=(1, 2)) / n_points),
    }

    u, v = pred_masked[:, 0], pred_masked[:, 1]
    ug, vg = gt_masked[:, 0], gt_masked[:, 1]
    cos_sim = (1.0 + u * ug + v * vg) / (
        jnp.sqrt(1.0 + u * u + v * v) * jnp.sqrt(1.0 + ug * ug + vg * vg)
    )
    cos_sim = jnp.clip(cos_sim, -1.0, 1.0)
    ae = jnp.mean(jnp.sum(jnp.arccos(cos_sim), axis=(1, 2)) / n_points)
    errors["AE"] = ae * (180.0 / jnp.pi)
    return errors
