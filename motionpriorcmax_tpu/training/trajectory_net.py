"""TrajectoryNet: the self-supervised UNet flow workload (reference C7).

TPU-native redesign of src/modules/trajectory_net.py — the Lightning module
becomes a frozen config + a flax module + pure step functions:

  train_step(state, batch, rng) -> (state', logs)       (ref :142-170)
  eval_step(state, batch, rng)  -> logs incl. EPE/AE    (ref :172-197)
  predict_flow(state, voxel)    -> dense flow           (ref :121-140, 199-203)

The steps are designed to be pjit-compiled over a `Mesh(('data', 'event'))`
(see parallel/): the batch dim shards over 'data' (== reference DDP), the
event-capacity dim optionally over 'event' (beyond-reference capability).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.training import train_state

from ..losses import FocusLossConfig, focus_loss, get_reconstruction_times
from ..models.basis_mlp import BasisMLP
from ..models.unet import UNet
from ..ops.basis import compute_trajectories, eval_basis
from ..ops.flow_error import calculate_flow_error
from ..ops.grids import coeffs_grid_to_list, dense_flow_from_traj, tile_mask_positions

# He-normal fan_out, matching the reference initialize_weights
# (src/utils/misc.py:5-17).
KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


@dataclasses.dataclass(frozen=True)
class TrajectoryNetConfig:
    """Leaf names match config/exe/flow_training/dsec.yaml + propagate_config."""

    image_shape: Tuple[int, int] = (480, 640)
    lr: float = 1e-4
    num_bins: int = 15
    num_basis: int = 1
    patch_size: int = 4
    model_type: str = "default"
    basis_type: str = "polynomial"   # dct | learned | polynomial
    skip_frames: int = 1
    anchor_time: float = 0.0
    # On-device voxelization normalization (reference data.norm_type,
    # config/exe/flow_training/dsec.yaml:33) — applied when the batch carries
    # raw events but no precomputed 'voxel'.
    voxel_norm_type: Optional[str] = "mean_std"
    voxel_quantile: float = 0.0
    # UNet compute dtype: 'bfloat16' doubles MXU conv throughput (params/BN
    # stay f32).  Default f32 for reference parity (TF32-ish 'high').
    compute_dtype: str = "float32"


class TrajectoryModel(nn.Module):
    """UNet + optional learned-basis MLP bundled as one parameter tree."""

    cfg: TrajectoryNetConfig

    def setup(self):
        if self.cfg.model_type != "default":
            raise ValueError(f"unknown model_type {self.cfg.model_type!r}")
        self.unet = UNet(self.cfg.num_bins, 2 * self.cfg.num_basis,
                         dtype=jnp.dtype(self.cfg.compute_dtype))
        if self.cfg.basis_type == "learned":
            self.basis_mlp = BasisMLP(self.cfg.num_basis)

    def __call__(self, voxel, train: bool = False):
        """voxel [B, num_bins, H, W] -> coeff grid [B, 2*num_basis, H, W]."""
        return self.unet(voxel, train=train)

    def basis(self, times):
        """times [T] -> basis matrix [T, K]."""
        mlp = self.basis_mlp if self.cfg.basis_type == "learned" else None
        return eval_basis(times, self.cfg.num_basis, self.cfg.basis_type,
                          mlp_apply=mlp)


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(cfg: TrajectoryNetConfig, rng: jax.Array,
                       tx=None, sample_batch: int = 1) -> TrainState:
    """Initialize parameters (+BN stats) and the optax optimizer.

    Reference: AdamW(lr) over model + basis params
    (src/modules/trajectory_net.py:213-219).
    """
    import optax

    model = TrajectoryModel(cfg)
    h, w = cfg.image_shape
    dummy = jnp.zeros((sample_batch, cfg.num_bins, h, w), jnp.float32)
    # jit init: eager init is minutes of per-op round-trips on tunneled TPUs.
    init = jax.jit(lambda r, v: TrajectoryModel(cfg).init(r, v, train=False))
    variables = init(rng, dummy)
    if cfg.basis_type == "learned":
        # Also trace the basis path so the MLP parameters materialize.
        basis_vars = model.init(rng, jnp.zeros((2,)), method=TrajectoryModel.basis)
        params = {**variables["params"], **basis_vars["params"]}
    else:
        params = variables["params"]
    if tx is None:
        tx = optax.adamw(cfg.lr)
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def _tile_offsets(cfg: TrajectoryNetConfig) -> jnp.ndarray:
    """[N, 2] static (y, x) positions of the one-per-tile trajectories."""
    return jnp.asarray(
        tile_mask_positions(cfg.image_shape, cfg.patch_size).astype(np.float32))


def calculate_trajectories(
    cfg: TrajectoryNetConfig,
    coeff_grid: jnp.ndarray,
    times: jnp.ndarray,
    add_offsets: bool,
    basis_fn,
) -> jnp.ndarray:
    """Coefficient grid -> absolute trajectory positions at `times`.

    Reference: calculate_trajectories_at_t + calculate_coords
    (src/modules/trajectory_net.py:101-119): evaluate basis at times and at
    the anchor time, subtract the anchor position, optionally add the pixel
    offsets of the tile mask.

    Args:
      coeff_grid: [B, 2K, H, W] or [B, S, 2K, H, W].
      times: [T].
      basis_fn: times [T] -> [T, K] (bound model.basis).

    Returns:
      [B, T, N, 2] trajectory positions.
    """
    if coeff_grid.ndim == 4:
        coeff_grid = coeff_grid[:, None]
    coeffs = coeffs_grid_to_list(coeff_grid, cfg.patch_size, cfg.num_basis)

    basis_t = basis_fn(times)                                     # [T, K]
    basis_anchor = basis_fn(jnp.full((1,), cfg.anchor_time,
                                     dtype=coeff_grid.dtype))     # [1, K]
    traj = compute_trajectories(coeffs, basis_t)                  # [B, T, N, 2]
    traj_anchor = compute_trajectories(coeffs, basis_anchor)      # [B, 1, N, 2]
    traj = traj - traj_anchor
    if add_offsets:
        traj = traj + _tile_offsets(cfg)[None, None]
    return traj


def _flow_from_coeffs(cfg: TrajectoryNetConfig, coeff_grid: jnp.ndarray,
                      basis_fn) -> jnp.ndarray:
    """Dense flow anchor->t_end from the coefficient grid (ref :121-140)."""
    if coeff_grid.ndim == 4:
        coeff_grid = coeff_grid[:, None]
    coeffs = coeffs_grid_to_list(coeff_grid, cfg.patch_size, cfg.num_basis)
    t_end = 1.0 if cfg.skip_frames == 1 else 1.0 / cfg.skip_frames
    ts = jnp.asarray([cfg.anchor_time, t_end], dtype=coeff_grid.dtype)
    traj = compute_trajectories(coeffs, basis_fn(ts))  # [B, 2, N, 2]
    traj_flow = traj[:, 1] - traj[:, 0]                # [B, N, 2]
    dense, _ = dense_flow_from_traj(traj_flow, cfg.patch_size, cfg.image_shape)
    return dense


def voxelize_batch_on_device(cfg: TrajectoryNetConfig,
                             events: jnp.ndarray,
                             sorted_cell_size: int | None = None
                             ) -> jnp.ndarray:
    """[B, M, 6] (y, x, t, p, bin, valid) -> [B, num_bins, H, W] voxel grids.

    Same semantics as the host/reference voxel path: trilinear vote with
    t_norm = t * (num_bins - 1) (the loader already normalized t to [0, 1]),
    then quantile clamp and mean_std/max normalization
    (src/loader/dsec/utils.py:29-75).

    sorted_cell_size: set to the loader's lut_cell_sort `s` when the events
    arrive cell-sorted — the trilinear vote then runs as the banded Pallas
    one-hot kernel (ops/pallas/voxel_vote.py, 167 vs 773 ms at b8 x 1M on
    v5e; bf16 tap tiles, ~0.25% of the vote magnitude) instead of the
    serialized XLA scatter.  Exact for any input; only speed needs the sort.
    (The production CLI voxelizes on the HOST instead — this device path
    serves --device-voxelize and event-sharded runs.)"""
    from ..ops.events import (clamp_voxel_grid_quantile, normalize_voxel_grid,
                              voxel_grid_from_events)

    h, w = cfg.image_shape

    if sorted_cell_size and h % sorted_cell_size == 0:
        from ..ops.pallas.voxel_vote import voxel_vote_pallas_sorted

        grids = voxel_vote_pallas_sorted(
            events, num_bins=cfg.num_bins, height=h, width=w,
            cell_size=sorted_cell_size,
            interpret=jax.default_backend() != "tpu")

        def post(grid):
            grid = clamp_voxel_grid_quantile(grid, cfg.voxel_quantile)
            return normalize_voxel_grid(grid, cfg.voxel_norm_type)

        return jax.vmap(post)(grids)

    def one(ev):
        grid = voxel_grid_from_events(
            ev[:, 0], ev[:, 1], ev[:, 2] * (cfg.num_bins - 1), ev[:, 3],
            ev[:, 5], num_bins=cfg.num_bins, height=h, width=w)
        grid = clamp_voxel_grid_quantile(grid, cfg.voxel_quantile)
        return normalize_voxel_grid(grid, cfg.voxel_norm_type)

    return jax.vmap(one)(events)


def _step(cfg: TrajectoryNetConfig, loss_cfg: FocusLossConfig,
          params, batch_stats, batch: Dict[str, jnp.ndarray], rng: jax.Array,
          train: bool, num_pos_events: int = -1):
    """Shared forward: voxel -> coeffs -> trajectories -> focus loss.

    Reference: TrajectoryNet.step (src/modules/trajectory_net.py:142-161).
    """
    if loss_cfg.interp_band_per_bin is None:
        # Per-bin interp banding is sound exactly when displacement grows
        # linearly from the t=0 anchor: |disp(t)| = |c1| * t (see
        # FocusLossConfig.interp_band_per_bin).
        loss_cfg = dataclasses.replace(
            loss_cfg, interp_band_per_bin=(
                cfg.basis_type == "polynomial" and cfg.num_basis == 1))

    model = TrajectoryModel(cfg)
    variables = {"params": params, "batch_stats": batch_stats}

    voxel = batch.get("voxel")
    if voxel is None:
        # Voxelize inside the jitted step from the raw padded events (the
        # --device-voxelize path; the CLI default ships host-voxelized
        # grids).  Cell-sorted batches (lut_cell_ends present, sort key
        # shared with the loss LUT) take the banded Pallas vote.
        sorted_s = None
        if ("lut_cell_ends" in batch
                and loss_cfg.num_bins == cfg.num_bins):
            sorted_s = loss_cfg.lut_superpixel_size
        voxel = voxelize_batch_on_device(cfg, batch["events"],
                                         sorted_cell_size=sorted_s)

    if train:
        coeff_grid, mutated = model.apply(
            variables, voxel, train=True, mutable=["batch_stats"])
        new_batch_stats = mutated["batch_stats"]
    else:
        coeff_grid = model.apply(variables, voxel, train=False)
        new_batch_stats = batch_stats

    def basis_fn(times):
        return model.apply({"params": params}, times,
                           method=TrajectoryModel.basis)

    times = get_reconstruction_times(loss_cfg, rng)
    traj = calculate_trajectories(cfg, coeff_grid, times,
                                  loss_cfg.is_needing_offsets, basis_fn)
    loss, log_data, misc = focus_loss(loss_cfg, traj, times, batch["events"],
                                      num_pos_events=num_pos_events,
                                      cell_ends=batch.get("lut_cell_ends"))
    misc["coeff_grid"] = coeff_grid
    return loss, (log_data, misc, new_batch_stats, basis_fn)


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array,
               cfg: TrajectoryNetConfig, loss_cfg: FocusLossConfig,
               num_pos_events: int = -1
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step.  Gradient reduction across the data axis happens
    automatically under pjit (XLA inserts the psum — reference analog: DDP
    NCCL all-reduce, SURVEY.md §2.2).

    `num_pos_events` is the *static* positive-event capacity from the collate
    (polarity-aware batching packs positives first; reference
    src/modules/data_loading.py:22-47 shares one NUM_POS_EVENTS scalar)."""

    def loss_fn(params):
        return _step(cfg, loss_cfg, params, state.batch_stats, batch, rng,
                     train=True, num_pos_events=num_pos_events)

    (loss, (log_data, _, new_bs, _)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads, batch_stats=new_bs)
    logs = {"train_losses/total": loss}
    logs.update({f"train_losses/{k}": v for k, v in log_data.items()})
    return state, logs


def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array,
              cfg: TrajectoryNetConfig, loss_cfg: FocusLossConfig,
              num_pos_events: int = -1) -> Dict[str, jnp.ndarray]:
    """Validation: loss + flow errors vs GT (reference :172-197)."""
    loss, (log_data, misc, _, basis_fn) = _step(
        cfg, loss_cfg, state.params, state.batch_stats, batch, rng,
        train=False, num_pos_events=num_pos_events)
    logs = {"val_losses/total": loss}
    logs.update({f"val_losses/{k}": v for k, v in log_data.items()})

    if "gt_flow" in batch:
        flow_pred = _flow_from_coeffs(cfg, misc["coeff_grid"], basis_fn)
        # Reference parity: OpticalFlowError.run passes batch['flow_valid']
        # as the mask into calculate_flow_error (src/utils/metrics.py:50-57),
        # so val EPE/AE/NPE average only over GT-valid pixels.  An optional
        # 'event_mask' (MVSEC-style) is intersected on top.
        mask = batch.get("flow_valid")
        event_mask = batch.get("event_mask")
        if mask is None:
            mask = event_mask
        elif event_mask is not None:
            if event_mask.ndim == 4:
                event_mask = event_mask[:, 0]
            if mask.ndim == 4:
                mask = mask[:, 0]
            mask = (mask > 0) & (event_mask > 0)
        errors = calculate_flow_error(batch["gt_flow"], flow_pred,
                                      event_mask=mask)
        logs.update({f"val_losses/{k}": v for k, v in errors.items()})
    return logs


def predict_flow(state: TrainState, voxel: jnp.ndarray,
                 cfg: TrajectoryNetConfig) -> jnp.ndarray:
    """Inference: voxel -> dense flow [B, 2, H, W] (reference predict_step
    :199-203 / dsec_inference.py:71-91)."""
    model = TrajectoryModel(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    coeff_grid = model.apply(variables, voxel, train=False)

    def basis_fn(times):
        return model.apply({"params": state.params}, times,
                           method=TrajectoryModel.basis)

    return _flow_from_coeffs(cfg, coeff_grid, basis_fn)
