"""RAFTSpline: recurrent refinement of per-pixel curve parameters.

TPU-native redesign of the reference network (src/models/raft_spline/raft.py,
SURVEY.md C27).  Differences from the reference are structural, not
semantic: the curve object becomes a plain params array threaded through the
iteration loop; the corr pyramid is built once per forward from static config
lists; the encoder/update block are flax modules (extractor.py, update.py).

Pinned reference behavior:
  * voxel slicing: corr windows at [0] + target_indices, context = last
    nbins_context channels (raft.py:90-101)
  * context split tanh(net) / relu(inp) (raft.py:148-150)
  * lookup timestamps = dt * target_index with dt = 1/(nbins_context-1),
    images looked up at t=1 (raft.py:159, 169-177)
  * per-iteration: flows -> coords1 = coords0 + flows -> corr lookup ->
    GRU update -> params += delta -> convex upsample (raft.py:165-189)
  * optional detach of curve params per iteration (truncated BPTT,
    raft.py:165-167)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..basis_mlp import BasisMLP
from .corr import build_corr_pyramid, compute_corr_volume, lookup_corr_pyramid
from .curves import coords_grid, curve_params_init, cvx_upsample
from .extractor import BasicEncoder
from .update import BasicUpdateBlock


@dataclasses.dataclass(frozen=True)
class RAFTSplineConfig:
    """Leaf names match config/exe/trajectory_inference/model/*.yaml."""

    nbins_context: int = 41
    nbins_correlation: int = 25
    bezier_degree: int = 10
    curve_type: str = "BEZIER"          # BEZIER | POLYNOMIAL | LEARNED
    detach_bezier: bool = False
    use_events: bool = True
    use_boundary_images: bool = False
    ev_target_indices: Tuple[int, ...] = (8, 16, 24, 32, 40)
    ev_levels: Tuple[int, ...] = (1, 1, 1, 1, 4)
    img_levels: int = 4
    radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    context_norm: str = "batch"
    feature_dim: int = 256
    feature_norm: str = "instance"
    motion_dim: int = 128
    iters: int = 12
    # Freeze BatchNorm during training (reference freeze_bn, raft.py:74-77).
    freeze_bn: bool = False
    # Rematerialize the scanned iteration in the backward pass: activations
    # of the 12 refinement iterations are recomputed instead of stored
    # (jax.checkpoint), trading ~1 extra forward for ~10x less live memory —
    # required to fit the reference's batch-6 training config on one chip.
    remat_iters: bool = True
    # Rematerialize the feature/context encoders in the backward pass: their
    # saved conv activations ([6B, h, w, C] for the 6 stacked corr grids) are
    # the largest training allocations once the iteration loop is remat'ed —
    # recompute them for ~1 extra encoder forward.
    remat_encoders: bool = False
    # Storage dtype of the correlation pyramid ('float32' | 'bfloat16').
    # The dot products are always accumulated in f32 on the MXU; bfloat16
    # only affects the stored volumes and the window gathers — the largest
    # training-memory objects ([T, B, h1*w1, h2, w2]) — halving them.  The
    # looked-up features are cast back to f32 before the update block.
    corr_dtype: str = "float32"
    # Conv compute dtype for the encoders + update block ('float32' |
    # 'bfloat16'): bf16 runs the conv stacks on the MXU at 4x the v5e f32
    # rate with f32 params; the GRU carry, curve-params accumulation, delta
    # and mask head outputs stay f32 (update.py docstring).  f32 default for
    # reference parity.
    compute_dtype: str = "float32"
    # Corr window-extraction impl: 'einsum' (per-map one-hot matmuls, the
    # measured v5e default) | 'einsum_blocked' (block-diagonal dense
    # matmuls) | 'pallas' (VPU masked-select kernel; measured slower on
    # v5e).  None = auto ('einsum').  See corr.py::_window_lookup.
    corr_lookup_impl: Optional[str] = None
    # Rematerialization policy for the scanned iteration body (only with
    # remat_iters).  None = full remat (recompute everything).  'dots' =
    # jax.checkpoint_policies.checkpoint_dots: conv/matmul RESULTS are
    # saved and only elementwise work is recomputed in the backward —
    # trades iteration-activation memory for skipping the MXU half of the
    # re-forward.  'dots_window' = dots PLUS the 'corr_window' named
    # residuals (the Pallas window extraction is not a dot, so plain
    # 'dots' recomputes it in the backward; saving the [N, win, win]
    # windows costs ~45 MB/iteration at EVIMO2 b6 and skips the
    # re-extraction).  The production recipe.
    remat_policy: Optional[str] = None

    def __post_init__(self):
        assert self.use_events or self.use_boundary_images
        if self.use_events:
            assert 0 not in self.ev_target_indices
            assert len(self.ev_target_indices) == len(self.ev_levels) > 0
            assert max(self.ev_target_indices) < self.nbins_context
        assert self.bezier_degree >= 1

    @property
    def nbins_total(self) -> int:
        # Invariant nbins_total = context + corr - 1 (multiflow/sample.py:62,
        # asserted at src/modules/raft_spline.py:107-108).
        return self.nbins_context + self.nbins_correlation - 1

    @property
    def param_dim(self) -> int:
        return 2 * self.bezier_degree


class RAFTSpline(nn.Module):
    cfg: RAFTSplineConfig

    def setup(self):
        cfg = self.cfg
        # static_argnums=(2,): the positional `train` flag drives python
        # control flow (norm selection) and must stay a trace-time constant.
        enc = (nn.remat(BasicEncoder, static_argnums=(2,), prevent_cse=False)
               if cfg.remat_encoders else BasicEncoder)
        cdt = jnp.dtype(cfg.compute_dtype)
        context_in = 0
        if cfg.use_events:
            self.fnet_ev = enc(output_dim=cfg.feature_dim,
                               norm_fn=cfg.feature_norm, dtype=cdt)
            context_in += cfg.nbins_context
        if cfg.use_boundary_images:
            self.fnet_img = enc(output_dim=cfg.feature_dim,
                                norm_fn=cfg.feature_norm, dtype=cdt)
            context_in += 3
        self.cnet = enc(output_dim=cfg.hidden_dim + cfg.context_dim,
                        norm_fn=cfg.context_norm, dtype=cdt)
        self.update_block = BasicUpdateBlock(param_dim=cfg.param_dim,
                                             hidden_dim=cfg.hidden_dim,
                                             motion_dim=cfg.motion_dim,
                                             dtype=cdt)
        if cfg.curve_type == "LEARNED":
            # 3-layer ReLU MLP (src/modules/raft_spline.py:29-35).
            self.basis_mlp = BasisMLP(cfg.bezier_degree, depth=2,
                                      activation="relu")

    def gen_voxel_grids(self, voxel_grid: jnp.ndarray):
        """Slice corr windows + context grid (raft.py:90-101)."""
        cfg = self.cfg
        assert voxel_grid.shape[1] == cfg.nbins_total, (
            voxel_grid.shape, cfg.nbins_total)
        corr_grids = [voxel_grid[:, idx:idx + cfg.nbins_correlation]
                      for idx in (0, *cfg.ev_target_indices)]
        context_grid = voxel_grid[:, -cfg.nbins_context:]
        return corr_grids, context_grid

    def _basis_apply(self):
        if self.cfg.curve_type == "LEARNED":
            return self.basis_mlp
        return None

    def __call__(self,
                 voxel_grid: Optional[jnp.ndarray] = None,
                 images: Optional[Sequence[jnp.ndarray]] = None,
                 iters: Optional[int] = None,
                 flow_init: Optional[jnp.ndarray] = None,
                 test_mode: bool = False,
                 train: bool = False,
                 return_sequences: bool = False):
        cfg = self.cfg
        iters = cfg.iters if iters is None else iters

        pyramids = []          # list of (pyramid, lookup_timestamps per target)
        lookup_ts: List[float] = []
        context_input = None
        levels_all: List[int] = []
        corr_volumes = []

        if cfg.use_events:
            assert voxel_grid is not None
            corr_grids, context_input = self.gen_voxel_grids(voxel_grid)
            fmaps = self.fnet_ev(corr_grids, train and not cfg.freeze_bn)
            fmaps = [f.astype(jnp.float32) for f in fmaps]
            fmap1 = fmaps[0]
            fmap2 = jnp.stack(fmaps[1:], axis=0)
            corr_volumes.append(compute_corr_volume(fmap1, fmap2))
            levels_all.extend(cfg.ev_levels)
            dt = 1.0 / (cfg.nbins_context - 1)
            lookup_ts.extend(dt * i for i in cfg.ev_target_indices)

        if cfg.use_boundary_images:
            assert images is not None and len(images) == 2
            imgs = [2.0 * (im.astype(jnp.float32) / 255.0) - 1.0 for im in images]
            fm = self.fnet_img(imgs, train and not cfg.freeze_bn)
            corr_volumes.append(compute_corr_volume(fm[0], fm[1][None]))
            levels_all.append(cfg.img_levels)
            lookup_ts.append(1.0)
            context_input = (imgs[0] if context_input is None
                             else jnp.concatenate([context_input, imgs[0]], axis=1))

        assert context_input is not None
        corr = jnp.concatenate(corr_volumes, axis=0)
        corr = corr.astype(jnp.dtype(cfg.corr_dtype))
        pyramid = build_corr_pyramid(corr, levels_all)

        cnet = self.cnet(context_input,
                         train and not cfg.freeze_bn).astype(jnp.float32)
        # f32: `net` is the scan carry (the GRU returns it in f32).
        net = jnp.tanh(cnet[:, :cfg.hidden_dim])
        inp = jax.nn.relu(cnet[:, cfg.hidden_dim:])

        b, _, h, w = context_input.shape
        coords0 = coords_grid(b, h // 8, w // 8)
        params = curve_params_init(b, cfg.bezier_degree, h, w, 8)
        if flow_init is not None:
            params = params + flow_init

        ts = jnp.asarray(lookup_ts, jnp.float32)
        # The basis matrix is iteration-independent — evaluate it once
        # outside the loop (also keeps the learned-basis MLP call out of the
        # scanned body).
        from .curves import curve_basis_matrix

        basis_mat = curve_basis_matrix(ts, cfg.bezier_degree, cfg.curve_type,
                                       self._basis_apply())  # [T, P]

        def body(mdl, carry, _):
            net_c, params_c = carry
            if cfg.detach_bezier:
                params_c = jax.lax.stop_gradient(params_c)
            bsz, ch = params_c.shape[:2]
            pv = params_c.reshape(bsz, 2, cfg.bezier_degree,
                                  *params_c.shape[2:])
            flows = jnp.einsum("bdphw,tp->tbdhw", pv, basis_mat)
            coords1 = coords0[None] + flows
            corr_total = lookup_corr_pyramid(
                pyramid, coords1, cfg.radius,
                cfg.corr_lookup_impl).astype(jnp.float32)
            net_c, up_mask, delta = mdl.update_block(net_c, inp, corr_total,
                                                     params_c)
            params_c = params_c + delta
            return (net_c, params_c), (params_c, up_mask)

        # lax.scan shares one compiled iteration body across the 12 steps
        # (the unrolled loop compiles ~iters x slower); nn.scan threads the
        # shared update-block parameters through the loop.
        if cfg.remat_iters:
            policy = None
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.checkpoint_dots
            elif cfg.remat_policy == "dots_window":
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.checkpoint_dots,
                    jax.checkpoint_policies.save_only_these_names(
                        "corr_window"))
            elif cfg.remat_policy is not None:
                raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
            scan_body = nn.remat(body, prevent_cse=False, policy=policy)
        else:
            scan_body = body
        scan = nn.scan(
            scan_body,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=iters,
        )
        (net, params), (params_seq, mask_seq) = scan(self, (net, params), None)

        if test_mode:
            params_up = cvx_upsample(params_seq[-1], mask_seq[-1])
            return params, params_up
        if return_sequences:
            # Raw low-res per-iteration curve params + upsample masks
            # ([iters, B, 2*deg, h/8, w/8], [iters, B, 576, h/8, w/8]) for
            # callers that upsample per iteration themselves (e.g. the
            # supervised train step's checkpointed loss loop) — stacking all
            # full-res upsampled predictions costs iters x B x 2*deg x H x W
            # and its backward once materialized a 9 GB padded copy.
            return params_seq, mask_seq
        # Train mode: one convex-upsampled prediction per iteration
        # (raft.py:187-189), vmapped over the iteration axis.
        ups = jax.vmap(cvx_upsample)(params_seq, mask_seq)
        return [ups[i] for i in range(iters)]
