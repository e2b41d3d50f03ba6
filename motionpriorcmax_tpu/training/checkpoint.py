"""Checkpointing (orbax) + reference-checkpoint ingestion.

Replaces the reference's Lightning ModelCheckpoint / load_from_checkpoint
stack (SURVEY.md §5.4):
  * save/restore of the full TrainState (params, opt_state, batch_stats,
    step) via orbax — the resume path (scripts/flow_training.py:98-103)
  * `extract_model_weights`: Lightning .ckpt -> bare weights dict, stripping
    the 'model.' prefix (scripts/extract_weights_from_checkpoint.py:7-22)
  * `torch_unet_to_flax`: map a reference UNet state_dict (.pth) onto this
    framework's flax UNet parameter tree, for running published checkpoints
    through our eval protocol (BASELINE.md parity procedure)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Orbax state checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 5,
                    metric: Optional[float] = None,
                    mode: str = "min") -> None:
    """Save the state; with `metric` given, retention keeps the best-k
    checkpoints by that metric (reference ModelCheckpoint save_top_k=5 on
    val_losses/EPE, scripts/flow_training.py:110-116)."""
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute()
    path.mkdir(parents=True, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=keep)
    if metric is not None:
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            best_fn=lambda m: m["metric"],
            best_mode=mode,
        )
    with ocp.CheckpointManager(path, options=options) as mgr:
        kwargs = {}
        if metric is not None:
            kwargs["metrics"] = {"metric": float(metric)}
        mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state)), **kwargs)
        mgr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, state, step: Optional[int] = None,
                       best: bool = False, mode: str = "min"):
    """Restore into the structure of `state` (a TrainState template).

    With `best=True`, restore the best-metric retained checkpoint (written by
    save_checkpoint(metric=...)) instead of the latest — the inference analog
    of the reference loading its ModelCheckpoint best artifact
    (scripts/extract_weights_from_checkpoint.py feeds dsec_inference.py:51-55).
    """
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute()
    options = None
    if best:
        options = ocp.CheckpointManagerOptions(
            best_fn=lambda m: m["metric"], best_mode=mode)
    with ocp.CheckpointManager(path, options=options) as mgr:
        if step is None:
            step = (mgr.best_step() if best else None) or mgr.latest_step()
        assert step is not None, f"no checkpoints under {path}"
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(state)))
    return state.replace(**restored), step


def restore_raw_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                           best: bool = False, mode: str = "min"):
    """Restore a checkpoint WITHOUT a template — returns the raw saved
    pytree (nested dicts of numpy arrays: params / opt_state / batch_stats /
    step).  Used by `extract-weights` on the framework's own orbax artifacts
    (reference analog: scripts/extract_weights_from_checkpoint.py:7-22)."""
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute()
    options = None
    if best:
        options = ocp.CheckpointManagerOptions(
            best_fn=lambda m: m["metric"], best_mode=mode)
    with ocp.CheckpointManager(path, options=options) as mgr:
        if step is None:
            step = (mgr.best_step() if best else None) or mgr.latest_step()
        assert step is not None, f"no checkpoints under {path}"
        return mgr.restore(step), step


def flatten_model_weights(tree: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """Nested param/stat dict -> {'prefix/a/b': array} flat npz-friendly keys."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {prefix + "/" + "/".join(k.key for k in keypath): np.asarray(v)
            for keypath, v in flat}


def unflatten_model_weights(flat: Dict[str, np.ndarray]
                            ) -> Tuple[Dict, Dict]:
    """Inverse of flatten_model_weights over the 'params'/'batch_stats'
    prefixes -> (params, batch_stats) nested trees."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        tree = {"params": params, "batch_stats": stats}[parts[0]]
        node = tree
        for p in parts[1:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return params, stats


def _to_pytree(state) -> Dict[str, Any]:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "step": state.step,
    }


# ---------------------------------------------------------------------------
# Reference checkpoint ingestion
# ---------------------------------------------------------------------------

def extract_model_weights(ckpt_path: str, prefix: str = "model.") -> Dict[str, np.ndarray]:
    """Lightning .ckpt/.pth -> {stripped_key: numpy array}.

    Equivalent of scripts/extract_weights_from_checkpoint.py:7-22; also
    accepts a bare state_dict .pth (no 'state_dict' wrapper).
    """
    import torch

    blob = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for key, value in state_dict.items():
        if key.startswith(prefix):
            key = key[len(prefix):]
        out[key] = value.detach().numpy()
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    return np.transpose(w, (2, 3, 1, 0))


def _tconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight [in, out, kh, kw] -> flax ConvTranspose
    kernel [kh, kw, in, out] with spatially flipped taps (flax ConvTranspose
    is a fractionally-strided conv with an unflipped kernel; torch's is the
    conv gradient, which flips)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def torch_unet_to_flax(state_dict: Dict[str, np.ndarray]
                       ) -> Tuple[Dict, Dict]:
    """Reference UNet state_dict -> (params, batch_stats) for models.unet.UNet.

    Key layout of the reference model (src/models/unet/unet_model.py:13-23):
      inc.double_conv.{0,3}           conv           -> DoubleConv_0.Conv_{0,1}
      inc.double_conv.{1,4}           batchnorm      -> DoubleConv_0.BatchNorm_{0,1}
      down{i}.maxpool_conv.1.*        i=1..4         -> Down_{i-1}.DoubleConv_0.*
      up{i}.up                        convtranspose  -> Up_{i-1}.ConvTranspose_0
      up{i}.conv.*                                   -> Up_{i-1}.DoubleConv_0.*
      outc.conv                       1x1 conv       -> Conv_0
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def convert_double_conv(src_prefix: str, dst_prefix: Tuple[str, ...]):
        for j, idx in enumerate((0, 3)):  # conv layers
            w = state_dict[f"{src_prefix}.{idx}.weight"]
            put(params, dst_prefix + (f"Conv_{j}", "kernel"), _conv(w))
        for j, idx in enumerate((1, 4)):  # batchnorm layers
            base = f"{src_prefix}.{idx}"
            put(params, dst_prefix + (f"BatchNorm_{j}", "scale"),
                state_dict[f"{base}.weight"])
            put(params, dst_prefix + (f"BatchNorm_{j}", "bias"),
                state_dict[f"{base}.bias"])
            put(stats, dst_prefix + (f"BatchNorm_{j}", "mean"),
                state_dict[f"{base}.running_mean"])
            put(stats, dst_prefix + (f"BatchNorm_{j}", "var"),
                state_dict[f"{base}.running_var"])

    convert_double_conv("inc.double_conv", ("DoubleConv_0",))
    for i in range(1, 5):
        convert_double_conv(f"down{i}.maxpool_conv.1.double_conv",
                            (f"Down_{i-1}", "DoubleConv_0"))
    for i in range(1, 5):
        dst = (f"Up_{i-1}",)
        put(params, dst + ("ConvTranspose_0", "kernel"),
            _tconv(state_dict[f"up{i}.up.weight"]))
        put(params, dst + ("ConvTranspose_0", "bias"),
            state_dict[f"up{i}.up.bias"])
        convert_double_conv(f"up{i}.conv.double_conv", dst + ("DoubleConv_0",))
    put(params, ("Conv_0", "kernel"), _conv(state_dict["outc.conv.weight"]))
    put(params, ("Conv_0", "bias"), state_dict["outc.conv.bias"])
    return params, stats


# -- RAFT-Spline torch checkpoint conversion ---------------------------------
#
# The reference's encoder/update internals live in a `parts/` package MISSING
# from the snapshot (src/models/raft_spline/raft.py:6-7, SURVEY.md C31); the
# key layout below targets the canonical RAFT/E-RAFT naming that lineage uses
# (conv1/norm1/layer{1-3}/conv2 encoders; encoder.convc*/gru.convz*/flow_head
# update block).  Top-level module names ARE pinned by the snapshot:
# fnet_ev / fnet_img / cnet / update_block (raft.py:58-72).

_ENC_LAYER = {f"layer{l}.{j}": f"ResidualBlock_{2 * (l - 1) + j}"
              for l in (1, 2, 3) for j in (0, 1)}
_ENC_CONV = {"conv1": "Conv_0", "conv2": "Conv_1"}
_BLOCK_CONV = {"conv1": "Conv_0", "conv2": "Conv_1", "downsample.0": "Conv_2"}
_BLOCK_NORM = {"norm1": "BatchNorm_0", "norm2": "BatchNorm_1",
               "norm3": "BatchNorm_2"}
_UPD_CONV = {
    "encoder.convc1": ("BasicMotionEncoder_0", "Conv_0"),
    "encoder.convc2": ("BasicMotionEncoder_0", "Conv_1"),
    "encoder.convf1": ("BasicMotionEncoder_0", "Conv_2"),
    "encoder.convf2": ("BasicMotionEncoder_0", "Conv_3"),
    "encoder.conv": ("BasicMotionEncoder_0", "Conv_4"),
    "gru.convz1": ("SepConvGRU_0", "Conv_0"),
    "gru.convr1": ("SepConvGRU_0", "Conv_1"),
    "gru.convq1": ("SepConvGRU_0", "Conv_2"),
    "gru.convz2": ("SepConvGRU_0", "Conv_3"),
    "gru.convr2": ("SepConvGRU_0", "Conv_4"),
    "gru.convq2": ("SepConvGRU_0", "Conv_5"),
    "flow_head.conv1": ("DeltaHead_0", "Conv_0"),
    "flow_head.conv2": ("DeltaHead_0", "Conv_1"),
    "mask.0": ("Conv_0",),
    "mask.2": ("Conv_1",),
}


def raft_spline_torch_key(path: Tuple[str, ...], leaf: str) -> Optional[str]:
    """flax param tree path -> expected torch state-dict key (None = no
    torch analog, e.g. non-affine instance norms)."""
    top = path[0]
    if top not in ("fnet_ev", "fnet_img", "cnet", "update_block"):
        return None
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}[leaf]
    if top == "update_block":
        for torch_mid, flax_mid in _UPD_CONV.items():
            if tuple(path[1:]) == flax_mid:
                return f"update_block.{torch_mid}.{suffix}"
        return None
    # Encoders.
    rest = path[1:]
    if len(rest) == 1:  # top-level conv / norm1
        name = rest[0]
        for torch_name, flax_name in _ENC_CONV.items():
            if name == flax_name:
                return f"{top}.{torch_name}.{suffix}"
        if name == "BatchNorm_0":
            return f"{top}.norm1.{suffix}"
        return None
    block, name = rest[0], rest[1]
    for torch_blk, flax_blk in _ENC_LAYER.items():
        if block == flax_blk:
            for torch_name, flax_name in _BLOCK_CONV.items():
                if name == flax_name:
                    return f"{top}.{torch_blk}.{torch_name}.{suffix}"
            for torch_name, flax_name in _BLOCK_NORM.items():
                if name == flax_name:
                    return f"{top}.{torch_blk}.{torch_name}.{suffix}"
    return None


def _torch_key_aliases(torch_key: str) -> Tuple[str, ...]:
    """Alternate torch state-dict names for the same parameter.

    In the canonical RAFT ResidualBlock the third norm is registered BOTH as
    `norm3` and inside `downsample.1` (the nn.Sequential shares the module),
    so a real checkpoint carries the tensor under either or both names.
    """
    if ".norm3." in torch_key:
        return (torch_key, torch_key.replace(".norm3.", ".downsample.1."))
    return (torch_key,)


def torch_raft_spline_to_flax(state_dict: Dict[str, np.ndarray],
                              template: Dict[str, Any]) -> Dict[str, Any]:
    """Canonical RAFT/E-RAFT state_dict -> RAFTSpline flax variables.

    Args:
      state_dict: torch tensors/arrays keyed fnet_ev.* / cnet.* /
        update_block.* (+ fnet_img.* when use_boundary_images).
      template: variables from RAFTSpline.init (pins tree structure +
        shapes; instance norms have no torch analog and keep template
        values — they are non-affine, so there is nothing to load).

    Returns:
      variables dict with converted 'params' / 'batch_stats'.

    Raises:
      KeyError with a TWO-SIDED diagnostic when the torch naming and the
      expected canonical RAFT layout disagree: every flax leaf whose torch
      key is absent (missing) AND every torch key (with its shape) that no
      flax leaf consumed (unconsumed) — so a checkpoint whose update block
      is named, say, `motion_encoder.*` reports both lists instead of a
      bare KeyError.  Shape mismatches raise ValueError.  BatchNorm
      `num_batches_tracked` counters are ignored (flax BatchNorm keeps no
      analog).
    """
    import jax

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    missing = []
    consumed = set()

    def convert(collection_name, tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for keypath, val in flat:
            path = tuple(k.key for k in keypath)
            torch_key = raft_spline_torch_key(path[:-1], path[-1])
            if torch_key is None:
                out[path] = val
                continue
            candidates = _torch_key_aliases(torch_key)
            present = [k for k in candidates if k in sd]
            consumed.update(present)
            if not present:
                missing.append(torch_key)
                out[path] = val
                continue
            w = sd[present[0]]
            if path[-1] == "kernel":
                w = _conv(w)
            if tuple(w.shape) != tuple(np.shape(val)):
                raise ValueError(
                    f"{present[0]} -> {'/'.join(path)}: shape {w.shape} "
                    f"!= template {np.shape(val)}")
            out[path] = w
        # Rebuild the nested dict.
        nested: Dict[str, Any] = {}
        for path, val in out.items():
            node = nested
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = val
        return nested

    variables = {"params": convert("params", template["params"])}
    if template.get("batch_stats"):
        variables["batch_stats"] = convert("batch_stats",
                                           template["batch_stats"])
    unconsumed = sorted(k for k in sd if k not in consumed
                        and not k.endswith("num_batches_tracked"))
    if missing or unconsumed:
        def head(items, n=8):
            items = sorted(set(items))
            tail = f" (+{len(items) - n} more)" if len(items) > n else ""
            return f"{items[:n]}{tail}"

        unconsumed_shapes = [f"{k}{tuple(sd[k].shape)}" for k in unconsumed]
        raise KeyError(
            "torch<->flax key layout mismatch. "
            f"missing torch keys (expected by the flax tree): {head(missing)}; "
            f"unconsumed torch keys (present but unmapped): "
            f"{head(unconsumed_shapes)}")
    return variables
