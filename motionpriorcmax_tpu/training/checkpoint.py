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


def restore_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    """Restore into the structure of `state` (a TrainState template)."""
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        assert step is not None, f"no checkpoints under {path}"
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(state)))
    return state.replace(**restored), step


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
