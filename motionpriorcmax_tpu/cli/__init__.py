"""Entry-point layer (reference L6): one binary, four subcommands.

  python -m motionpriorcmax_tpu.cli flow-train --config ...
  python -m motionpriorcmax_tpu.cli dsec-infer --config ...
  python -m motionpriorcmax_tpu.cli traj-val --config-dir ... [overrides]
  python -m motionpriorcmax_tpu.cli extract-weights ckpt out.npz

Replaces scripts/{flow_training, dsec_inference, trajectory_inference,
extract_weights_from_checkpoint}.py.
"""

from .main import main

__all__ = ["main"]
