"""Training-module layer (reference L4/L5): functional train/eval steps.

Replaces PyTorch Lightning with pure-functional JAX: a TrainState pytree,
jit/pjit-compiled step functions, optax optimizers, orbax checkpoints.
"""

from .trajectory_net import (
    TrajectoryNetConfig,
    TrajectoryModel,
    create_train_state,
    train_step,
    eval_step,
    predict_flow,
)

__all__ = [
    "TrajectoryNetConfig",
    "TrajectoryModel",
    "create_train_state",
    "train_step",
    "eval_step",
    "predict_flow",
]
