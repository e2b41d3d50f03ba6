"""MotionPriorCMax-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
motion-prior contrast-maximization dense continuous-time motion estimation.

Re-designed from scratch for TPU hardware with the capabilities of the
reference PyTorch codebase tub-rip/MotionPriorCMax (ECCV 2024,
arXiv:2407.10802).  This is NOT a port: the compute path is pure-functional
JAX (jit/grad/pjit over a device mesh), the hot kernels are XLA ops or
Pallas TPU kernels, and data pipelines are host-side NumPy/C++.

Layer map (mirrors reference SURVEY.md §1, rebuilt TPU-first):
  ops/       event/geometry primitives (voxelize, IWE, basis, KNN, ...)
  losses/    contrast-maximization (Focus) objective
  models/    UNet + RAFT-Spline (flax.linen)
  data/      DSEC / EVIMO2 / MultiFlow host-side input pipelines
  training/  functional train/eval steps, optimizer, checkpointing, metrics
  parallel/  mesh construction, sharding rules, event-axis parallelism
  utils/     visualization, logging, PNG IO
"""

__version__ = "0.1.0"
