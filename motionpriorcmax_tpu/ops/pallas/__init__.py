"""Pallas TPU kernels for the hot ops.

Kernels swap in behind the same signatures as their XLA implementations;
every kernel has an interpret-mode path so tests run on CPU.
"""

from .softmax_interp import softmax_interp_pallas, softmax_interp_reference

__all__ = ["softmax_interp_pallas", "softmax_interp_reference"]
