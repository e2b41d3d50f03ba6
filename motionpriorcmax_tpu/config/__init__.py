"""Config layer (reference L7): YAML + propagate_config, and a minimal
Hydra-style composer for the trajectory workload.

The reference runs two config systems (SURVEY.md §5.6): plain YAML with an
imperative `propagate_config` fan-out (scripts/flow_training.py:34-52), and
Hydra 1.3 composition (defaults lists, `+experiment=` global-package
overlays, `???` required fields).  Leaf names here are identical, so the
reference's experiment YAMLs translate 1:1.
"""

from .core import (
    load_yaml,
    propagate_config,
    compose,
    apply_overrides,
    deep_merge,
    MISSING,
)

__all__ = [
    "load_yaml",
    "propagate_config",
    "compose",
    "apply_overrides",
    "deep_merge",
    "MISSING",
]
