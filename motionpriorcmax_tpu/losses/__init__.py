"""Self-supervised contrast-maximization losses (reference layer L3).

The reference exposes losses through a LossFactory over TrajectoryLossBase
subclasses (src/losses/__init__.py:5-11, src/losses/base.py:4-14).  Here a
loss is a frozen config dataclass + pure functions; `make_loss` keeps the
factory-style entry point for config-driven construction.
"""

from .focus import FocusLossConfig, get_reconstruction_times, focus_loss

_LOSSES = {"FOCUS": FocusLossConfig}


def make_loss(loss_name: str, **kwargs) -> FocusLossConfig:
    """Factory matching reference LossFactory.get_loss_calculator
    (src/losses/__init__.py:7-11; the never-used profiler hook is dropped)."""
    try:
        cls = _LOSSES[loss_name]
    except KeyError:
        raise ValueError(f"unknown loss {loss_name!r}") from None
    fields = set(cls.__dataclass_fields__)
    return cls(**{k: v for k, v in kwargs.items() if k in fields})


__all__ = ["FocusLossConfig", "get_reconstruction_times", "focus_loss", "make_loss"]
