"""On-chip regression tests — run MANUALLY on a real TPU:

    python -m pytest tests_tpu/ -q

(Excluded from the default suite by pytest.ini's `testpaths = tests`; the
CPU conftest there forces JAX onto a virtual-device CPU mesh, these tests
need the real backend.)  One TPU process at a time — never run this
concurrently with bench.py or another TPU job (see CLAUDE.md).

Rationale: interpret-mode Pallas hides real-hardware behavior — the
round-2 interp cross-term bug (Mosaic DEFAULT dot result rounding) passed
every CPU test and corrupted on-chip results only.  These tests pin the
on-chip numerics of the kernels that have burned us.
"""

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="needs a real TPU backend")
    for item in items:
        item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
