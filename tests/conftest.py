"""Test configuration: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding tests run against this fake mesh (SURVEY.md §4: sharded
vs single-device numerical equality is how we test multi-node without a real
cluster).  Must run before jax initializes its backends, hence the env vars
at import time.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# jax may already be imported by a site hook (with another default platform);
# a config update still wins as long as no backend has been initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
