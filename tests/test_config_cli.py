"""Config system + CLI smoke tests."""

import subprocess
import sys

import numpy as np
import pytest

from motionpriorcmax_tpu.config import (apply_overrides, compose, deep_merge,
                                        load_yaml, propagate_config)


def test_propagate_config():
    cfg = load_yaml("config/flow_training/dsec.yaml")
    out = propagate_config(cfg)
    assert out["model"]["image_shape"] == (480, 640)
    assert out["loss"]["image_shape"] == (480, 640)
    assert out["model"]["num_bins"] == 15
    assert out["loss"]["num_bins"] == 15  # FOCUS propagation
    assert out["loss"]["polarity_aware_batching"] is True
    assert out["model"]["patch_size"] == 4


def test_compose_defaults_and_experiment():
    cfg = compose("config/trajectory_inference", "val",
                  ["checkpoint=/tmp/x", "dataset.path=/tmp/data"])
    assert cfg["model"]["num_bins"]["context"] == 41
    assert cfg["model"]["num_bins"]["correlation"] is None  # base default
    assert cfg["model"]["bezier_degree"] == 2
    assert cfg["dataset"]["flow_time"] == 300
    assert cfg["dataset"]["load_voxel_grid"] is True  # from dataset/base.yaml

    cfg2 = compose("config/trajectory_inference", "val",
                   ["experiment=raft-spline_evimo2-300ms_ours-selfsup",
                    "checkpoint=/tmp/x", "dataset.path=/tmp/data"])
    assert cfg2["model"]["num_bins"]["correlation"] == 25
    assert cfg2["model"]["bezier_degree"] == 10
    assert cfg2["model"]["correlation"]["ev"]["target_indices"] == [8, 16, 24, 32, 40]
    assert cfg2["loss"]["smooth_type"] == "on_flow_to_next"
    # Non-overridden groups survive the overlay merge.
    assert cfg2["model"]["hidden"]["dim"] == 128


def test_compose_missing_required():
    with pytest.raises(ValueError, match="checkpoint"):
        compose("config/trajectory_inference", "val", ["dataset.path=/tmp/d"])


def test_apply_overrides_types():
    cfg = apply_overrides({"a": {"b": 1}}, ["a.b=2", "a.c=[1,2]", "d=true"])
    assert cfg["a"]["b"] == 2 and cfg["a"]["c"] == [1, 2] and cfg["d"] is True


def test_deep_merge():
    out = deep_merge({"a": {"x": 1, "y": 2}}, {"a": {"y": 3}, "b": 4})
    assert out == {"a": {"x": 1, "y": 3}, "b": 4}


def test_cli_help():
    res = subprocess.run(
        [sys.executable, "-m", "motionpriorcmax_tpu.cli", "--help"],
        capture_output=True, text=True, timeout=120)
    assert res.returncode == 0
    for cmd in ("flow-train", "dsec-infer", "traj-val", "extract-weights"):
        assert cmd in res.stdout
