"""Test configuration: force a virtual 8-device CPU mesh.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware (the reference has no distributed tests at
all; see SURVEY.md §4).  Must run before jax initializes.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
