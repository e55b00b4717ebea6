"""Test configuration: force a virtual 8-device CPU mesh.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware (the reference has no distributed tests at
all; see SURVEY.md §4).

Note: a site-level PJRT plugin may register a remote TPU backend at
interpreter start and force `jax_platforms` via `jax.config.update`, which
overrides the JAX_PLATFORMS env var.  `jax.config.update` below wins over
both; XLA_FLAGS must still be set before the CPU backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process; near the end of the suite the next LLVM compile can segfault
    (observed in jax compiler.backend_compile_and_load on this 1-core
    host).  Per-module cache clearing keeps within-module jit reuse (the
    expensive fused-runner compiles are shared within a module) while
    bounding process-lifetime compiler state.
    """
    yield
    jax.clear_caches()
