"""Test configuration: force an 8-device virtual CPU mesh and float64.

Multi-chip sharding is validated on a reshaped single-host mesh (SURVEY.md §4
implication 4); real-TPU behavior is covered by bench.py / the driver's
compile checks.  Must run before the first `import jax` anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The harness presets JAX_PLATFORMS=axon (the tunneled real TPU) and pytest
# itself already imports jax._src, so the env var is latched — override via
# the live config instead.
#
# CHIP TIER (round 5, advisor r3): CILQR_TPU_TEST_TPU=1 keeps the real
# platform so `pytest -m tpu` runs the compiled bit-identity checks on the
# actual chip (tests/test_tpu_chip.py).  In that mode the CPU-tier tests
# are auto-skipped (and vice versa) by pytest_collection_modifyitems below
# — f64 fixtures and interpret-mode kernels don't mix with the TPU.
TPU_TIER = os.environ.get("CILQR_TPU_TEST_TPU") == "1"
if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the heavy closed-loop / sharded-mesh tests
# are compile-bound on CPU; caching XLA executables across test runs cuts
# the full tier's wall time on any warm machine.  Shared policy with the
# CLI (utils/compile_cache.py); CILQR_TPU_CACHE_DIR="" disables.
from cilqr_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cilqr_tpu.utils.params import SolverParams  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Keep the CPU and chip tiers disjoint regardless of -m selection:
    tpu-marked tests need the real platform (CILQR_TPU_TEST_TPU=1) and the
    CPU tier needs f64 + interpret mode, so running either on the wrong
    platform would fail for environmental, not product, reasons."""
    if TPU_TIER:
        skip = pytest.mark.skip(
            reason="CPU-tier test (CILQR_TPU_TEST_TPU=1 runs only -m tpu)")
        for it in items:
            if "tpu" not in it.keywords:
                it.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="chip-tier test: run CILQR_TPU_TEST_TPU=1 pytest -m tpu")
        for it in items:
            if "tpu" in it.keywords:
                it.add_marker(skip)


@pytest.fixture(scope="session")
def params() -> SolverParams:
    return SolverParams()


def make_global_plan(n=120, dtype=np.float64):
    """A gently curving CARLA-like lane at Town02-scale coordinates."""
    s = np.linspace(0.0, 119.0, n)
    x = 90.0 + s
    y = -306.0 + 2.5 * np.sin(0.03 * s) + 0.01 * s
    return np.stack([x, y], axis=1).astype(dtype)


@pytest.fixture(scope="session")
def global_plan():
    return make_global_plan()


@pytest.fixture(scope="session")
def ego_state():
    return np.array([100.0, -305.6, 4.0, 0.05])
