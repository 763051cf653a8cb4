"""Test configuration: force an 8-device virtual CPU mesh.

Parity with the reference test strategy (SURVEY.md §4): CPU is the golden
oracle; accelerator-specific tests skip when no TPU (GTEST_SKIP analogue).
Multi-device sharding tests run on 8 virtual CPU devices via XLA_FLAGS, as
the driver's dryrun does.
"""

import os

# Must be set before jax import — force CPU with 8 virtual devices.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: this box has 2 CPUs and slow compiles;
# caching makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Oracle computations in tests must be exact f32 (this JAX build defaults
# matmuls to fast low-precision passes even for f32 inputs).
jax.config.update("jax_default_matmul_precision", "highest")
# The environment may pre-register an accelerator plugin that overrides
# JAX_PLATFORMS (sitecustomize). Force the CPU mesh for tests explicitly.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session", autouse=True)
def _init_framework():
    import mila_tpu

    mila_tpu.initialize(seed=42)
    yield


@pytest.fixture
def rng_key():
    return jax.random.key(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)


def requires_tpu():
    """Skip marker for tests that need real TPU hardware."""
    try:
        has_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
    except Exception:
        has_tpu = False
    return pytest.mark.skipif(not has_tpu, reason="no TPU available")
