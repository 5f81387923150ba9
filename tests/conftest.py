"""Test harness: 8 virtual CPU devices so mesh/pjit/collective tests run
without TPU hardware (SURVEY.md §4 'distributed without a cluster')."""

import os

# force CPU even if the session env points at a TPU (tests must not ride the
# slow axon tunnel, and oracle comparisons assume f32 CPU matmuls)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by a pytest plugin, so the env var alone is not
# enough — set the config knob too (effective until first backend init).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# XLA-CPU compiles dominate suite runtime on this 2-vCPU box; persist them.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
