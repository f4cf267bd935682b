"""Test configuration: force an 8-virtual-device CPU mesh before JAX loads.

Mirrors the standard JAX recipe for testing pjit/shard_map sharding logic
without TPU hardware (SURVEY.md §4).

This environment pre-registers a TPU PJRT plugin ("axon") from a
sitecustomize hook which calls ``jax.config.update("jax_platforms", ...)``,
overriding the JAX_PLATFORMS env var — so we must override the *config*
after import, before any backend initializes.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model-graph compiles dominate suite wall
# time; caching them across runs cuts the suite from ~45 to a few minutes.
_cache_dir = os.environ.get(
    "DETECTAX_TEST_CACHE", "/root/.cache/detectax_xla_cache"
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
