"""Test configuration: force an 8-virtual-device CPU mesh before jax imports.

This is the standard JAX trick for testing pjit/shard_map sharding logic on a
single host (SURVEY.md §4 "Distributed without a cluster"). Must run before
any `import jax` in the test process, hence env mutation at conftest import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The env image's TPU plugin ("axon") overrides the JAX_PLATFORMS env var at
# import; only the config API reliably forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")

# XLA:CPU's oneDNN matmul silently drops to bf16-fastmath for some shapes,
# breaking f32 parity tests at ~0.5% error; force full-precision matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: scanned-forward compiles dominate test wall-clock
# on CPU; cache them across runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawns, big sweeps)"
    )
