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

# Persistent compile cache: DISABLED for the CPU suite. XLA:CPU's AOT
# cache entries are unreliable on this image (cpu_aot_loader warns
# "machine type mismatch ... could lead to SIGILL" on load, and the suite
# segfaulted deterministically inside backend_compile_and_load /
# _compile_and_write_cache with the cache on — r4, reproduced across
# fresh cache dirs). TPU benches keep their own cache via
# utils.jax_setup.enable_persistent_cache (different backend, unaffected).
# Cost: repeat suite runs recompile (~+3 min); correctness over speed.


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawns, big sweeps)"
    )
