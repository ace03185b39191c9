"""Test configuration: force an 8-virtual-device CPU mesh before jax imports.

This is the standard JAX trick for testing pjit/shard_map sharding logic on a
single host (SURVEY.md §4 "Distributed without a cluster"). Must run before
any `import jax` in the test process, hence env mutation at conftest import.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# XLA:CPU's oneDNN matmul silently drops to bf16-fastmath for some shapes,
# breaking f32 parity tests at ~0.5% error; force full-precision matmuls.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
