"""Expert-parallel MoE seam rehearsal (parallel.expert_parallel): E-axis
shards of the expert stacks are standalone containers feeding the UNCHANGED
local grouped compute; one psum mixes. Checks run against the single-device
MoE oracles in a SUBPROCESS — the EP shard_map programs run correctly but
trip a latent XLA:CPU bug that corrupts LATER unrelated compiles in the same
process (bisected r4: with these programs compiled in-process, the next
fresh jit compile in tests/test_spec_sampling.py segfaults inside
backend_compile_and_load; without them, 314 tests pass). See
tests/ep_worker.py for the actual checks.
"""
import os
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "ep_worker.py")


def test_expert_parallel_worker():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, WORKER],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, (
        f"ep_worker failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "ALL OK" in proc.stdout
