"""Sequence-parallel decode attention rehearsal (parallel.seq_parallel):
stats-merge and ppermute-ring variants over an S-sharded cache must match
dense single-device attention (ragged lengths, GQA, merged-lane adapter,
jit + physically sharded inputs). Checks run in a SUBPROCESS — like
tests/ep_worker.py, the 8-virtual-device shard_map compile set trips a
latent XLA:CPU bug that corrupts LATER unrelated compiles in the same
process (bisected r4: with these programs compiled in-process plus the
rest of the suite, the next fresh compile in tests/test_spec_sampling.py
segfaults). See tests/sp_worker.py for the actual checks.
"""
import os
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "sp_worker.py")


def test_seq_parallel_worker():
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
        f"sp_worker failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "ALL OK" in proc.stdout
