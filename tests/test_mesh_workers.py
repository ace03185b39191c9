"""Runs the mesh-heavy engine checks (scheduler under TP, pipeline-parallel
stage split) in a SUBPROCESS pytest session — same isolation policy as
ep_worker/sp_worker/specsample_worker: their in-process multi-device CPU
compiles add to the accumulated compile load that trips the latent XLA:CPU
compiler bug (benchmarks/xla_cpu_bug_repro.py). With these in-process, the
full suite's later fresh compile (r5: test_spec_fused's ngram pjit) HANGS
instead of segfaulting — a second observed failure mode of the same bug.
The checks themselves pass in any fresh process (scheduler_tp_checks.py,
pipeline_parallel_checks.py)."""
import os
import subprocess
import sys

HERE = os.path.dirname(__file__)
FILES = [
    os.path.join(HERE, "scheduler_tp_checks.py"),
    os.path.join(HERE, "pipeline_parallel_checks.py"),
]


def test_mesh_checks_worker():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *FILES],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=os.path.dirname(HERE),
    )
    assert proc.returncode == 0, (
        f"mesh checks failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
