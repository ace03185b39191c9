"""Rejection-sampling speculation math (ops.sampling.spec_verify_sample):
output law vs plain sampling, greedy argmax-prefix reduction. Checks run in
a SUBPROCESS — see tests/specsample_worker.py for why (latent XLA:CPU
in-process compile corruption on this image; the math is unchanged and
fully covered there)."""
import os
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "specsample_worker.py")


def test_spec_sampling_worker():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, WORKER],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert proc.returncode == 0, (
        f"specsample_worker failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "ALL OK" in proc.stdout
