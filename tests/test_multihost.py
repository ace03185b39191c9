"""Two-process jax.distributed test (SURVEY.md §4 "distributed without a
cluster"): spawns two CPU workers with 4 virtual devices each, wires them via
`nfai_tpu.parallel.init_distributed` (local coordinator), and checks that the
sharded engine's greedy decode over the global 8-device (dp=2, tp=4) mesh —
with GSPMD collectives crossing the process boundary — matches a
single-process, single-device run token-for-token.

The multi-host scaling-efficiency harness for real 2-host v5e lives in
`benchmarks/scaling_bench.py`; this test keeps its code path green without
hardware.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from nfai_tpu.config import EngineConfig, SamplingParams
from nfai_tpu.models.testing import make_tiny_llama_gguf

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_decode_matches_single(tmp_path):
    path = make_tiny_llama_gguf(
        tmp_path / "mh.gguf",
        hidden=128,
        n_layers=2,
        n_heads=8,
        n_kv_heads=4,
        ffn_dim=256,
        context_length=256,
        seed=42,
    )
    out = tmp_path / "tokens.txt"
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), str(path), str(out)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"
    got = [int(x) for x in out.read_text().split(",")]

    # single-process, single-device reference
    from nfai_tpu.runtime.engine import InferenceEngine

    eng = InferenceEngine(
        path, EngineConfig(max_seq_len=96, dtype="float32", prefill_chunk=32)
    )
    ids = [int(x) for x in np.random.default_rng(0).integers(5, 200, 11)]
    expected = list(
        eng.generate(ids, SamplingParams(temperature=0.0, max_new_tokens=8))
    )
    eng.gguf.close()
    assert got == expected
