"""Engine-level sequence-parallel / expert-parallel integration (VERDICT r4
item 4): EngineConfig.seq_parallel shards the KV cache over the mesh's sp
axis and decodes through parallel.seq_parallel's stats-merge shard_map;
EngineConfig.expert_parallel shards MoE expert stacks over their E axis and
routes the FFN through parallel.expert_parallel.moe_ffn_ep. Both engines
must match the single-device engine's prefill logits and greedy tokens.

Runs in a SUBPROCESS for the same reason as test_expert_parallel.py: the
shard_map programs trip a latent XLA:CPU bug that corrupts later unrelated
in-process compiles (bisected r4; see tests/ep_worker.py and
benchmarks/xla_cpu_bug_repro.py)."""
import os
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "engine_parallel_worker.py")


def test_engine_parallel_worker():
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
        f"engine_parallel_worker failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "ENGINE-PARALLEL-OK" in proc.stdout
