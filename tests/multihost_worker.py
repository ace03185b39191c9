"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Usage: python multihost_worker.py <proc_id> <port> <gguf_path> <out_path>

Each process forces the CPU backend with 4 virtual devices, initializes the
DCN coordinator through `nfai_tpu.parallel.init_distributed` (the code under
test — NFAI_* env-var path), builds the global (dp=2, tp=4) mesh spanning
both processes, and greedy-decodes through the sharded InferenceEngine so
GSPMD collectives cross the process boundary. Process 0 writes the token ids
to <out_path> for the parent test to compare with a single-process run.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_inherited = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(
    ["--xla_force_host_platform_device_count=4"] + _inherited
)

proc_id, port, gguf_path, out_path = sys.argv[1:5]

import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin overrides the env var
jax.config.update("jax_cpu_collectives_implementation", "gloo")

os.environ["NFAI_COORD"] = f"127.0.0.1:{port}"
os.environ["NFAI_NUM_PROCS"] = "2"
os.environ["NFAI_PROC_ID"] = proc_id

from nfai_tpu.parallel import init_distributed

assert init_distributed(), "init_distributed must activate from NFAI_* env"
assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2

import numpy as np

from nfai_tpu.config import EngineConfig, SamplingParams
from nfai_tpu.runtime.engine import InferenceEngine

eng = InferenceEngine(
    gguf_path,
    EngineConfig(
        max_seq_len=96,
        dtype="float32",
        prefill_chunk=32,
        mesh_shape={"dp": 2, "tp": 4},
    ),
)
ids = [int(x) for x in np.random.default_rng(0).integers(5, 200, 11)]
with jax.sharding.set_mesh(eng.mesh):
    toks = list(
        eng.generate(ids, SamplingParams(temperature=0.0, max_new_tokens=8))
    )
print(f"proc {proc_id}: {toks}", flush=True)
if proc_id == "0":
    with open(out_path, "w") as f:
        f.write(",".join(map(str, toks)))
eng.gguf.close()
