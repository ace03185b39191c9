"""Continuous batching + paged KV pool UNDER TENSOR PARALLELISM on the
8-virtual-device CPU mesh (VERDICT r4 item 5: the serving stack had never
run with tp > 1 even virtually — admission, preemption, and paged
writes/attention on a sharded pool were untested composition).

The pool shards its Hkv axis over tp (whole heads per shard, same axis the
dense cache shards KVD on); params take the production TP shardings. On
CPU the Pallas paged kernels run in interpret mode, which GSPMD partitions
like ordinary ops — the test proves the LAYOUT composition (no axis-size
conflicts between the scheduler's pool, the block tables, and the TP
params), and the outputs match the single-device BatchEngine exactly.
"""
import numpy as np
import pytest

from nfai_tpu.config import EngineConfig, SamplingParams
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.runtime.engine import InferenceEngine
from nfai_tpu.runtime.scheduler import BatchEngine, RequestState


def _drain(be, reqs):
    for _ in range(600):
        if be.step() == 0 and all(
            r.state in (RequestState.FINISHED, RequestState.FAILED) for r in reqs
        ):
            break
    return [list(r.output_ids) for r in reqs]


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("tp") / "m.gguf", hidden=128, n_layers=2,
        n_heads=4, n_kv_heads=4, ffn_dim=256, context_length=512,
    )


def test_batch_engine_under_tp(model_path):
    prompts = [list(range(5, 25)), list(range(30, 45)), list(range(50, 58))]
    s = SamplingParams(temperature=0.0, max_new_tokens=6)

    base = InferenceEngine(
        model_path, EngineConfig(max_seq_len=256, dtype="float32")
    )
    be0 = BatchEngine(base, max_batch=3)
    want = _drain(be0, [be0.submit(p, s) for p in prompts])

    tp_eng = InferenceEngine(
        model_path,
        EngineConfig(
            max_seq_len=256, dtype="float32",
            mesh_shape={"dp": 2, "tp": 4},
        ),
    )
    be = BatchEngine(tp_eng, max_batch=3)
    got = _drain(be, [be.submit(p, s) for p in prompts])
    assert got == want, f"{got} != {want}"


def test_batch_engine_tp_preemption(model_path):
    """OutOfPages preemption with a TP-sharded pool: a pool too small for
    all requests at once must still finish every request (youngest-first
    preempt + recompute), with outputs equal to the unconstrained run."""
    prompts = [list(range(5, 60)), list(range(60, 115)), list(range(115, 170))]
    s = SamplingParams(temperature=0.0, max_new_tokens=5)

    base = InferenceEngine(
        model_path, EngineConfig(max_seq_len=256, dtype="float32")
    )
    be0 = BatchEngine(base, max_batch=3)
    want = _drain(be0, [be0.submit(p, s) for p in prompts])

    tp_eng = InferenceEngine(
        model_path,
        EngineConfig(
            max_seq_len=256, dtype="float32",
            mesh_shape={"dp": 2, "tp": 4},
        ),
    )
    # room for ~2 of the 3 sequences -> forces preemption mid-flight
    be = BatchEngine(tp_eng, max_batch=3, pool_tokens=384)
    reqs = [be.submit(p, s) for p in prompts]
    got = _drain(be, reqs)
    assert all(r.state == RequestState.FINISHED for r in reqs)
    assert got == want, f"{got} != {want}"
