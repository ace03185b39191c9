"""Continuous-batching scheduler tests: admission, lockstep decode with mixed
per-request sampling, EOS/budget/cache-room termination, stream ordering, and
parity with single-request generation."""
import numpy as np
import pytest

from nfai_tpu.config import EngineConfig, SamplingParams
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.runtime.engine import InferenceEngine
from nfai_tpu.runtime.scheduler import BatchEngine, RequestState


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = make_tiny_llama_gguf(
        tmp_path_factory.mktemp("s") / "tiny.gguf", n_layers=2, context_length=128
    )
    eng = InferenceEngine(
        path, EngineConfig(max_seq_len=96, dtype="float32", prefill_chunk=32)
    )
    yield eng
    eng.gguf.close()


def drive(be, reqs, max_steps=200):
    for _ in range(max_steps):
        if be.step() == 0 and all(r.state != RequestState.QUEUED for r in reqs):
            if be.queue.empty():
                break
    return [r.output_ids for r in reqs]


def test_single_request_matches_engine_generate(engine):
    ids = [int(x) for x in np.random.default_rng(0).integers(5, 200, 9)]
    s = SamplingParams(temperature=0.0, max_new_tokens=10)
    expected = list(engine.generate(ids, s))

    be = BatchEngine(engine, max_batch=4, decode_chunk=4)
    req = be.submit(ids, s)
    drive(be, [req])
    assert req.state == RequestState.FINISHED
    assert req.output_ids == expected


def test_concurrent_requests_isolated(engine):
    rng = np.random.default_rng(1)
    prompts = [[int(x) for x in rng.integers(5, 200, n)] for n in (6, 11, 17, 9)]
    s = SamplingParams(temperature=0.0, max_new_tokens=8)
    expected = [list(engine.generate(p, s)) for p in prompts]

    be = BatchEngine(engine, max_batch=4, decode_chunk=4)
    reqs = [be.submit(p, s) for p in prompts]
    drive(be, reqs)
    for r, exp in zip(reqs, expected):
        assert r.state == RequestState.FINISHED
        assert r.output_ids == exp, f"request {r.id} diverged under batching"


def test_more_requests_than_slots(engine):
    rng = np.random.default_rng(2)
    prompts = [[int(x) for x in rng.integers(5, 200, 7)] for _ in range(6)]
    s = SamplingParams(temperature=0.0, max_new_tokens=5)
    be = BatchEngine(engine, max_batch=2, decode_chunk=4)
    reqs = [be.submit(p, s) for p in prompts]
    drive(be, reqs)
    assert all(r.state == RequestState.FINISHED for r in reqs)
    # slots were reused: all finished with bounded outputs
    assert all(0 < len(r.output_ids) <= 5 for r in reqs)


def test_mixed_sampling_params(engine):
    rng = np.random.default_rng(3)
    p = [int(x) for x in rng.integers(5, 200, 8)]
    be = BatchEngine(engine, max_batch=2, decode_chunk=4)
    r_greedy = be.submit(p, SamplingParams(temperature=0.0, max_new_tokens=6))
    r_hot = be.submit(p, SamplingParams(temperature=1.5, max_new_tokens=6, seed=1))
    drive(be, [r_greedy, r_hot])
    expected_greedy = list(
        engine.generate(p, SamplingParams(temperature=0.0, max_new_tokens=6))
    )
    assert r_greedy.output_ids == expected_greedy


def test_cache_room_termination(engine):
    # prompt 80 in a 96-slot cache: at most ~16 tokens before the room ends
    rng = np.random.default_rng(4)
    p = [int(x) for x in rng.integers(5, 200, 80)]
    be = BatchEngine(engine, max_batch=2, decode_chunk=8)
    r = be.submit(p, SamplingParams(temperature=0.0, max_new_tokens=500))
    drive(be, [r])
    assert r.state == RequestState.FINISHED
    assert len(r.output_ids) <= 17


def test_prompt_too_long_rejected(engine):
    be = BatchEngine(engine, max_batch=2)
    with pytest.raises(ValueError, match="exceeds"):
        be.submit(list(range(200)))


def test_stream_iterator(engine):
    rng = np.random.default_rng(5)
    p = [int(x) for x in rng.integers(5, 200, 6)]
    be = BatchEngine(engine, max_batch=2, decode_chunk=4)
    be.start()
    try:
        r = be.submit(p, SamplingParams(temperature=0.0, max_new_tokens=6))
        streamed = list(r.stream(timeout=120))
    finally:
        be.close()
    assert streamed == r.output_ids
    assert r.ttft_s is not None and r.ttft_s > 0
