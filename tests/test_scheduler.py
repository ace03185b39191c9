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


@pytest.fixture(params=[False, True], ids=["dense", "paged"])
def paged(request):
    return request.param


def drive(be, reqs, max_steps=200):
    for _ in range(max_steps):
        if be.step() == 0 and all(r.state != RequestState.QUEUED for r in reqs):
            if be.queue.empty():
                break
    return [r.output_ids for r in reqs]


def test_single_request_matches_engine_generate(engine, paged):
    ids = [int(x) for x in np.random.default_rng(0).integers(5, 200, 9)]
    s = SamplingParams(temperature=0.0, max_new_tokens=10)
    expected = list(engine.generate(ids, s))

    be = BatchEngine(engine, max_batch=4, decode_chunk=4, paged=paged)
    req = be.submit(ids, s)
    drive(be, [req])
    assert req.state == RequestState.FINISHED
    assert req.output_ids == expected


def test_concurrent_requests_isolated(engine, paged):
    rng = np.random.default_rng(1)
    prompts = [[int(x) for x in rng.integers(5, 200, n)] for n in (6, 11, 17, 9)]
    s = SamplingParams(temperature=0.0, max_new_tokens=8)
    expected = [list(engine.generate(p, s)) for p in prompts]

    be = BatchEngine(engine, max_batch=4, decode_chunk=4, paged=paged)
    reqs = [be.submit(p, s) for p in prompts]
    drive(be, reqs)
    for r, exp in zip(reqs, expected):
        assert r.state == RequestState.FINISHED
        assert r.output_ids == exp, f"request {r.id} diverged under batching"


def test_more_requests_than_slots(engine, paged):
    rng = np.random.default_rng(2)
    prompts = [[int(x) for x in rng.integers(5, 200, 7)] for _ in range(6)]
    s = SamplingParams(temperature=0.0, max_new_tokens=5)
    be = BatchEngine(engine, max_batch=2, decode_chunk=4, paged=paged)
    reqs = [be.submit(p, s) for p in prompts]
    drive(be, reqs)
    assert all(r.state == RequestState.FINISHED for r in reqs)
    # slots were reused: all finished with bounded outputs
    assert all(0 < len(r.output_ids) <= 5 for r in reqs)


def test_mixed_sampling_params(engine, paged):
    rng = np.random.default_rng(3)
    p = [int(x) for x in rng.integers(5, 200, 8)]
    be = BatchEngine(engine, max_batch=2, decode_chunk=4, paged=paged)
    r_greedy = be.submit(p, SamplingParams(temperature=0.0, max_new_tokens=6))
    r_hot = be.submit(p, SamplingParams(temperature=1.5, max_new_tokens=6, seed=1))
    drive(be, [r_greedy, r_hot])
    expected_greedy = list(
        engine.generate(p, SamplingParams(temperature=0.0, max_new_tokens=6))
    )
    assert r_greedy.output_ids == expected_greedy


def test_cache_room_termination(engine, paged):
    # prompt 80 in a 96-slot cache: at most ~16 tokens before the room ends
    rng = np.random.default_rng(4)
    p = [int(x) for x in rng.integers(5, 200, 80)]
    be = BatchEngine(engine, max_batch=2, decode_chunk=8, paged=paged)
    r = be.submit(p, SamplingParams(temperature=0.0, max_new_tokens=500))
    drive(be, [r])
    assert r.state == RequestState.FINISHED
    assert len(r.output_ids) <= 17


def test_prompt_too_long_rejected(engine, paged):
    be = BatchEngine(engine, max_batch=2, paged=paged)
    with pytest.raises(ValueError, match="exceeds"):
        be.submit(list(range(200)))


def test_stream_iterator(engine, paged):
    rng = np.random.default_rng(5)
    p = [int(x) for x in rng.integers(5, 200, 6)]
    be = BatchEngine(engine, max_batch=2, decode_chunk=4, paged=paged)
    be.start()
    try:
        r = be.submit(p, SamplingParams(temperature=0.0, max_new_tokens=6))
        streamed = list(r.stream(timeout=120))
    finally:
        be.close()
    assert streamed == r.output_ids
    assert r.ttft_s is not None and r.ttft_s > 0


# -- paged-specific behavior --------------------------------------------------


def _paged_engine(engine, page_size, n_pages, **kw):
    """BatchEngine with a custom page size/pool (tiny models want pages far
    smaller than the production 128 default)."""
    from nfai_tpu.runtime.paged_cache import PageAllocator, PagedKVCache

    be = BatchEngine(engine, paged=True, **kw)
    be.page_size = page_size
    be.max_pages = -(-engine.max_seq_len // page_size)
    be.alloc = PageAllocator(n_pages, page_size)
    be.cache = PagedKVCache.zeros(
        engine.model_cfg, n_pages, page_size, engine.cache_dtype
    )
    return be


def test_prefix_sharing_skips_prefill(engine):
    """Two requests with the same long prompt: the second adopts the first's
    KV pages (allocator hit) and still generates identical output."""
    rng = np.random.default_rng(7)
    # prompt spans >2 pages (page_size=16)
    p = [int(x) for x in rng.integers(5, 200, 40)]
    s = SamplingParams(temperature=0.0, max_new_tokens=6)
    be = _paged_engine(
        engine, 16, 2 * (-(-engine.max_seq_len // 16)) + 1,
        max_batch=2, decode_chunk=4,
    )

    r1 = be.submit(p, s)
    drive(be, [r1])
    assert be.alloc.hits == 0
    r2 = be.submit(p, s)
    drive(be, [r2])
    assert be.alloc.hits == 1, "second identical prompt must hit the prefix cache"
    assert r1.output_ids == r2.output_ids


def test_small_pool_serves_more_than_dense_capacity(engine):
    """A pool holding fewer tokens than max_batch x max_seq still serves
    concurrent short requests — paging allocates actual lengths, not
    worst-case reservations."""
    rng = np.random.default_rng(8)
    prompts = [[int(x) for x in rng.integers(5, 200, 7)] for _ in range(4)]
    s = SamplingParams(temperature=0.0, max_new_tokens=5)
    # dense would reserve 4 slots x 96 = 384 tokens; pool holds 9x16=144
    be = _paged_engine(engine, 16, 9, max_batch=4, decode_chunk=4)
    assert be.cache.k.nbytes < engine.new_cache(4).k.nbytes
    reqs = [be.submit(p, s) for p in prompts]
    expected = [list(engine.generate(p, s)) for p in prompts]
    drive(be, reqs)
    for r, exp in zip(reqs, expected):
        assert r.state == RequestState.FINISHED and r.output_ids == exp


def test_preemption_recovers_and_output_is_unchanged(engine):
    """Starved pool: a long-running request gets preempted for capacity,
    re-prefilled, and its final streamed output matches the unconstrained
    greedy run (recompute-preemption is invisible to the client)."""
    rng = np.random.default_rng(9)
    p1 = [int(x) for x in rng.integers(5, 200, 20)]
    p2 = [int(x) for x in rng.integers(5, 200, 20)]
    s = SamplingParams(temperature=0.0, max_new_tokens=24)
    expected1 = list(engine.generate(p1, s))
    expected2 = list(engine.generate(p2, s))
    # pool fits ~one growing request comfortably but not two
    be = _paged_engine(engine, 16, 5, max_batch=2, decode_chunk=4)
    r1 = be.submit(p1, s)
    r2 = be.submit(p2, s)
    drive(be, [r1, r2], max_steps=400)
    assert r1.state == RequestState.FINISHED
    assert r2.state == RequestState.FINISHED
    assert r1.output_ids == expected1
    assert r2.output_ids == expected2


def test_cancellation_frees_slot_and_pages(engine, paged):
    rng = np.random.default_rng(10)
    p = [int(x) for x in rng.integers(5, 200, 8)]
    be = BatchEngine(engine, max_batch=2, decode_chunk=2, paged=paged)
    r = be.submit(p, SamplingParams(temperature=0.0, max_new_tokens=500))
    be.step()
    assert r.state == RequestState.RUNNING
    n_before = len(r.output_ids)
    r.cancel()
    be.step()
    assert r.state == RequestState.CANCELLED
    # stream terminates for a consumer
    assert list(r.stream(timeout=5))[: n_before] == r.output_ids[: n_before]
    assert all(s.request is None for s in be.slots)
    if paged:
        # all non-reserved pages returned (cached prefix pages are refcount 0)
        assert (be.alloc.refs[1:] == 0).all() or be.alloc.free_pages > 0


def test_cancelled_in_queue_never_runs(engine, paged):
    rng = np.random.default_rng(11)
    p = [int(x) for x in rng.integers(5, 200, 8)]
    be = BatchEngine(engine, max_batch=1, decode_chunk=2, paged=paged)
    r1 = be.submit(p, SamplingParams(temperature=0.0, max_new_tokens=4))
    r2 = be.submit(p, SamplingParams(temperature=0.0, max_new_tokens=4))
    r2.cancel()
    drive(be, [r1, r2])
    assert r1.state == RequestState.FINISHED
    assert r2.state == RequestState.CANCELLED and r2.output_ids == []


def test_prefill_overlaps_decode(engine, paged):
    """A long-prompt arrival must not stall a running slot: while the new
    request prefills chunk-by-chunk, the running slot keeps decoding."""
    rng = np.random.default_rng(12)
    short = [int(x) for x in rng.integers(5, 200, 4)]
    long_p = [int(x) for x in rng.integers(5, 200, 90)]  # ~3 chunks of 32
    s = SamplingParams(temperature=0.0, max_new_tokens=40)
    be = BatchEngine(engine, max_batch=2, decode_chunk=2, paged=paged)
    r1 = be.submit(short, s)
    be.step()  # admits r1, first prefill chunk
    be.step()  # r1 decoding now
    assert r1.state == RequestState.RUNNING and len(r1.output_ids) >= 1
    produced = len(r1.output_ids)
    r2 = be.submit(long_p, SamplingParams(temperature=0.0, max_new_tokens=4))
    # one step: r2 prefills ONE chunk (not all three), r1 still decodes
    be.step()
    assert be.slots[1].prefilling or be.slots[0].prefilling
    assert len(r1.output_ids) > produced, "running slot stalled during prefill"
    drive(be, [r1, r2], max_steps=300)
    assert r1.state == RequestState.FINISHED
    assert r2.state == RequestState.FINISHED


def test_constrained_slot_in_batch(engine, paged):
    """A grammar-constrained (JSON mode) request decodes INSIDE the fused
    batch step, concurrently with plain requests — and the plain requests'
    outputs are identical to running them alone (no stall, no corruption)."""
    import json

    rng = np.random.default_rng(7)
    plain_prompt = [int(x) for x in rng.integers(5, 200, 9)]
    plain_s = SamplingParams(temperature=0.0, max_new_tokens=10)
    expected_plain = list(engine.generate(plain_prompt, plain_s))

    be = BatchEngine(engine, max_batch=4, decode_chunk=4, paged=paged)
    cons_s = SamplingParams(
        temperature=0.0, max_new_tokens=24, response_format="json"
    )
    cons = be.submit([int(x) for x in rng.integers(5, 200, 7)], cons_s)
    plain = be.submit(plain_prompt, plain_s)
    drive(be, [cons, plain])
    assert plain.state == RequestState.FINISHED
    assert plain.output_ids == expected_plain
    assert cons.state == RequestState.FINISHED
    text = engine.tokenizer.decode(cons.output_ids)
    json.loads(text)  # complete, valid JSON


def test_constrained_matches_engine_single(engine, paged):
    """Batched constrained greedy decode produces the same tokens as the
    engine's single-request constrained path (same masks, same argmax)."""
    rng = np.random.default_rng(8)
    ids = [int(x) for x in rng.integers(5, 200, 6)]
    s = SamplingParams(
        temperature=0.0, max_new_tokens=20, response_format="json"
    )
    expected = list(engine.generate(ids, s))
    be = BatchEngine(engine, max_batch=2, decode_chunk=4, paged=paged)
    req = be.submit(ids, s)
    drive(be, [req])
    assert req.state == RequestState.FINISHED
    assert req.output_ids == expected


def test_constrained_regex_in_batch(engine, paged):
    import re

    be = BatchEngine(engine, max_batch=2, decode_chunk=4, paged=paged)
    s = SamplingParams(
        temperature=0.0, max_new_tokens=16, regex=r"(yes|no)( indeed)?",
    )
    req = be.submit([3, 5, 7], s)
    drive(be, [req])
    assert req.state == RequestState.FINISHED
    text = engine.tokenizer.decode(req.output_ids)
    assert re.fullmatch(r"(yes|no)( indeed)?", text), text
