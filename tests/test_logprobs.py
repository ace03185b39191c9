"""OpenAI logprobs: sampling helper, engine collection, batch scheduler,
and HTTP API (chat + legacy completions, blocking + SSE)."""
import json
import math
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nfai_tpu.config import EngineConfig, SamplingParams
from nfai_tpu.gguf.quants import GGMLType
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.runtime.engine import GenerationMetrics, InferenceEngine


def test_token_logprobs_helper():
    from nfai_tpu.ops.sampling import token_logprobs

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    chosen = jnp.asarray([3, 10], jnp.int32)
    lp, tid, tlp = token_logprobs(logits, chosen, n_top=5)
    ref = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    np.testing.assert_allclose(
        np.asarray(lp), ref[[0, 1], [3, 10]], rtol=1e-5, atol=1e-5
    )
    # top entries are sorted descending and match the reference
    for b in range(2):
        order = np.argsort(-ref[b])[:5]
        assert list(np.asarray(tid[b])) == list(order)
        np.testing.assert_allclose(
            np.asarray(tlp[b]), ref[b][order], rtol=1e-5, atol=1e-5
        )
    # probabilities are valid
    assert np.all(np.asarray(tlp) <= 1e-6)


def _engine(tmp_path, name, **cfg):
    path = make_tiny_llama_gguf(
        tmp_path / name, hidden=128, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=256, vocab_size=512, quant=GGMLType.F16, seed=31,
    )
    return InferenceEngine(path, EngineConfig(max_seq_len=96,
                                              dtype="float32", **cfg))


def test_engine_logprobs_aligned(tmp_path):
    eng = _engine(tmp_path, "lp.gguf", decode_chunk=4)
    m = GenerationMetrics()
    sp = SamplingParams(temperature=0.0, max_new_tokens=10, logprobs=3)
    toks = list(eng.generate([5, 6, 7], sp, metrics=m))
    assert len(m.logprobs) == len(toks)
    for t, e in zip(toks, m.logprobs):
        assert e["id"] == t
        assert e["logprob"] <= 1e-6
        assert len(e["top"]) == 3
        # greedy: the chosen token must be the top-1 alternative
        assert e["top"][0][0] == t
        assert math.isclose(e["top"][0][1], e["logprob"], abs_tol=1e-4)


def test_engine_logprobs_constrained(tmp_path):
    eng = _engine(tmp_path, "lpc.gguf")
    m = GenerationMetrics()
    sp = SamplingParams(temperature=0.0, max_new_tokens=12, logprobs=2,
                        grammar='root ::= [0-9]+')
    toks = list(eng.generate([5], sp, metrics=m))
    assert len(m.logprobs) == len(toks)
    assert all(e["id"] == t for e, t in zip(m.logprobs, toks))


@pytest.mark.parametrize("paged", [False, True])
def test_batch_engine_logprobs(tmp_path, paged):
    from nfai_tpu.runtime.scheduler import BatchEngine

    eng = _engine(tmp_path, f"lpb{int(paged)}.gguf", paged_kv=paged)
    be = BatchEngine(eng, max_batch=2)
    be.start()
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, logprobs=2)
    req = be.submit([3, 4, 5], sp)
    toks = list(req.stream(timeout=300))
    be.close()
    assert len(req.logprob_data) == len(toks)
    for t, e in zip(toks, req.logprob_data):
        assert e["id"] == t and len(e["top"]) == 2
        assert e["top"][0][0] == t  # greedy top-1


def test_server_logprobs(tmp_path):
    from nfai_tpu.server import serve

    path = make_tiny_llama_gguf(
        tmp_path / "srv.gguf", n_layers=2, context_length=256
    )
    httpd = serve(
        str(path), host="127.0.0.1", port=0,
        engine_config=EngineConfig(max_seq_len=128, dtype="float32",
                                   prefill_chunk=64),
        max_batch=2,
    )
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    def post(path_, body):
        r = urllib.request.Request(
            base + path_, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        return urllib.request.urlopen(r, timeout=120)

    try:
        # chat blocking
        with post("/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}],
            "temperature": 0, "max_tokens": 5,
            "logprobs": True, "top_logprobs": 2,
        }) as r:
            body = json.loads(r.read())
        lp = body["choices"][0]["logprobs"]
        assert lp and len(lp["content"]) >= 1
        e0 = lp["content"][0]
        assert set(e0) == {"token", "logprob", "bytes", "top_logprobs"}
        assert len(e0["top_logprobs"]) == 2
        # legacy completions format
        with post("/v1/completions", {
            "prompt": "ab", "temperature": 0, "max_tokens": 4,
            "logprobs": 3,
        }) as r:
            body = json.loads(r.read())
        lp = body["choices"][0]["logprobs"]
        assert set(lp) == {"tokens", "token_logprobs", "top_logprobs",
                           "text_offset"}
        assert len(lp["tokens"]) == len(lp["token_logprobs"])
        # SSE chunks carry logprobs
        with post("/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}],
            "temperature": 0, "max_tokens": 4, "stream": True,
            "logprobs": True,
        }) as r:
            raw = r.read().decode()
        chunks = [json.loads(x[6:]) for x in raw.strip().split("\n\n")
                  if x.startswith("data: ") and x != "data: [DONE]"]
        assert any(
            c["choices"][0].get("logprobs", {}).get("content")
            for c in chunks
        )
    finally:
        httpd.shutdown()
        httpd.state.batch.close()
