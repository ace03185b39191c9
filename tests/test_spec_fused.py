"""Fused on-device speculative decoding (models.llama.spec_decode_rounds).

The fused loop must emit EXACTLY the plain greedy sequence (speculation
changes latency, never output), handle EOS mid-round, and report
drafted/accepted counters. Engine-level integration is covered in
test_engine_spec_fused below."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nfai_tpu.config import EngineConfig, SamplingParams
from nfai_tpu.gguf.quants import GGMLType
from nfai_tpu.models.llama import (
    _ngram_draft_device,
    decode_loop,
    spec_decode_rounds,
)
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.runtime.engine import InferenceEngine


def test_ngram_draft_device():
    # history: 5 6 7 8 9 5 6 7 | pending ngram (n=3) = "5 6 7" matches at 0
    hist = jnp.asarray([[5, 6, 7, 8, 9, 5, 6, 7, 0, 0, 0, 0]], jnp.int32)
    hlen = jnp.asarray([8], jnp.int32)
    draft, found = _ngram_draft_device(hist, hlen, n=3, gamma=3)
    assert bool(found[0])
    assert draft[0].tolist() == [8, 9, 5]
    # no repeat -> miss; draft repeats the last token
    hist2 = jnp.asarray([[1, 2, 3, 4, 5, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
    d2, f2 = _ngram_draft_device(hist2, jnp.asarray([5], jnp.int32), 3, 3)
    assert not bool(f2[0])
    assert d2[0].tolist() == [5, 5, 5]
    # continuation clipped at history end falls back to last token
    hist3 = jnp.asarray([[5, 6, 7, 5, 6, 7, 0, 0, 0, 0, 0, 0]], jnp.int32)
    d3, f3 = _ngram_draft_device(hist3, jnp.asarray([6], jnp.int32), 3, 4)
    assert bool(f3[0])
    # match at 0 -> continuation idx 3,4,5 = [5,6,7]; idx 6 is past the
    # history, so the 4th draft falls back to the last token (7)
    assert d3[0].tolist() == [5, 6, 7, 7]


def _engine(tmp_path, name, **cfg):
    path = make_tiny_llama_gguf(
        tmp_path / name, hidden=128, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=256, vocab_size=512, quant=GGMLType.F16, seed=21,
    )
    return InferenceEngine(path, EngineConfig(max_seq_len=128,
                                              dtype="float32", **cfg))


def test_spec_rounds_match_plain_greedy(tmp_path):
    eng = _engine(tmp_path, "spec.gguf")
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]
    # plain greedy reference
    plain = list(
        eng.generate(prompt, SamplingParams(temperature=0.0,
                                            max_new_tokens=24))
    )
    # drive spec_decode_rounds manually from a fresh prefill
    cache = eng.new_cache(1)
    from nfai_tpu.models.llama import prefill_step

    toks = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, cache = prefill_step(
        eng.params, eng.model_cfg, toks, pos,
        jnp.asarray([len(prompt) - 1], jnp.int32), cache,
    )
    pend = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [1]
    s = 128
    hist = jnp.zeros((1, s), jnp.int32)
    hist = hist.at[0, : len(prompt)].set(jnp.asarray(prompt))
    hist = hist.at[0, len(prompt)].set(pend[0])
    hlen = jnp.asarray([len(prompt) + 1], jnp.int32)
    eos = jnp.asarray([-2], jnp.int32)  # no eos in this run
    emitted = []
    p = jnp.asarray([len(prompt)], jnp.int32)
    act = jnp.asarray([True])
    drafted = accepted = 0
    while len(emitted) < 24:
        outs, ocnt, pend, p, cache, hist, hlen, act, dr, ac = (
            spec_decode_rounds(
                eng.params, eng.model_cfg, pend, p, cache, hist, hlen,
                eos, act, n_rounds=2, gamma=4, ngram=3,
            )
        )
        cnt = int(ocnt[0])
        assert cnt > 0
        emitted.extend(int(x) for x in np.asarray(outs[0, :cnt]))
        drafted += int(dr[0])
        accepted += int(ac[0])
        if not bool(act[0]):
            break
    assert emitted[:24] == plain[:24]
    assert drafted > 0
    # the repetitive prompt must give real acceptance
    assert accepted > 0


def test_spec_rounds_eos_mid_round(tmp_path):
    """A lane whose greedy continuation hits EOS stops without emitting it
    and deactivates."""
    eng = _engine(tmp_path, "spec_eos.gguf")
    prompt = [7, 8, 9, 7, 8]
    plain = []
    for t in eng.generate(prompt, SamplingParams(temperature=0.0,
                                                 max_new_tokens=40)):
        plain.append(t)
    # find what greedy emits, then declare the 6th emission an "EOS"
    if len(plain) < 8:
        pytest.skip("model stopped too early for this fixture")
    fake_eos = plain[6]
    cache = eng.new_cache(1)
    from nfai_tpu.models.llama import prefill_step

    toks = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, cache = prefill_step(
        eng.params, eng.model_cfg, toks, pos,
        jnp.asarray([len(prompt) - 1], jnp.int32), cache,
    )
    pend = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    s = 128
    hist = jnp.zeros((1, s), jnp.int32)
    hist = hist.at[0, : len(prompt)].set(jnp.asarray(prompt))
    hist = hist.at[0, len(prompt)].set(pend[0])
    hlen = jnp.asarray([len(prompt) + 1], jnp.int32)
    eos = jnp.asarray([fake_eos, -2], jnp.int32)
    p = jnp.asarray([len(prompt)], jnp.int32)
    act = jnp.asarray([True])
    emitted = []
    for _ in range(12):
        outs, ocnt, pend, p, cache, hist, hlen, act, _, _ = (
            spec_decode_rounds(
                eng.params, eng.model_cfg, pend, p, cache, hist, hlen,
                eos, act, n_rounds=2, gamma=4, ngram=3,
            )
        )
        emitted.extend(int(x) for x in np.asarray(outs[0, : int(ocnt[0])]))
        if not bool(act[0]):
            break
    # stops exactly before the fake EOS, never emits it
    expect = [t for t in plain[:6]]
    assert emitted == expect
    assert not bool(act[0])


def test_engine_spec_fused(tmp_path):
    """speculative='ngram' engine path (which uses the fused loop on its
    fast path) still matches plain greedy exactly."""
    eng_plain = _engine(tmp_path, "p.gguf")
    eng_spec = _engine(tmp_path, "s.gguf", speculative="ngram")
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]
    sp = SamplingParams(temperature=0.0, max_new_tokens=20)
    a = list(eng_plain.generate(prompt, sp))
    m = eng_spec.metrics if hasattr(eng_spec, "metrics") else None
    b = list(eng_spec.generate(prompt, sp))
    assert a == b


@pytest.mark.parametrize("paged", [False, True])
def test_batch_engine_speculative(tmp_path, paged):
    """BatchEngine with speculative='ngram': greedy outputs match the
    non-speculative batch engine exactly, and the spec counters move."""
    from nfai_tpu.runtime.scheduler import BatchEngine

    path = make_tiny_llama_gguf(
        tmp_path / f"bspec{int(paged)}.gguf", hidden=128, n_layers=2,
        n_heads=4, n_kv_heads=2, ffn_dim=256, vocab_size=512,
        quant=GGMLType.F16, seed=23,
    )
    prompts = [
        [3, 4, 5, 3, 4, 5, 3, 4],
        [9, 9, 2, 9, 9, 2, 9, 9],
    ]
    sp = SamplingParams(temperature=0.0, max_new_tokens=16)
    results = {}
    for spec in ("off", "ngram"):
        eng = InferenceEngine(
            path,
            EngineConfig(max_seq_len=128, dtype="float32",
                         speculative=spec, paged_kv=paged,
                         spec_tokens=4, spec_rounds=2),
        )
        be = BatchEngine(eng, max_batch=2)
        be.start()
        reqs = [be.submit(p, sp) for p in prompts]
        results[spec] = [list(r.stream(timeout=300)) for r in reqs]
        if spec == "ngram":
            assert be.spec_drafted > 0
        be.close()
    assert results["ngram"] == results["off"]


def test_draft_model_speculation(tmp_path):
    """speculative='draft': output matches plain greedy EXACTLY. An
    identical draft gives high acceptance; a different draft still gives
    exact output (verification corrects it)."""
    path = make_tiny_llama_gguf(
        tmp_path / "tgt.gguf", hidden=128, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=256, vocab_size=512, quant=GGMLType.F16,
        seed=21,
    )
    other = make_tiny_llama_gguf(
        tmp_path / "drf.gguf", hidden=64, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=128, vocab_size=512, quant=GGMLType.F16,
        seed=99,
    )
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]
    sp = SamplingParams(temperature=0.0, max_new_tokens=20)
    from nfai_tpu.runtime.engine import GenerationMetrics

    plain = list(
        InferenceEngine(path, EngineConfig(max_seq_len=128,
                                           dtype="float32")).generate(
            prompt, sp)
    )
    for draft_path, min_acc in ((path, 1), (other, 0)):
        eng = InferenceEngine(
            path,
            EngineConfig(max_seq_len=128, dtype="float32",
                         speculative="draft", draft_gguf=str(draft_path),
                         spec_tokens=4, spec_rounds=2),
        )
        m = GenerationMetrics()
        out = list(eng.generate(prompt, sp, metrics=m))
        assert out == plain, draft_path
        assert m.spec_drafted > 0
        assert m.spec_accepted >= min_acc
    # identical draft: acceptance should be (near-)total
    eng = InferenceEngine(
        path,
        EngineConfig(max_seq_len=128, dtype="float32", speculative="draft",
                     draft_gguf=str(path), spec_tokens=4, spec_rounds=2),
    )
    m = GenerationMetrics()
    out = list(eng.generate(prompt, sp, metrics=m))
    assert out == plain
    assert m.spec_accepted / max(m.spec_drafted, 1) > 0.8


def test_draft_vocab_mismatch(tmp_path):
    path = make_tiny_llama_gguf(
        tmp_path / "t2.gguf", hidden=64, n_layers=1, n_heads=2,
        n_kv_heads=2, ffn_dim=64, vocab_size=512, seed=1,
    )
    bad = make_tiny_llama_gguf(
        tmp_path / "d2.gguf", hidden=64, n_layers=1, n_heads=2,
        n_kv_heads=2, ffn_dim=64, vocab_size=256, seed=2,
    )
    eng = InferenceEngine(
        path, EngineConfig(max_seq_len=64, dtype="float32",
                           speculative="draft", draft_gguf=str(bad)),
    )
    with pytest.raises(ValueError, match="vocabulary"):
        list(eng.generate([1, 2], SamplingParams(temperature=0.0,
                                                 max_new_tokens=4)))


def test_spec_rounds_sampled_greedy_lanes_exact(tmp_path):
    """spec_decode_rounds with the sampled (rejection) acceptance path and
    temperature 0 must equal the pure-greedy path bit-exactly (greedy rows
    reduce to argmax-prefix matching inside spec_verify_sample)."""
    eng = _engine(tmp_path, "sg.gguf")
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]
    from nfai_tpu.models.llama import prefill_step

    outs = {}
    for mode in ("greedy", "sampled_t0"):
        cache = eng.new_cache(1)
        toks = jnp.asarray([prompt], jnp.int32)
        pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
        logits, cache = prefill_step(
            eng.params, eng.model_cfg, toks, pos,
            jnp.asarray([len(prompt) - 1], jnp.int32), cache,
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        s = eng.max_seq_len
        hist = jnp.zeros((1, s), jnp.int32)
        hist = hist.at[0, : len(prompt)].set(jnp.asarray(prompt))
        hist = hist.at[0, len(prompt)].set(tok[0])
        kw = {}
        if mode == "sampled_t0":
            kw = dict(
                key=jax.random.PRNGKey(5),
                temps=jnp.zeros(1, jnp.float32), top_k=32,
                top_ps=jnp.ones(1, jnp.float32),
            )
        o, c, pend, _, _, _, _, act, dr, ac = spec_decode_rounds(
            eng.params, eng.model_cfg, tok,
            jnp.asarray([len(prompt)], jnp.int32), cache, hist,
            jnp.asarray([len(prompt) + 1], jnp.int32),
            jnp.asarray([-2], jnp.int32), jnp.ones(1, bool), 3, 3, 3, **kw,
        )
        cnt = int(c[0])
        outs[mode] = [int(t) for t in np.asarray(o[0, :cnt])] + [int(pend[0])]
    assert outs["greedy"] == outs["sampled_t0"]


def test_engine_sampled_spec_runs_and_accepts(tmp_path):
    """speculative='ngram' with temperature>0: generation completes, the
    accept counters move on a repetitive prompt, and a fixed seed is
    reproducible across runs."""
    eng = _engine(tmp_path, "ss.gguf", speculative="ngram")
    prompt = [3, 4, 5, 3, 4, 5, 3, 4, 5, 3, 4]
    sp = SamplingParams(temperature=0.7, top_k=20, top_p=0.95, seed=11,
                        max_new_tokens=24)
    from nfai_tpu.runtime.engine import GenerationMetrics

    m = GenerationMetrics()
    out1 = list(eng.generate(prompt, sp, metrics=m))
    assert len(out1) > 0
    assert m.spec_drafted > 0
    out2 = list(eng.generate(prompt, sp))
    assert out1 == out2  # same seed -> same stream


@pytest.mark.parametrize("paged", [False, True])
def test_batch_engine_mixed_sampled_spec(tmp_path, paged):
    """Mixed greedy + sampled batch: speculation stays ON (per-lane
    rejection acceptance), the greedy lane still matches the
    non-speculative engine exactly, and the sampled lane completes."""
    from nfai_tpu.runtime.scheduler import BatchEngine

    path = make_tiny_llama_gguf(
        tmp_path / f"ms{int(paged)}.gguf", hidden=128, n_layers=2,
        n_heads=4, n_kv_heads=2, ffn_dim=256, vocab_size=512,
        quant=GGMLType.F16, seed=29,
    )
    g_prompt = [3, 4, 5, 3, 4, 5, 3, 4]
    s_prompt = [9, 9, 2, 9, 9, 2, 9, 9]
    g_sp = SamplingParams(temperature=0.0, max_new_tokens=16)
    s_sp = SamplingParams(temperature=0.8, top_k=20, max_new_tokens=16)

    def run(spec):
        eng = InferenceEngine(
            path,
            EngineConfig(max_seq_len=128, dtype="float32",
                         speculative=spec, paged_kv=paged,
                         spec_tokens=4, spec_rounds=2),
        )
        be = BatchEngine(eng, max_batch=2)
        be.start()
        rg = be.submit(g_prompt, g_sp)
        rs = be.submit(s_prompt, s_sp)
        out = (list(rg.stream(timeout=300)), list(rs.stream(timeout=300)))
        drafted = be.spec_drafted
        be.close()
        return out, drafted

    (g_spec, s_spec), drafted = run("ngram")
    (g_plain, _s_plain), _ = run("off")
    assert drafted > 0  # the mixed batch DID speculate
    assert g_spec == g_plain  # greedy lane exact
    assert len(s_spec) == 16  # sampled lane completed its budget


def test_draft_model_sampled_spec(tmp_path):
    """speculative='draft' with temperature>0: rejection-sampling acceptance
    against the greedy draft rollout — generation completes, counters move,
    fixed seed reproduces."""
    tgt = make_tiny_llama_gguf(
        tmp_path / "dst.gguf", hidden=128, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=256, vocab_size=512, quant=GGMLType.F16,
        seed=21,
    )
    eng = InferenceEngine(
        tgt,
        EngineConfig(max_seq_len=128, dtype="float32", speculative="draft",
                     draft_gguf=str(tgt)),
    )
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]
    sp = SamplingParams(temperature=0.7, top_k=20, seed=5, max_new_tokens=16)
    from nfai_tpu.runtime.engine import GenerationMetrics

    m = GenerationMetrics()
    out1 = list(eng.generate(prompt, sp, metrics=m))
    assert len(out1) > 0
    assert m.spec_drafted > 0
    # identical draft == target: sampled acceptance should accept often
    assert m.spec_accepted > 0
    out2 = list(eng.generate(prompt, sp))
    assert out1 == out2
