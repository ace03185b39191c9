"""Sampling extensions: min-p, logit bias, presence/frequency penalties —
unit level (ops.sampling), through decode_loop, and per-request through the
continuous-batching scheduler. None of these exist in the reference (its
sampler is fixed temperature/top-k/top-p, SamplingUtils.cs:5-33); they are
standard OpenAI-API serving features."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nfai_tpu.ops.sampling import (
    apply_logit_bias,
    apply_penalties,
    sample_logits,
)


def test_min_p_masks_low_prob_tokens():
    # token 0 has prob ~0.88, token 1 ~0.12, rest tiny: min_p=0.5 must make
    # sampling deterministic on token 0 at any key
    logits = jnp.asarray([[4.0, 2.0] + [-10.0] * 30])
    for i in range(16):
        tok = sample_logits(
            logits, jax.random.PRNGKey(i), temperature=1.0, top_k=8,
            top_p=1.0, min_p=0.5,
        )
        assert int(tok[0]) == 0
    # without min_p, token 1 does get sampled sometimes
    seen = {
        int(
            sample_logits(
                logits, jax.random.PRNGKey(i), temperature=1.0, top_k=8,
                top_p=1.0,
            )[0]
        )
        for i in range(64)
    }
    assert 1 in seen


def test_min_p_per_row():
    logits = jnp.asarray([[2.0, 1.9] + [-10.0] * 6] * 2)
    min_p = jnp.asarray([0.99, 0.0])
    toks = [
        tuple(
            int(t)
            for t in sample_logits(
                logits, jax.random.PRNGKey(i), 1.0, 8, 1.0, min_p=min_p
            )
        )
        for i in range(64)
    ]
    assert all(t[0] == 0 for t in toks)  # row 0: min_p filters token 1
    assert any(t[1] == 1 for t in toks)  # row 1: unfiltered


def test_logit_bias_forces_and_bans():
    logits = jnp.zeros((2, 16))
    ids = jnp.asarray([[3, 0], [5, 0]], jnp.int32)
    vals = jnp.asarray([[100.0, 0.0], [-100.0, 0.0]], jnp.float32)
    out = np.asarray(apply_logit_bias(logits, ids, vals))
    assert out[0, 3] == 100.0 and out[1, 5] == -100.0
    assert out[0, 0] == 0.0  # padding adds 0 to token 0


def test_penalties_reduce_repeats():
    logits = jnp.zeros((1, 8))
    counts = jnp.zeros((1, 8), jnp.int32).at[0, 2].set(3)
    out = np.asarray(
        apply_penalties(logits, counts, presence=0.5, frequency=0.25)
    )
    assert out[0, 2] == pytest.approx(-0.5 - 3 * 0.25)
    assert out[0, 1] == 0.0


def test_decode_loop_penalties_and_bias(tiny_engine):
    """decode_loop with counts: a +100 bias forces one token; frequency
    penalty then drives the loop OFF that token within a few steps."""
    from nfai_tpu.models.llama import decode_loop

    eng = tiny_engine
    cfg = eng.model_cfg
    cache = eng.new_cache(1)
    logits, cache = eng.prefill(cache, [3, 5, 7], 0)
    forced = 11
    bias_ids = jnp.asarray([[forced]], jnp.int32)
    bias_vals = jnp.asarray([[100.0]], jnp.float32)
    counts = jnp.zeros((1, cfg.vocab_size), jnp.int32)
    toks, nxt, cache, key, counts = decode_loop(
        eng.params, cfg,
        jnp.asarray([forced], jnp.int32),
        jnp.asarray([3], jnp.int32),
        cache, jax.random.PRNGKey(0), 8,
        temperature=1.0, top_k=8, top_p=1.0,
        bias_ids=bias_ids, bias_vals=bias_vals,
        presence=jnp.asarray([0.0]), frequency=jnp.asarray([30.0]),
        counts=counts,
    )
    out = [int(t) for t in np.asarray(toks[0])] + [int(nxt[0])]
    # bias (+100) wins initially, but each repetition adds -30: the token
    # must stop repeating before the chunk ends
    assert out[1] == forced
    assert any(t != forced for t in out[2:])
    cts = np.asarray(counts[0])
    assert cts.sum() == 8  # one sampled token per step
    assert cts[forced] >= 2


@pytest.fixture(scope="module")
def tiny_engine(tmp_path_factory):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    from nfai_tpu.config import EngineConfig
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.runtime.engine import InferenceEngine

    path = make_tiny_llama_gguf(
        tmp_path_factory.mktemp("se") / "t.gguf", hidden=64, n_layers=2,
        n_heads=4, n_kv_heads=2, ffn_dim=128, seed=9,
    )
    return InferenceEngine(path, EngineConfig(max_seq_len=64, dtype="float32"))


def test_engine_generate_with_extensions(tiny_engine):
    from nfai_tpu.config import SamplingParams

    eng = tiny_engine
    banned = 7
    out = list(
        eng.generate(
            [3, 5], SamplingParams(
                temperature=1.0, top_k=8, top_p=1.0, max_new_tokens=12,
                min_p=0.01, presence_penalty=0.2, frequency_penalty=0.1,
                logit_bias=((banned, -100.0),), seed=0,
            ),
        )
    )
    assert len(out) > 0
    assert banned not in out


def test_scheduler_per_request_extensions(tiny_engine):
    """Two concurrent requests: one with a -100 ban on a token, one with a
    +12 bias towards it — per-row bias tables must keep them apart."""
    from nfai_tpu.config import SamplingParams
    from nfai_tpu.runtime.scheduler import BatchEngine

    eng = tiny_engine
    be = BatchEngine(eng, max_batch=2, decode_chunk=8, paged=False)
    target = 13
    r_ban = be.submit([3, 5], SamplingParams(
        temperature=1.0, top_k=8, top_p=1.0, max_new_tokens=16,
        logit_bias=((target, -100.0),), frequency_penalty=0.05,
    ))
    r_push = be.submit([4, 6], SamplingParams(
        temperature=1.0, top_k=8, top_p=1.0, max_new_tokens=16,
        logit_bias=((target, 12.0),),
    ))
    for _ in range(64):
        if be.step() == 0:
            break
    ban_out = list(r_ban.output_ids)
    push_out = list(r_push.output_ids)
    assert target not in ban_out
    assert target in push_out  # +12 dominates a tiny random model's logits
    be.close()


def test_ngram_propose():
    from nfai_tpu.runtime.engine import _ngram_propose

    hist = [1, 2, 3, 9, 8, 1, 2, 3]
    assert _ngram_propose(hist, 3, 4) == [9, 8, 1, 2]
    assert _ngram_propose(hist, 3, 1) == [9]
    assert _ngram_propose([1, 2], 3, 4) is None
    assert _ngram_propose([5, 6, 7, 8], 2, 4) is None  # no earlier match


def test_speculative_matches_plain_greedy(tmp_path):
    """Prompt-lookup speculative decoding must be EXACTLY greedy: same
    tokens as the plain path, with a nonzero acceptance rate on a
    repetitive prompt."""
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    from nfai_tpu.config import EngineConfig, SamplingParams
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.runtime.engine import GenerationMetrics, InferenceEngine

    path = make_tiny_llama_gguf(
        tmp_path / "spec.gguf", hidden=64, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=128, seed=21,
    )
    # a repetitive prompt so the n-gram lookup has matches
    prompt = [7, 8, 9, 10, 7, 8, 9, 10, 7, 8, 9, 10, 7, 8]
    sp = SamplingParams(temperature=0.0, max_new_tokens=24)

    plain = InferenceEngine(
        path, EngineConfig(max_seq_len=96, dtype="float32")
    )
    base = list(plain.generate(prompt, sp))

    spec = InferenceEngine(
        path,
        EngineConfig(
            max_seq_len=96, dtype="float32", speculative="ngram",
            spec_tokens=4, spec_ngram=2,
        ),
    )
    metrics = GenerationMetrics()
    got = list(spec.generate(prompt, sp, metrics=metrics))
    assert got == base
    assert metrics.spec_drafted > 0
    # the model is random-weight so acceptance is not guaranteed on model
    # output, but the repeated prompt guarantees at least some drafts; the
    # equality assert above is the correctness property
