"""Model forward tests (SURVEY.md §4 "Model golden"):

- config parsing from GGUF metadata
- prefill ≡ token-by-token decode (cache consistency)
- causality (future tokens don't affect past logits)
- golden parity vs HuggingFace LlamaForCausalLM (torch CPU) with the
  ggml↔HF rope permutation applied
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nfai_tpu.gguf import GGUFFile
from nfai_tpu.models import (
    KVCache,
    LlamaConfig,
    decode_step,
    forward,
    load_params,
    logits_for,
    prefill_step,
    resolve,
)
from nfai_tpu.models.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = make_tiny_llama_gguf(tmp_path_factory.mktemp("m") / "tiny.gguf")
    g = GGUFFile.open(path)
    cfg = LlamaConfig.from_gguf(g)
    params = load_params(g, cfg, dtype=jnp.float32)
    yield g, cfg, params
    g.close()


def test_config_from_gguf(tiny):
    g, cfg, _ = tiny
    assert cfg.hidden_size == 64
    assert cfg.n_layers == 2
    assert cfg.n_heads == 4
    assert cfg.n_kv_heads == 2
    assert cfg.head_dim == 16
    assert cfg.ffn_dim == 128
    assert cfg.tied_embeddings
    assert cfg.vocab_size == 264  # padded to a multiple of 8 for tp sharding


def test_registry_resolves_llama(tiny):
    g, cfg, _ = tiny
    fam = resolve(g)
    assert type(fam).__name__ == "LlamaFamily"
    assert fam.config_from_gguf(g) == cfg


def test_prefill_matches_stepwise_decode(tiny):
    _, cfg, params = tiny
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 200, size=12).astype(np.int32)

    # path A: full prefill
    cache_a = KVCache.zeros(cfg, 1, 32, jnp.float32)
    tokens = jnp.asarray(toks)[None, :]
    positions = jnp.arange(12, dtype=jnp.int32)[None, :]
    h, cache_a = forward(params, cfg, tokens, positions, cache_a,
                         activation_dtype=jnp.float32)
    logits_a = logits_for(params, h)[0]  # [T, V]

    # path B: one token at a time through decode_step
    cache_b = KVCache.zeros(cfg, 1, 32, jnp.float32)
    logits_b = []
    for t, tok in enumerate(toks):
        lg, cache_b = decode_step(
            params, cfg, jnp.asarray([tok]), jnp.asarray([t], jnp.int32), cache_b
        )
        logits_b.append(np.asarray(lg[0]))
    logits_b = np.stack(logits_b)

    np.testing.assert_allclose(np.asarray(logits_a), logits_b, rtol=2e-4, atol=2e-4)


def test_causality(tiny):
    _, cfg, params = tiny
    rng = np.random.default_rng(2)
    toks = rng.integers(0, 200, size=(1, 10)).astype(np.int32)
    toks2 = toks.copy()
    toks2[0, -1] = (toks2[0, -1] + 7) % 200  # change only the last token
    pos = jnp.arange(10, dtype=jnp.int32)[None, :]

    def run(t):
        cache = KVCache.zeros(cfg, 1, 16, jnp.float32)
        h, _ = forward(params, cfg, jnp.asarray(t), pos, cache,
                       activation_dtype=jnp.float32)
        return np.asarray(logits_for(params, h)[0])

    la, lb = run(toks), run(toks2)
    np.testing.assert_allclose(la[:-1], lb[:-1], rtol=1e-5, atol=1e-5)
    assert np.abs(la[-1] - lb[-1]).max() > 1e-4  # last position must differ


def test_prefill_step_last_index(tiny):
    _, cfg, params = tiny
    # two sequences, padded to 8, real lengths 5 and 8
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 200, size=(2, 8)).astype(np.int32)
    toks[0, 5:] = 0
    cache = KVCache.zeros(cfg, 2, 16, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (2, 8))
    last = jnp.asarray([4, 7], jnp.int32)
    logits, cache = prefill_step(params, cfg, jnp.asarray(toks), pos, last, cache)
    assert logits.shape == (2, cfg.vocab_size)

    # row 0 must equal a batch-1 prefill of its 5 real tokens
    cache1 = KVCache.zeros(cfg, 1, 16, jnp.float32)
    l1, _ = prefill_step(
        params, cfg, jnp.asarray(toks[:1, :5]),
        jnp.arange(5, dtype=jnp.int32)[None, :], jnp.asarray([4], jnp.int32), cache1
    )
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(l1[0]), rtol=2e-4, atol=2e-4)


def test_untied_lm_head(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "untied.gguf", tied=False, seed=7)
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        assert not cfg.tied_embeddings
        params = load_params(g, cfg, dtype=jnp.float32)
        # head differs from embedding transpose
        assert not np.allclose(
            np.asarray(params["lm_head"]), np.asarray(params["embed"]).T
        )


# ---------------------------------------------------------------------------
# HF golden parity


def _ggml_to_hf_permute(w: np.ndarray, n_heads: int) -> np.ndarray:
    """Invert llama.cpp's HF→ggml q/k permutation: rows (out dim) grouped per
    head as interleaved rope pairs → HF half-split layout."""
    out_dim, in_dim = w.shape
    hd = out_dim // n_heads
    return (
        w.reshape(n_heads, hd // 2, 2, in_dim)
        .transpose(0, 2, 1, 3)
        .reshape(out_dim, in_dim)
    )


def test_hf_golden_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    path = make_tiny_llama_gguf(tmp_path / "hf.gguf", seed=11)
    g = GGUFFile.open(path)
    cfg = LlamaConfig.from_gguf(g)
    params = load_params(g, cfg, dtype=jnp.float32)

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_dim,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads,
        rms_norm_eps=cfg.rms_eps,
        rope_theta=cfg.rope_base,
        max_position_embeddings=cfg.context_length,
        tie_word_embeddings=True,
        attention_bias=False,
        mlp_bias=False,
    )
    model = LlamaForCausalLM(hf_cfg)
    sd = model.state_dict()

    def setw(key, arr):
        sd[key].copy_(torch.from_numpy(np.ascontiguousarray(arr)))

    with torch.no_grad():
        setw("model.embed_tokens.weight", g.tensor_f32("token_embd.weight"))
        setw("model.norm.weight", g.tensor_f32("output_norm.weight"))
        for i in range(cfg.n_layers):
            setw(
                f"model.layers.{i}.input_layernorm.weight",
                g.tensor_f32(f"blk.{i}.attn_norm.weight"),
            )
            setw(
                f"model.layers.{i}.self_attn.q_proj.weight",
                _ggml_to_hf_permute(g.tensor_f32(f"blk.{i}.attn_q.weight"), cfg.n_heads),
            )
            setw(
                f"model.layers.{i}.self_attn.k_proj.weight",
                _ggml_to_hf_permute(
                    g.tensor_f32(f"blk.{i}.attn_k.weight"), cfg.n_kv_heads
                ),
            )
            setw(
                f"model.layers.{i}.self_attn.v_proj.weight",
                g.tensor_f32(f"blk.{i}.attn_v.weight"),
            )
            setw(
                f"model.layers.{i}.self_attn.o_proj.weight",
                g.tensor_f32(f"blk.{i}.attn_output.weight"),
            )
            setw(
                f"model.layers.{i}.post_attention_layernorm.weight",
                g.tensor_f32(f"blk.{i}.ffn_norm.weight"),
            )
            setw(
                f"model.layers.{i}.mlp.gate_proj.weight",
                g.tensor_f32(f"blk.{i}.ffn_gate.weight"),
            )
            setw(
                f"model.layers.{i}.mlp.up_proj.weight",
                g.tensor_f32(f"blk.{i}.ffn_up.weight"),
            )
            setw(
                f"model.layers.{i}.mlp.down_proj.weight",
                g.tensor_f32(f"blk.{i}.ffn_down.weight"),
            )
    model.eval()

    toks = np.array([[5, 17, 100, 42, 7, 250, 3, 99]], dtype=np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()[0]

    cache = KVCache.zeros(cfg, 1, 16, jnp.float32)
    h, _ = forward(
        params,
        cfg,
        jnp.asarray(toks.astype(np.int32)),
        jnp.arange(8, dtype=jnp.int32)[None, :],
        cache,
        activation_dtype=jnp.float32,
    )
    ours = np.asarray(logits_for(params, h)[0])
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)
    g.close()
