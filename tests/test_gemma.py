"""Gemma family: config detection + HF GemmaForCausalLM golden parity.

GGUF gemma checkpoints store norm weights with the +1 folded in (llama.cpp's
converter adds it), use NeoX rope, GELU-tanh gates, and scale embeddings by
sqrt(hidden) at runtime.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from nfai_tpu.gguf import GGUFFile
from nfai_tpu.models import KVCache, LlamaConfig, forward, load_params, logits_for
from nfai_tpu.models.testing import make_tiny_llama_gguf


def test_gemma_config(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "g.gguf", arch="gemma")
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
    assert cfg.activation == "gelu"
    assert cfg.rope_neox
    assert cfg.embed_scale == pytest.approx(cfg.hidden_size**0.5)


def test_gemma_hf_golden_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig, GemmaForCausalLM

    # Gemma requires head_dim * n_heads == hidden in our fixture layout
    path = make_tiny_llama_gguf(
        tmp_path / "ghf.gguf", arch="gemma", hidden=64, n_heads=4, n_kv_heads=2,
        seed=31,
    )
    g = GGUFFile.open(path)
    cfg = LlamaConfig.from_gguf(g)
    params = load_params(g, cfg, dtype=jnp.float32)

    hf_cfg = GemmaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_dim,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_eps,
        rope_theta=cfg.rope_base,
        max_position_embeddings=cfg.context_length,
        tie_word_embeddings=True,
        attention_bias=False,
        hidden_act="gelu_pytorch_tanh",
    )
    model = GemmaForCausalLM(hf_cfg)
    sd = model.state_dict()

    def setw(key, arr):
        sd[key].copy_(torch.from_numpy(np.ascontiguousarray(arr)))

    with torch.no_grad():
        setw("model.embed_tokens.weight", g.tensor_f32("token_embd.weight"))
        # GGUF stores norm weights with +1 folded; HF applies (1 + w)
        setw("model.norm.weight", g.tensor_f32("output_norm.weight") - 1.0)
        for i in range(cfg.n_layers):
            setw(
                f"model.layers.{i}.input_layernorm.weight",
                g.tensor_f32(f"blk.{i}.attn_norm.weight") - 1.0,
            )
            setw(
                f"model.layers.{i}.post_attention_layernorm.weight",
                g.tensor_f32(f"blk.{i}.ffn_norm.weight") - 1.0,
            )
            for hf, gg in [
                ("self_attn.q_proj", "attn_q"),
                ("self_attn.k_proj", "attn_k"),
                ("self_attn.v_proj", "attn_v"),
                ("self_attn.o_proj", "attn_output"),
                ("mlp.gate_proj", "ffn_gate"),
                ("mlp.up_proj", "ffn_up"),
                ("mlp.down_proj", "ffn_down"),
            ]:
                setw(
                    f"model.layers.{i}.{hf}.weight",
                    g.tensor_f32(f"blk.{i}.{gg}.weight"),
                )
    model.eval()

    toks = np.array([[5, 17, 100, 42]], dtype=np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()[0]

    cache = KVCache.zeros(cfg, 1, 8, jnp.float32)
    h, _ = forward(
        params,
        cfg,
        jnp.asarray(toks.astype(np.int32)),
        jnp.arange(4, dtype=jnp.int32)[None, :],
        cache,
        activation_dtype=jnp.float32,
    )
    ours = np.asarray(logits_for(params, h)[0])
    np.testing.assert_allclose(ours, hf_logits, rtol=3e-4, atol=3e-4)
    g.close()
