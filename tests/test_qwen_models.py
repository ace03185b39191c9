"""Qwen2/Qwen3 family tests: registry dispatch, bias/qk-norm loading, and HF
golden parity (NeoX rope convention — no weight permutation)."""
import numpy as np
import pytest

import jax.numpy as jnp

from nfai_tpu.gguf import GGUFFile
from nfai_tpu.models import KVCache, LlamaConfig, forward, load_params, logits_for, resolve
from nfai_tpu.models.testing import make_tiny_llama_gguf


def _our_logits(g, toks):
    cfg = LlamaConfig.from_gguf(g)
    params = load_params(g, cfg, dtype=jnp.float32)
    cache = KVCache.zeros(cfg, 1, 16, jnp.float32)
    h, _ = forward(
        params,
        cfg,
        jnp.asarray(toks.astype(np.int32)),
        jnp.arange(toks.shape[1], dtype=jnp.int32)[None, :],
        cache,
        activation_dtype=jnp.float32,
    )
    return cfg, params, np.asarray(logits_for(params, h)[0])


def test_qwen2_config_and_registry(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "q2.gguf", arch="qwen2", attn_bias=True)
    with GGUFFile.open(path) as g:
        assert type(resolve(g)).__name__ == "LlamaFamily"
        cfg = LlamaConfig.from_gguf(g)
        assert cfg.attn_bias and not cfg.qk_norm and cfg.rope_neox


def test_mistral_arch_accepted(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "m.gguf", arch="mistral")
    with GGUFFile.open(path) as g:
        cfg = resolve(g).config_from_gguf(g)
        assert not cfg.rope_neox  # mistral GGUFs are permuted like llama


def _fill_hf_common(sd, g, cfg, torch, prefixes):
    def setw(key, arr):
        sd[key].copy_(torch.from_numpy(np.ascontiguousarray(arr)))

    setw("model.embed_tokens.weight", g.tensor_f32("token_embd.weight"))
    setw("model.norm.weight", g.tensor_f32("output_norm.weight"))
    for i in range(cfg.n_layers):
        m = {
            f"model.layers.{i}.input_layernorm.weight": f"blk.{i}.attn_norm.weight",
            f"model.layers.{i}.self_attn.q_proj.weight": f"blk.{i}.attn_q.weight",
            f"model.layers.{i}.self_attn.k_proj.weight": f"blk.{i}.attn_k.weight",
            f"model.layers.{i}.self_attn.v_proj.weight": f"blk.{i}.attn_v.weight",
            f"model.layers.{i}.self_attn.o_proj.weight": f"blk.{i}.attn_output.weight",
            f"model.layers.{i}.post_attention_layernorm.weight": f"blk.{i}.ffn_norm.weight",
            f"model.layers.{i}.mlp.gate_proj.weight": f"blk.{i}.ffn_gate.weight",
            f"model.layers.{i}.mlp.up_proj.weight": f"blk.{i}.ffn_up.weight",
            f"model.layers.{i}.mlp.down_proj.weight": f"blk.{i}.ffn_down.weight",
        }
        m.update(prefixes(i))
        for hf_key, gguf_key in m.items():
            if gguf_key is not None:
                setw(hf_key, g.tensor_f32(gguf_key))


def test_qwen2_hf_golden_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    path = make_tiny_llama_gguf(
        tmp_path / "q2hf.gguf", arch="qwen2", attn_bias=True, seed=21
    )
    g = GGUFFile.open(path)
    toks = np.array([[5, 17, 100, 42, 7, 250]], dtype=np.int64)
    cfg, _, ours = _our_logits(g, toks)

    hf_cfg = Qwen2Config(
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
        attention_bias=True,
    )
    model = Qwen2ForCausalLM(hf_cfg)
    sd = model.state_dict()
    with torch.no_grad():
        _fill_hf_common(
            sd,
            g,
            cfg,
            torch,
            lambda i: {
                f"model.layers.{i}.self_attn.q_proj.bias": f"blk.{i}.attn_q.bias",
                f"model.layers.{i}.self_attn.k_proj.bias": f"blk.{i}.attn_k.bias",
                f"model.layers.{i}.self_attn.v_proj.bias": f"blk.{i}.attn_v.bias",
            },
        )
    model.eval()
    with torch.no_grad():
        hf = model(torch.from_numpy(toks)).logits.numpy()[0]
    np.testing.assert_allclose(ours, hf, rtol=2e-4, atol=2e-4)
    g.close()


def test_qwen3_hf_golden_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    path = make_tiny_llama_gguf(
        tmp_path / "q3hf.gguf", arch="qwen3", qk_norm=True, seed=23
    )
    g = GGUFFile.open(path)
    toks = np.array([[9, 4, 77, 210]], dtype=np.int64)
    cfg, _, ours = _our_logits(g, toks)
    assert cfg.qk_norm

    hf_cfg = Qwen3Config(
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
    )
    model = Qwen3ForCausalLM(hf_cfg)
    sd = model.state_dict()
    with torch.no_grad():
        _fill_hf_common(
            sd,
            g,
            cfg,
            torch,
            lambda i: {
                f"model.layers.{i}.self_attn.q_norm.weight": f"blk.{i}.attn_q_norm.weight",
                f"model.layers.{i}.self_attn.k_norm.weight": f"blk.{i}.attn_k_norm.weight",
            },
        )
    model.eval()
    with torch.no_grad():
        hf = model(torch.from_numpy(toks)).logits.numpy()[0]
    np.testing.assert_allclose(ours, hf, rtol=2e-4, atol=2e-4)
    g.close()
