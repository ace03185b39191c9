"""Phi-3 family: pre-fused attn_qkv / gate-up tensors + HF golden parity."""
import numpy as np
import pytest

import jax.numpy as jnp

from nfai_tpu.gguf import GGUFFile
from nfai_tpu.models import KVCache, LlamaConfig, forward, load_params, logits_for, resolve
from nfai_tpu.models.testing import make_tiny_llama_gguf


def test_phi3_prefused_loading(tmp_path):
    path = make_tiny_llama_gguf(
        tmp_path / "p3.gguf", arch="phi3", fused_tensors=True, tied=False
    )
    with GGUFFile.open(path) as g:
        assert type(resolve(g)).__name__ == "LlamaFamily"
        cfg = LlamaConfig.from_gguf(g)
        assert cfg.rope_neox
        params = load_params(g, cfg, dtype=jnp.float32)
    assert "wqkv" in params["layers"] and "w_gate_up" in params["layers"]


def test_phi3_hf_golden_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Phi3Config, Phi3ForCausalLM

    path = make_tiny_llama_gguf(
        tmp_path / "p3hf.gguf",
        arch="phi3",
        fused_tensors=True,
        tied=False,
        hidden=64,
        n_heads=4,
        n_kv_heads=2,
        seed=41,
    )
    g = GGUFFile.open(path)
    cfg = LlamaConfig.from_gguf(g)
    params = load_params(g, cfg, dtype=jnp.float32)

    hf_cfg = Phi3Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_dim,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads,
        rms_norm_eps=cfg.rms_eps,
        rope_theta=cfg.rope_base,
        max_position_embeddings=cfg.context_length,
        tie_word_embeddings=False,
        pad_token_id=0,  # Phi3Config default (32000) exceeds the tiny vocab
    )
    model = Phi3ForCausalLM(hf_cfg)
    sd = model.state_dict()

    def setw(key, arr):
        sd[key].copy_(torch.from_numpy(np.ascontiguousarray(arr)))

    with torch.no_grad():
        setw("model.embed_tokens.weight", g.tensor_f32("token_embd.weight"))
        setw("model.norm.weight", g.tensor_f32("output_norm.weight"))
        setw("lm_head.weight", g.tensor_f32("output.weight"))
        for i in range(cfg.n_layers):
            setw(
                f"model.layers.{i}.input_layernorm.weight",
                g.tensor_f32(f"blk.{i}.attn_norm.weight"),
            )
            setw(
                f"model.layers.{i}.self_attn.qkv_proj.weight",
                g.tensor_f32(f"blk.{i}.attn_qkv.weight"),
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
                f"model.layers.{i}.mlp.gate_up_proj.weight",
                g.tensor_f32(f"blk.{i}.ffn_up.weight"),
            )
            setw(
                f"model.layers.{i}.mlp.down_proj.weight",
                g.tensor_f32(f"blk.{i}.ffn_down.weight"),
            )
    model.eval()

    toks = np.array([[5, 17, 100, 42, 9]], dtype=np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()[0]

    cache = KVCache.zeros(cfg, 1, 8, jnp.float32)
    h, _ = forward(
        params,
        cfg,
        jnp.asarray(toks.astype(np.int32)),
        jnp.arange(5, dtype=jnp.int32)[None, :],
        cache,
        activation_dtype=jnp.float32,
    )
    ours = np.asarray(logits_for(params, h)[0])
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)
    g.close()
