"""Gemma-2 / Gemma-3 families: config detection + HF golden logit parity.

Covers the features beyond gemma-1: alternating sliding-window attention,
attention/final logit softcapping + query_pre_attn_scalar (gemma2), post
attention/ffw norms, and gemma3's dual rope bases (local layers at 10k) with
per-head q/k rmsnorm. GGUF conventions follow llama.cpp's converter: norm
weights carry the +1 folded in; swa pattern is 2 (gemma2) / 6 (gemma3) with
every pattern-th layer global.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from nfai_tpu.gguf import GGUFFile
from nfai_tpu.models import KVCache, LlamaConfig, forward, load_params, logits_for, resolve
from nfai_tpu.models.testing import make_tiny_llama_gguf

TOKS = np.array([[5, 17, 100, 42, 7, 250, 3, 99, 30, 6, 81, 12]], dtype=np.int64)


def _ours(path, toks):
    g = GGUFFile.open(path)
    cfg = LlamaConfig.from_gguf(g)
    assert resolve(g) is not None
    params = load_params(g, cfg, dtype=jnp.float32)
    g.close()
    t = toks.shape[1]
    cache = KVCache.zeros(cfg, 1, 16, jnp.float32)
    h, _ = forward(
        params,
        cfg,
        jnp.asarray(toks.astype(np.int32)),
        jnp.arange(t, dtype=jnp.int32)[None, :],
        cache,
        activation_dtype=jnp.float32,
    )
    return cfg, np.asarray(logits_for(params, h, cfg)[0], np.float32)


def _fill_hf(model, g, cfg, torch, qk_norm=False):
    """Load dequantized GGUF weights into an HF gemma2/3 model (norms are
    stored with +1 folded in -> HF weight = file - 1)."""
    sd = model.state_dict()

    def setw(key, arr):
        sd[key].copy_(torch.from_numpy(np.ascontiguousarray(arr)))

    def norm(key, name):
        setw(key, g.tensor_f32(name) - 1.0)

    with torch.no_grad():
        setw("model.embed_tokens.weight", g.tensor_f32("token_embd.weight"))
        norm("model.norm.weight", "output_norm.weight")
        for i in range(cfg.n_layers):
            norm(f"model.layers.{i}.input_layernorm.weight",
                 f"blk.{i}.attn_norm.weight")
            norm(f"model.layers.{i}.post_attention_layernorm.weight",
                 f"blk.{i}.post_attention_norm.weight")
            norm(f"model.layers.{i}.pre_feedforward_layernorm.weight",
                 f"blk.{i}.ffn_norm.weight")
            norm(f"model.layers.{i}.post_feedforward_layernorm.weight",
                 f"blk.{i}.post_ffw_norm.weight")
            # gemma GGUFs are NEOX (unpermuted) — no q/k permutation
            setw(f"model.layers.{i}.self_attn.q_proj.weight",
                 g.tensor_f32(f"blk.{i}.attn_q.weight"))
            setw(f"model.layers.{i}.self_attn.k_proj.weight",
                 g.tensor_f32(f"blk.{i}.attn_k.weight"))
            setw(f"model.layers.{i}.self_attn.v_proj.weight",
                 g.tensor_f32(f"blk.{i}.attn_v.weight"))
            setw(f"model.layers.{i}.self_attn.o_proj.weight",
                 g.tensor_f32(f"blk.{i}.attn_output.weight"))
            if qk_norm:
                norm(f"model.layers.{i}.self_attn.q_norm.weight",
                     f"blk.{i}.attn_q_norm.weight")
                norm(f"model.layers.{i}.self_attn.k_norm.weight",
                     f"blk.{i}.attn_k_norm.weight")
            setw(f"model.layers.{i}.mlp.gate_proj.weight",
                 g.tensor_f32(f"blk.{i}.ffn_gate.weight"))
            setw(f"model.layers.{i}.mlp.up_proj.weight",
                 g.tensor_f32(f"blk.{i}.ffn_up.weight"))
            setw(f"model.layers.{i}.mlp.down_proj.weight",
                 g.tensor_f32(f"blk.{i}.ffn_down.weight"))
    model.eval()


def test_gemma2_config(tmp_path):
    path = make_tiny_llama_gguf(
        tmp_path / "g2.gguf", arch="gemma2", post_norms=True,
        sliding_window=8, attn_softcap=50.0, final_softcap=30.0,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    assert cfg.sliding_window == 8 and cfg.swa_pattern == 2
    assert cfg.post_norms and cfg.activation == "gelu"
    assert cfg.attn_scale == pytest.approx(
        (cfg.hidden_size / cfg.n_heads) ** -0.5
    )
    # layer 0 local, layer 1 global, ... (default fixture: 2 layers)
    assert cfg.layer_windows() == [8, 0][: cfg.n_layers]


def test_gemma3_config(tmp_path):
    path = make_tiny_llama_gguf(
        tmp_path / "g3.gguf", arch="gemma3", post_norms=True,
        sliding_window=8, qk_norm=True, n_layers=6,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
    assert cfg.swa_pattern == 6 and cfg.sliding_window == 8
    assert cfg.rope_base_local == 10000.0
    assert cfg.qk_norm and cfg.post_norms
    assert cfg.layer_windows() == [8, 8, 8, 8, 8, 0]
    assert cfg.attn_scale == 0.0  # standard 1/sqrt(head_dim)


def test_gemma2_hf_golden_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2ForCausalLM

    path = make_tiny_llama_gguf(
        tmp_path / "g2hf.gguf", arch="gemma2", hidden=64, n_layers=4,
        n_heads=4, n_kv_heads=2, ffn_dim=128, post_norms=True,
        sliding_window=8, attn_softcap=50.0, final_softcap=30.0, seed=37,
        rope_base=10000.0,
    )
    cfg, ours = _ours(path, TOKS)
    # the 12-token prompt must actually exceed the window so the sliding
    # mask changes the answer
    assert TOKS.shape[1] > cfg.sliding_window

    hf_cfg = Gemma2Config(
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
        sliding_window=cfg.sliding_window,
        attn_logit_softcapping=cfg.attn_softcap,
        final_logit_softcapping=cfg.final_softcap,
        query_pre_attn_scalar=cfg.hidden_size // cfg.n_heads,
        attn_implementation="eager",  # softcap requires the eager path
    )
    model = Gemma2ForCausalLM(hf_cfg)
    with GGUFFile.open(path) as g:
        _fill_hf(model, g, cfg, torch)
        with torch.no_grad():
            hf_logits = model(torch.from_numpy(TOKS)).logits.numpy()[0]

    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_gemma3_hf_golden_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    path = make_tiny_llama_gguf(
        tmp_path / "g3hf.gguf", arch="gemma3", hidden=64, n_layers=6,
        n_heads=4, n_kv_heads=2, ffn_dim=128, post_norms=True,
        sliding_window=8, qk_norm=True, seed=41, rope_base=1000000.0,
    )
    cfg, ours = _ours(path, TOKS)
    assert TOKS.shape[1] > cfg.sliding_window

    hf_cfg = Gemma3TextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_dim,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_eps,
        rope_theta=cfg.rope_base,
        rope_local_base_freq=cfg.rope_base_local,
        rope_scaling=None,
        max_position_embeddings=cfg.context_length,
        tie_word_embeddings=True,
        attention_bias=False,
        hidden_act="gelu_pytorch_tanh",
        sliding_window=cfg.sliding_window,
        query_pre_attn_scalar=cfg.head_dim,
        attn_implementation="eager",
    )
    model = Gemma3ForCausalLM(hf_cfg)
    with GGUFFile.open(path) as g:
        _fill_hf(model, g, cfg, torch, qk_norm=True)
        with torch.no_grad():
            hf_logits = model(torch.from_numpy(TOKS)).logits.numpy()[0]

    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_sliding_window_changes_logits(tmp_path):
    """The window mask must actually bite: the same checkpoint read as plain
    'gemma' (no window) disagrees with gemma2 on late positions."""
    kw = dict(
        hidden=64, n_layers=2, n_heads=4, n_kv_heads=2, ffn_dim=128,
        post_norms=True, sliding_window=4, seed=5,
    )
    p2 = make_tiny_llama_gguf(tmp_path / "w.gguf", arch="gemma2", **kw)
    cfg2, l2 = _ours(p2, TOKS)
    assert cfg2.layer_windows() == [4, 0]
    # same file, window disabled via config override
    g = GGUFFile.open(p2)
    cfg_full = LlamaConfig.from_gguf(g)
    import dataclasses

    cfg_full = dataclasses.replace(cfg_full, sliding_window=0, swa_pattern=0)
    params = load_params(g, cfg_full, dtype=jnp.float32)
    g.close()
    cache = KVCache.zeros(cfg_full, 1, 16, jnp.float32)
    t = TOKS.shape[1]
    h, _ = forward(
        params, cfg_full, jnp.asarray(TOKS.astype(np.int32)),
        jnp.arange(t, dtype=jnp.int32)[None, :], cache,
        activation_dtype=jnp.float32,
    )
    l_full = np.asarray(logits_for(params, h, cfg_full)[0], np.float32)
    # early positions (inside the window) agree; late positions differ
    np.testing.assert_allclose(l2[:4], l_full[:4], rtol=1e-4, atol=1e-4)
    assert np.abs(l2[-1] - l_full[-1]).max() > 1e-3
