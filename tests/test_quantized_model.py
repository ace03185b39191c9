"""Quantized end-to-end model tests: a Q8_0/Q4-quantized GGUF loaded with
fused kernels must produce (near-)identical logits to the same file loaded
dense-dequantized — the quantization error is in the file, not the kernels."""
import numpy as np
import pytest

import jax.numpy as jnp

from nfai_tpu.gguf import GGMLType, GGUFFile
from nfai_tpu.models import KVCache, LlamaConfig, forward, load_params, logits_for
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.ops.qtensor import QTensor


def _logits(params, cfg, toks):
    cache = KVCache.zeros(cfg, 1, 32, jnp.float32)
    h, _ = forward(
        params,
        cfg,
        jnp.asarray(toks),
        jnp.arange(toks.shape[1], dtype=jnp.int32)[None, :],
        cache,
        activation_dtype=jnp.float32,
    )
    return np.asarray(logits_for(params, h)[0], np.float32)


@pytest.mark.parametrize("quant", [GGMLType.Q8_0, GGMLType.Q4_0])
def test_quantized_matches_dense_dequant(tmp_path, quant):
    # hidden/ffn/kv sized so the layer mats hit the kernel layout constraints
    path = make_tiny_llama_gguf(
        tmp_path / f"q_{quant.name}.gguf",
        hidden=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=4,
        ffn_dim=256,
        quant=quant,
        seed=3,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        dense = load_params(g, cfg, dtype=jnp.float32, quantized=False)
        qparams = load_params(g, cfg, dtype=jnp.float32, quantized="auto")

    # the layer matmuls must actually be quantized (and fused)
    assert isinstance(qparams["layers"]["wqkv"], QTensor)
    assert isinstance(qparams["layers"]["w_gate_up"], QTensor)
    assert isinstance(qparams["layers"]["w_down"], QTensor)
    # embed (vocab=264, not %128) falls back dense
    assert qparams["embed"] is not None

    toks = np.array([[5, 17, 100, 42, 7]], dtype=np.int32)
    l_dense = _logits(dense, cfg, toks)
    l_quant = _logits(qparams, cfg, toks)
    # same quantized file either way; only bf16-matmul noise differs
    scale = np.abs(l_dense).max() + 1e-6
    assert np.abs(l_dense - l_quant).max() / scale < 0.03


def test_quantized_tied_head_gather(tmp_path):
    # vocab 256 (%128==0) -> tied embed stays quantized; embed is gathered
    path = make_tiny_llama_gguf(
        tmp_path / "q_tied.gguf",
        vocab_size=256,
        hidden=128,
        n_layers=1,
        n_heads=4,
        n_kv_heads=4,
        ffn_dim=256,
        quant=GGMLType.Q8_0,
        seed=4,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        dense = load_params(g, cfg, dtype=jnp.float32, quantized=False)
        qparams = load_params(g, cfg, dtype=jnp.float32, quantized="auto")
    assert qparams["embed"] is None
    assert isinstance(qparams["lm_head"], QTensor)

    toks = np.array([[3, 9, 250]], dtype=np.int32)
    l_dense = _logits(dense, cfg, toks)
    l_quant = _logits(qparams, cfg, toks)
    scale = np.abs(l_dense).max() + 1e-6
    assert np.abs(l_dense - l_quant).max() / scale < 0.03


# ---------------------------------------------------------------------------
# End-to-end ggml-semantics golden: a Q4_K_M-style checkpoint through the
# fused kernels must match an INDEPENDENT forward (HF transformers, torch)
# fed the numpy-dequantized weights. Catches any quant kernel/layout/scale
# drift through a full model, not just per-block (VERDICT round-1 item 6).


def _ggml_to_hf_permute(w, n_heads):
    out_dim, in_dim = w.shape
    hd = out_dim // n_heads
    return (
        w.reshape(n_heads, hd // 2, 2, in_dim)
        .transpose(0, 2, 1, 3)
        .reshape(out_dim, in_dim)
    )


def test_hf_golden_parity_q4k_mixed(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    from nfai_tpu.ops.qmatmul import _layer_view, kernel_supported

    # hidden 512 -> q4 kernel tiles (tkb=256, kb=8) are Mosaic-eligible, so
    # the fused kernels (interpret mode on CPU) are actually in the path
    path = make_tiny_llama_gguf(
        tmp_path / "q4k.gguf",
        hidden=512,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        ffn_dim=512,
        quant=GGMLType.Q4_K,
        quant_overrides={
            # llama.cpp Q4_K_M mixes wider kinds into ffn_down / embed
            "blk.0.ffn_down.weight": GGMLType.Q6_K,
            "blk.1.ffn_down.weight": GGMLType.Q6_K,
            "token_embd.weight": GGMLType.Q8_0,
        },
        seed=13,
    )
    g = GGUFFile.open(path)
    cfg = LlamaConfig.from_gguf(g)
    qparams = load_params(g, cfg, dtype=jnp.float32, quantized="auto")

    # the hot mats must be QTensors AND kernel-eligible (else this test
    # would silently validate the XLA fallback instead of the kernels)
    for key, kind in [("wqkv", "q4"), ("w_gate_up", "q4"), ("w_down", "q8")]:
        qt = qparams["layers"][key]
        assert isinstance(qt, QTensor), key
        assert qt.kind == kind, (key, qt.kind)
        assert kernel_supported(_layer_view(qt)), key

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
            setw(f"model.layers.{i}.input_layernorm.weight",
                 g.tensor_f32(f"blk.{i}.attn_norm.weight"))
            setw(f"model.layers.{i}.self_attn.q_proj.weight",
                 _ggml_to_hf_permute(g.tensor_f32(f"blk.{i}.attn_q.weight"),
                                     cfg.n_heads))
            setw(f"model.layers.{i}.self_attn.k_proj.weight",
                 _ggml_to_hf_permute(g.tensor_f32(f"blk.{i}.attn_k.weight"),
                                     cfg.n_kv_heads))
            setw(f"model.layers.{i}.self_attn.v_proj.weight",
                 g.tensor_f32(f"blk.{i}.attn_v.weight"))
            setw(f"model.layers.{i}.self_attn.o_proj.weight",
                 g.tensor_f32(f"blk.{i}.attn_output.weight"))
            setw(f"model.layers.{i}.post_attention_layernorm.weight",
                 g.tensor_f32(f"blk.{i}.ffn_norm.weight"))
            setw(f"model.layers.{i}.mlp.gate_proj.weight",
                 g.tensor_f32(f"blk.{i}.ffn_gate.weight"))
            setw(f"model.layers.{i}.mlp.up_proj.weight",
                 g.tensor_f32(f"blk.{i}.ffn_up.weight"))
            setw(f"model.layers.{i}.mlp.down_proj.weight",
                 g.tensor_f32(f"blk.{i}.ffn_down.weight"))
    model.eval()

    toks = np.array([[5, 17, 100, 42, 7, 250, 3, 99]], dtype=np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()[0]

    ours = _logits(qparams, cfg, toks.astype(np.int32))
    g.close()

    # both sides see the SAME quantized values; the only difference is our
    # bf16 kernel matmuls vs torch f32 — a drift in any dequant/scale/layout
    # step shows up far above this tolerance
    scale = np.abs(hf_logits).max() + 1e-6
    assert np.abs(ours - hf_logits).max() / scale < 0.02
    # greedy continuation must agree everywhere
    np.testing.assert_array_equal(
        ours.argmax(-1), hf_logits.argmax(-1)
    )
