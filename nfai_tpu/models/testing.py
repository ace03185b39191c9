"""Synthetic tiny-Llama GGUF fixtures for tests, benchmarks, and smoke drives.

The reference had no fixtures at all (SURVEY.md §4); these fabricate fully
valid GGUF checkpoints (weights + tokenizer metadata) at arbitrary sizes and
quantizations through the public writer.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..gguf import GGMLType, GGUFWriter
from ..gguf.constants import Keys
from ..tokenizer.bpe import TokenType, bytes_to_unicode


def tiny_spm_tokenizer_metadata() -> dict:
    """SPM-style vocab: <unk>/<s>/</s> + 256 byte pieces (+ scores), so any
    string tokenizes via byte fallback. Exercises the llama-2/gemma path."""
    pieces = ["<unk>", "<s>", "</s>"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    for b in range(256):
        pieces.append(f"<0x{b:02X}>")
        types.append(TokenType.BYTE)
    pieces.append("▁")
    types.append(TokenType.NORMAL)
    return {
        Keys.TOKENIZER_MODEL: "llama",
        Keys.TOKENIZER_TOKENS: pieces,
        "tokenizer.ggml.scores": [0.0] * len(pieces),
        Keys.TOKENIZER_TOKEN_TYPE: types,
        Keys.TOKENIZER_BOS: 1,
        Keys.TOKENIZER_EOS: 2,
        "tokenizer.ggml.unknown_token_id": 0,
    }


def tiny_tokenizer_metadata() -> dict:
    """A byte-level vocab (256 byte tokens + llama-3 specials), no merges.

    Every string tokenizes (one token per byte), so chat smoke tests work
    without a trained merge table.
    """
    b2u = bytes_to_unicode()
    tokens = [b2u[b] for b in range(256)]
    types = [TokenType.NORMAL] * 256
    specials = [
        "<|begin_of_text|>",
        "<|end_of_text|>",
        "<|start_header_id|>",
        "<|end_header_id|>",
        "<|eot_id|>",
    ]
    for s in specials:
        tokens.append(s)
        types.append(TokenType.CONTROL)
    return {
        Keys.TOKENIZER_MODEL: "gpt2",
        Keys.TOKENIZER_PRE: "llama-bpe",
        Keys.TOKENIZER_TOKENS: tokens,
        Keys.TOKENIZER_TOKEN_TYPE: types,
        Keys.TOKENIZER_MERGES: [],
        Keys.TOKENIZER_BOS: tokens.index("<|begin_of_text|>"),
        Keys.TOKENIZER_EOS: tokens.index("<|eot_id|>"),
    }


def make_tiny_llama_gguf(
    path: str | Path,
    *,
    arch: str = "llama",
    vocab_size: int | None = None,
    hidden: int = 64,
    n_layers: int = 2,
    n_heads: int = 4,
    n_kv_heads: int = 2,
    ffn_dim: int = 128,
    context_length: int = 256,
    rope_base: float = 10000.0,
    quant: GGMLType = GGMLType.F32,
    tied: bool = True,
    attn_bias: bool = False,
    qk_norm: bool = False,
    fused_tensors: bool = False,  # phi3-style: attn_qkv + fused ffn_up
    spm_tokenizer: bool = False,  # llama-2-style SPM vocab instead of BPE
    n_experts: int = 0,  # qwen3moe-style MoE FFN
    n_experts_used: int = 0,
    post_norms: bool = False,  # gemma2/3 post_attention/post_ffw norms
    sliding_window: int = 0,  # gemma2/3 {arch}.attention.sliding_window
    attn_softcap: float = 0.0,  # gemma2 softcaps
    final_softcap: float = 0.0,
    seed: int = 0,
    scale: float = 0.05,
    quant_overrides: dict | None = None,  # tensor name -> GGMLType
    rope_freqs: np.ndarray | None = None,  # llama-3.1-style freq_factors
) -> Path:
    """Write a random-weight llama-schema GGUF (llama/mistral/qwen2/qwen3)."""
    rng = np.random.default_rng(seed)
    tok_md = tiny_spm_tokenizer_metadata() if spm_tokenizer else tiny_tokenizer_metadata()
    if vocab_size is None:
        # pad to a multiple of 8 so tensor-parallel vocab sharding divides
        # (model vocab >= tokenizer vocab, as in real llama checkpoints)
        n_tok = len(tok_md[Keys.TOKENIZER_TOKENS])
        vocab_size = (n_tok + 7) // 8 * 8
    head_dim = hidden // n_heads

    w = GGUFWriter()
    w.add(Keys.ARCHITECTURE, arch)
    w.add(Keys.NAME, f"tiny-{arch}-test")
    w.add(f"{arch}.context_length", context_length)
    w.add(f"{arch}.embedding_length", hidden)
    w.add(f"{arch}.block_count", n_layers)
    w.add(f"{arch}.feed_forward_length", ffn_dim)
    w.add(f"{arch}.attention.head_count", n_heads)
    w.add(f"{arch}.attention.head_count_kv", n_kv_heads)
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{arch}.rope.freq_base", rope_base)
    w.add(f"{arch}.vocab_size", vocab_size)
    if sliding_window:
        w.add(f"{arch}.attention.sliding_window", sliding_window)
    if attn_softcap:
        w.add(f"{arch}.attn_logit_softcapping", attn_softcap)
    if final_softcap:
        w.add(f"{arch}.final_logit_softcapping", final_softcap)
    if n_experts:
        w.add(f"{arch}.expert_count", n_experts)
        w.add(f"{arch}.expert_used_count", n_experts_used or 2)
        w.add(f"{arch}.expert_feed_forward_length", ffn_dim)
    for k, v in tok_md.items():
        w.add(k, v)

    def rand(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def addw(name, arr, q=quant):
        if quant_overrides and name in quant_overrides:
            q = quant_overrides[name]
        w.add_tensor(name, arr, q)

    addw("token_embd.weight", rand(vocab_size, hidden))
    if rope_freqs is not None:
        # llama.cpp's per-dim frequency divisors (theta /= factors[i])
        addw("rope_freqs.weight", rope_freqs.astype(np.float32), GGMLType.F32)
    for i in range(n_layers):
        addw(f"blk.{i}.attn_norm.weight", np.ones(hidden, np.float32), GGMLType.F32)
        if fused_tensors:
            addw(
                f"blk.{i}.attn_qkv.weight",
                rand((n_heads + 2 * n_kv_heads) * head_dim, hidden),
            )
        else:
            addw(f"blk.{i}.attn_q.weight", rand(n_heads * head_dim, hidden))
            addw(f"blk.{i}.attn_k.weight", rand(n_kv_heads * head_dim, hidden))
            addw(f"blk.{i}.attn_v.weight", rand(n_kv_heads * head_dim, hidden))
        addw(f"blk.{i}.attn_output.weight", rand(hidden, n_heads * head_dim))
        if attn_bias:
            addw(f"blk.{i}.attn_q.bias", rand(n_heads * head_dim), GGMLType.F32)
            addw(f"blk.{i}.attn_k.bias", rand(n_kv_heads * head_dim), GGMLType.F32)
            addw(f"blk.{i}.attn_v.bias", rand(n_kv_heads * head_dim), GGMLType.F32)
        if qk_norm:
            addw(
                f"blk.{i}.attn_q_norm.weight",
                1.0 + rand(head_dim),
                GGMLType.F32,
            )
            addw(
                f"blk.{i}.attn_k_norm.weight",
                1.0 + rand(head_dim),
                GGMLType.F32,
            )
        if post_norms:
            addw(f"blk.{i}.post_attention_norm.weight",
                 (1.0 + rand(hidden)).astype(np.float32), GGMLType.F32)
            addw(f"blk.{i}.post_ffw_norm.weight",
                 (1.0 + rand(hidden)).astype(np.float32), GGMLType.F32)
        addw(f"blk.{i}.ffn_norm.weight", np.ones(hidden, np.float32), GGMLType.F32)
        if n_experts:
            addw(f"blk.{i}.ffn_gate_inp.weight", rand(n_experts, hidden), GGMLType.F32)
            addw(f"blk.{i}.ffn_gate_exps.weight", rand(n_experts, ffn_dim, hidden))
            addw(f"blk.{i}.ffn_up_exps.weight", rand(n_experts, ffn_dim, hidden))
            addw(f"blk.{i}.ffn_down_exps.weight", rand(n_experts, hidden, ffn_dim))
        elif fused_tensors:
            addw(f"blk.{i}.ffn_up.weight", rand(2 * ffn_dim, hidden))
        else:
            addw(f"blk.{i}.ffn_gate.weight", rand(ffn_dim, hidden))
            addw(f"blk.{i}.ffn_up.weight", rand(ffn_dim, hidden))
        if not n_experts:
            addw(f"blk.{i}.ffn_down.weight", rand(hidden, ffn_dim))
    addw("output_norm.weight", np.ones(hidden, np.float32), GGMLType.F32)
    if not tied:
        addw("output.weight", rand(vocab_size, hidden))
    return w.write(path)
