"""Attention: GQA causal prefill and KV-cache decode (jnp reference forms).

Parity target: the reference's three separate kernels —
``AttentionScoreCalculationShader.cs:164-206`` (scores, GQA mapping
``kvHead = qHead / (qHeads/kvHeads)``, −1e9 masking),
``AttentionSoftmaxShader.cs:139-178`` (3-pass softmax),
``AttentionWeightedValueSumShader.cs:175-216`` (weighted V sum) —
fused here into single XLA computations (and the layer-indexed flash decode
kernel in `nfai_tpu.ops.fused_decode`). Softmax runs in f32;
scale = 1/sqrt(head_dim).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[B, S, n_kv, D] → [B, S, n_kv*n_rep, D] (GQA head replication)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d
    )


def causal_prefill_attention(
    q: jax.Array,  # [B, S, Hq, D]
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,  # [B, S, Hkv, D]
    *,
    q_offset: jax.Array | int = 0,  # position of q[0] within the KV sequence
    kv_len: jax.Array | None = None,  # valid kv length per batch [B] (≤ S)
) -> jax.Array:
    """Causal self-attention over an in-flight prompt chunk."""
    b, s, hq, d = q.shape
    n_rep = hq // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    q_pos = jnp.arange(s)[:, None] + q_offset  # [S,1]
    k_pos = jnp.arange(s)[None, :]  # [1,S]
    mask = k_pos <= q_pos
    if kv_len is not None:
        mask = mask & (k_pos < kv_len[:, None, None, None])
    else:
        mask = mask[None, None, :, :]
    logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def decode_attention(
    q: jax.Array,  # [B, 1, Hq, D]
    k_cache: jax.Array,  # [B, S_max, Hkv, D]
    v_cache: jax.Array,  # [B, S_max, Hkv, D]
    cur_len: jax.Array,  # [B] number of valid cache slots (includes this token)
) -> jax.Array:
    """Single-token attention over the dense KV cache with length masking."""
    b, _, hq, d = q.shape
    s_max = k_cache.shape[1]
    n_rep = hq // k_cache.shape[2]
    k = _repeat_kv(k_cache, n_rep)
    v = _repeat_kv(v_cache, n_rep)
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    k_pos = jnp.arange(s_max)[None, None, None, :]
    mask = k_pos < cur_len[:, None, None, None]
    logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
