"""Rotary position embeddings (GGUF/ggml "NORM" style: adjacent pairs).

Parity target: ``NFAI.Vulkan.Shaders/RoPEShader.cs:231-272`` — rotates pairs
(2z, 2z+1) with theta = pos * base^(-2z/head_dim). GGUF llama checkpoints have
the HF→ggml Q/K permutation baked into the weights, so adjacent-pair rotation
is the correct convention here. Unlike the reference (which hardcodes base
500000 ignoring metadata, ``TransformerBlock.cs:33-38``), the base and
Llama-3.1+ frequency scaling come from the checkpoint.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_inv_freq(
    head_dim: int,
    base: float = 10000.0,
    scaling_type: str = "none",
    scaling_factor: float = 1.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_context_length: int = 8192,
) -> np.ndarray:
    """Inverse frequencies per rotation pair, with optional Llama-3 smoothing.

    "llama3" implements the Llama-3.1/3.2 rope scaling: wavelengths longer than
    the original context are divided by `scaling_factor`, with a smooth ramp
    between low/high frequency cutoffs. Checkpoints converted by llama.cpp may
    instead carry the result directly as a `rope_freqs.weight` tensor.
    """
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    if scaling_type in ("none", ""):
        return inv_freq.astype(np.float32)
    if scaling_type == "linear":
        return (inv_freq / scaling_factor).astype(np.float32)
    if scaling_type == "llama3":
        low_wavelen = original_context_length / low_freq_factor
        high_wavelen = original_context_length / high_freq_factor
        wavelen = 2.0 * np.pi / inv_freq
        scaled = np.where(wavelen > low_wavelen, inv_freq / scaling_factor, inv_freq)
        smooth = (original_context_length / wavelen - low_freq_factor) / (
            high_freq_factor - low_freq_factor
        )
        mid = (1 - smooth) * inv_freq / scaling_factor + smooth * inv_freq
        is_mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        return np.where(is_mid, mid, scaled).astype(np.float32)
    raise ValueError(f"unsupported rope scaling type {scaling_type!r}")


def rope_cos_sin(
    positions: jax.Array,  # [..., seq]
    inv_freq: jax.Array,  # [head_dim // 2]
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables [..., seq, head_dim/2] for a batch of
    positions. Hoisted out of the per-layer scan: every layer shares the same
    angles, so the trig runs once per token step instead of twice per layer."""
    theta = positions[..., :, None].astype(jnp.float32) * inv_freq[None, :]
    return jnp.cos(theta), jnp.sin(theta)


def apply_rope_cs(
    x: jax.Array,  # [..., seq, heads, head_dim]
    cos: jax.Array,  # [..., seq, head_dim // 2]
    sin: jax.Array,
    neox: bool = False,
) -> jax.Array:
    """Rotary embedding from precomputed cos/sin, in either ggml convention.

    `neox=False` (ggml NORM, llama/mistral GGUFs — the HF permutation is
    baked into the weights): rotate adjacent pairs (2i, 2i+1). This needs an
    even/odd lane interleave, which costs lane shuffles on TPU —
    `models.llama.load_params` converts NORM checkpoints to the NEOX layout
    at load time precisely to avoid this path in the hot loop.
    `neox=True` (ggml NEOX, qwen2/qwen3 and other unpermuted checkpoints):
    rotate half-split pairs (i, i + head_dim/2) — contiguous slices only.
    """
    cos = cos[..., :, None, :]  # [..., seq, 1, hd/2]
    sin = sin[..., :, None, :]
    shape = x.shape
    xf = x.astype(jnp.float32)
    if neox:
        half = shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    else:
        xf = xf.reshape(*shape[:-1], shape[-1] // 2, 2)
        even, odd = xf[..., 0], xf[..., 1]
        r_even = even * cos - odd * sin
        r_odd = even * sin + odd * cos
        out = jnp.stack([r_even, r_odd], axis=-1).reshape(shape)
    return out.astype(x.dtype)


def apply_rope(
    x: jax.Array,  # [..., seq, heads, head_dim]
    positions: jax.Array,  # [..., seq]
    inv_freq: jax.Array,  # [head_dim // 2]
    neox: bool = False,
) -> jax.Array:
    """Rotary embedding in either ggml convention (see apply_rope_cs)."""
    cos, sin = rope_cos_sin(positions, inv_freq)
    return apply_rope_cs(x, cos, sin, neox)


def norm_to_neox_perm(n_heads: int, head_dim: int) -> np.ndarray:
    """Output-column permutation converting a ggml-NORM q/k projection to the
    half-split (NEOX/HF) layout.

    llama.cpp's convert permutes HF rows h*D + v*(D/2)+u to ggml rows
    h*D + 2u+v so adjacent-pair rotation matches HF's half-split rotation.
    Inverting it at load lets the hot loop always run the shuffle-free NEOX
    rope; attention scores are invariant because q and k permute together.
    """
    half = head_dim // 2
    i = np.arange(head_dim)
    within = 2 * (i % half) + i // half  # perm[v*half+u] = 2u+v
    heads = np.arange(n_heads)[:, None] * head_dim
    return (heads + within[None, :]).reshape(-1)
