"""RMSNorm.

Parity target: ``NFAI.Vulkan.Shaders/RMSNormShader.cs:124-151`` — each GPU
thread there recomputes the full sum of squares (O(n²)); here it is a single
fused reduction. The jnp form fuses into one XLA kernel on TPU — no Pallas
version is needed (measured: XLA's fusion is already bandwidth-bound here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """y = x / sqrt(mean(x^2) + eps) * weight, reduced over the last axis.

    Statistics are computed in float32 regardless of activation dtype
    (bf16 sum-of-squares loses too much precision at hidden ≥ 2k).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)
