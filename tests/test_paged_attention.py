"""Paged decode-attention parity: the Pallas kernel path (forced, interpret
mode on CPU) must match the masked-einsum reference path."""
import numpy as np
import pytest

import jax.numpy as jnp

from nfai_tpu.models import llama


@pytest.mark.parametrize("b,hq,hkv,s,d", [(2, 8, 4, 256, 64), (3, 4, 4, 128, 128)])
def test_paged_decode_matches_einsum(rng, b, hq, hkv, s, d):
    from jax.experimental.pallas import tpu as pltpu

    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((hkv, b, s, d)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((hkv, b, s, d)), jnp.float32) * 0.3
    positions = jnp.asarray(np.array([[s // 2 - 1], [s - 1], [7]][:b]), jnp.int32)

    ref = np.asarray(llama._cached_attention(q, k, v, positions), np.float32)

    old = llama.DECODE_ATTN_IMPL
    llama.DECODE_ATTN_IMPL = "paged"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(llama._cached_attention(q, k, v, positions), np.float32)
    finally:
        llama.DECODE_ATTN_IMPL = old

    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
