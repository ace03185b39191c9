"""Flash prefill kernel vs the masked dense reference (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nfai_tpu.ops.prefill_attention import flash_prefill_attention

NEG_INF = -1e30


def reference(q, k_cache, v_cache, offsets):
    # k/v cache: [B, Hkv, S, D]
    b, t, hq, d = q.shape
    _, hkv, s, _ = k_cache.shape
    r = hq // hkv
    qg = q.reshape(b, t, hkv, r, d).astype(jnp.float32)
    logits = jnp.einsum(
        "bthrd,bhsd->bhrts", qg, k_cache.astype(jnp.float32)
    ) / (d**0.5)
    pos = offsets[:, None] + jnp.arange(t)[None, :]  # [B, T]
    mask = jnp.arange(s)[None, None, :] <= pos[:, :, None]  # [B, T, S]
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhrts,bhsd->bthrd", w, v_cache.astype(jnp.float32))
    return out.reshape(b, t, hq, d).astype(q.dtype)


@pytest.mark.parametrize("offsets", [[0, 0], [128, 64]])
@pytest.mark.parametrize("tb,sb", [(64, 128), (128, 256)])
def test_flash_prefill_matches_reference(offsets, tb, sb):
    b, t, hq, hkv, d, s = 2, 128, 8, 2, 64, 512
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, t, hq, d), jnp.float32)
    kc = jax.random.normal(k2, (b, hkv, s, d), jnp.float32)
    vc = jax.random.normal(k3, (b, hkv, s, d), jnp.float32)
    off = jnp.asarray(offsets, jnp.int32)
    got = flash_prefill_attention(
        q, kc, vc, off, t_block=tb, s_block=sb, interpret=True
    )
    want = reference(q, kc, vc, off)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-3
    )


def test_flash_prefill_first_chunk_offset_zero():
    """Row 0 of the scores (q at position 0, only slot 0 visible) is the
    degenerate softmax edge case."""
    b, t, hq, hkv, d, s = 1, 64, 4, 4, 64, 128
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, t, hq, d), jnp.float32)
    kc = jax.random.normal(k2, (b, hkv, s, d), jnp.float32)
    vc = jax.random.normal(k3, (b, hkv, s, d), jnp.float32)
    off = jnp.zeros((b,), jnp.int32)
    got = flash_prefill_attention(q, kc, vc, off, t_block=64, s_block=128,
                                  interpret=True)
    want = reference(q, kc, vc, off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=2e-3)
    # q0 attends only slot 0: output equals v[slot 0] exactly
    np.testing.assert_allclose(
        np.asarray(got[0, 0].reshape(hq, d)),
        np.asarray(vc[0, :, 0, :]),
        atol=1e-5,
    )


def test_model_prefill_flash_matches_xla(tmp_path):
    """Force the flash prefill path through the full model (interpret mode)
    and compare logits with the masked dense path."""
    from nfai_tpu.gguf import GGUFFile
    from nfai_tpu.models import KVCache
    from nfai_tpu.models import llama as L
    from nfai_tpu.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(
        tmp_path / "m.gguf", hidden=256, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=512, context_length=512,
    )
    with GGUFFile.open(path) as g:
        cfg = L.LlamaConfig.from_gguf(g)
        params = L.load_params(g, cfg, dtype=jnp.float32)
    T = 128
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(5, 200, (1, T)), jnp.int32)
    positions = jnp.arange(T, dtype=jnp.int32)[None]
    last = jnp.asarray([T - 1], jnp.int32)
    prev = L.PREFILL_ATTN_IMPL
    try:
        L.PREFILL_ATTN_IMPL = "xla"
        want, _ = L.prefill_step(
            params, cfg, tokens, positions, last,
            KVCache.zeros(cfg, 1, 256, jnp.float32),
        )
        L.PREFILL_ATTN_IMPL = "flash"
        got, _ = L.prefill_step(
            params, cfg, tokens, positions, last,
            KVCache.zeros(cfg, 1, 256, jnp.float32),
        )
    finally:
        L.PREFILL_ATTN_IMPL = prev
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
    )


def windowed_reference(q, k_cache, v_cache, offsets, window, softcap=0.0,
                       scale=None):
    b, t, hq, d = q.shape
    _, hkv, s, _ = k_cache.shape
    r = hq // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)
    qg = q.reshape(b, t, hkv, r, d).astype(jnp.float32)
    logits = jnp.einsum(
        "bthrd,bhsd->bhrts", qg, k_cache.astype(jnp.float32)
    ) * scale
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    pos = offsets[:, None] + jnp.arange(t)[None, :]
    span = jnp.arange(s)[None, None, :]
    mask = span <= pos[:, :, None]
    if window:
        mask &= span > pos[:, :, None] - window
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhrts,bhsd->bthrd", w, v_cache.astype(jnp.float32))
    return out.reshape(b, t, hq, d).astype(q.dtype)


@pytest.mark.parametrize("window,softcap", [(32, 0.0), (200, 50.0), (8, 0.0)])
def test_flash_prefill_sliding_window(window, softcap):
    """gemma2/3 sliding-window prefill: kernel vs masked-einsum reference,
    offsets putting part of the window in previously-cached tokens."""
    b, t, hq, hkv, d, s = 2, 128, 8, 2, 64, 512
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, t, hq, d), jnp.float32)
    kc = jax.random.normal(k2, (b, hkv, s, d), jnp.float32)
    vc = jax.random.normal(k3, (b, hkv, s, d), jnp.float32)
    off = jnp.asarray([0, 128], jnp.int32)
    got = flash_prefill_attention(
        q, kc, vc, off, t_block=64, s_block=128, interpret=True,
        softcap=softcap, window=window,
    )
    want = windowed_reference(q, kc, vc, off, window, softcap)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-3
    )


def test_model_prefill_t192_tb_cap(tmp_path):
    """ADVICE r4 (medium): engine buckets can clamp a chunk to t=192; the
    flash gate admits it but the TB cap (128) does not divide it. The model
    must pick a divisor block (96), not raise."""
    from nfai_tpu.gguf import GGUFFile
    from nfai_tpu.models import KVCache
    from nfai_tpu.models import llama as L
    from nfai_tpu.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(
        tmp_path / "m.gguf", hidden=256, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=512, context_length=512,
    )
    with GGUFFile.open(path) as g:
        cfg = L.LlamaConfig.from_gguf(g)
        params = L.load_params(g, cfg, dtype=jnp.float32)
    T = 192
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(5, 200, (1, T)), jnp.int32)
    positions = jnp.arange(T, dtype=jnp.int32)[None]
    last = jnp.asarray([T - 1], jnp.int32)
    prev = L.PREFILL_ATTN_IMPL
    try:
        L.PREFILL_ATTN_IMPL = "xla"
        want, _ = L.prefill_step(
            params, cfg, tokens, positions, last,
            KVCache.zeros(cfg, 1, 256, jnp.float32),
        )
        L.PREFILL_ATTN_IMPL = "flash"
        got, _ = L.prefill_step(
            params, cfg, tokens, positions, last,
            KVCache.zeros(cfg, 1, 256, jnp.float32),
        )
    finally:
        L.PREFILL_ATTN_IMPL = prev
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
    )


def test_flash_prefill_merged_rejects_d64():
    """ADVICE r4 (low): kv_layout='merged' requires D % 128 == 0."""
    b, t, hq, hkv, d, s = 1, 64, 4, 2, 64, 128
    q = jnp.zeros((b, t, hq, d), jnp.float32)
    kc = jnp.zeros((b, s, hkv * d), jnp.float32)
    off = jnp.zeros((b,), jnp.int32)
    with pytest.raises(ValueError, match="merged"):
        flash_prefill_attention(
            q, kc, kc, off, t_block=64, s_block=128, kv_layout="merged",
            interpret=True,
        )


def test_model_prefill_kv_merged_env(tmp_path, monkeypatch):
    """ADVICE r4 (low): NFAI_PREFILL_KV=merged must forward the NATIVE
    [B, S, KVD] cache (not a transposed 4-D view)."""
    from nfai_tpu.gguf import GGUFFile
    from nfai_tpu.models import KVCache
    from nfai_tpu.models import llama as L
    from nfai_tpu.models.testing import make_tiny_llama_gguf

    path = make_tiny_llama_gguf(
        tmp_path / "m.gguf", hidden=256, n_layers=2, n_heads=2, n_kv_heads=1,
        ffn_dim=512, context_length=512,
    )
    with GGUFFile.open(path) as g:
        cfg = L.LlamaConfig.from_gguf(g)
        params = L.load_params(g, cfg, dtype=jnp.float32)
    # head_dim = 256 / 2 = 128 -> merged layout is legal
    T = 128
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(5, 200, (1, T)), jnp.int32)
    positions = jnp.arange(T, dtype=jnp.int32)[None]
    last = jnp.asarray([T - 1], jnp.int32)
    prev_impl, prev_layout = L.PREFILL_ATTN_IMPL, L._PREFILL_KV_LAYOUT
    try:
        L.PREFILL_ATTN_IMPL = "xla"
        want, _ = L.prefill_step(
            params, cfg, tokens, positions, last,
            KVCache.zeros(cfg, 1, 256, jnp.float32),
        )
        L.PREFILL_ATTN_IMPL = "flash"
        L._PREFILL_KV_LAYOUT = "merged"
        got, _ = L.prefill_step(
            params, cfg, tokens, positions, last,
            KVCache.zeros(cfg, 1, 256, jnp.float32),
        )
    finally:
        L.PREFILL_ATTN_IMPL = prev_impl
        L._PREFILL_KV_LAYOUT = prev_layout
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
    )
