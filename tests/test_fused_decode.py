"""Fused single-token decode path: layer-indexed Pallas kernels.

The fused path (models.llama._decode_forward_fused) replaces the generic
layer-scan with kernels that index the stacked weights / merged-lane KV cache
[L, B, S, KVD] by a scalar-prefetch layer id (ops.fused_decode,
ops.qmatmul.*_layered). These tests pin its numerics against the XLA path
across the model-family quirks (biases, qk-norm, pre-fused projections,
GELU/embed-scale) in interpret mode.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nfai_tpu.gguf import GGMLType, GGUFFile
from nfai_tpu.models import KVCache, LlamaConfig, forward, load_params, logits_for
from nfai_tpu.models import llama as llama_mod
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.ops.fused_decode import (
    layered_decode_attention,
    layered_decode_reference,
    write_cache_rows,
)


@pytest.fixture
def force_fused():
    old = llama_mod.FUSED_DECODE_IMPL
    llama_mod.FUSED_DECODE_IMPL = "fused"
    yield
    llama_mod.FUSED_DECODE_IMPL = old


def test_layered_attention_kernel_parity(rng):
    l, hkv, r, b, s, d = 3, 2, 4, 4, 256, 64
    hq, kvd = hkv * r, hkv * d
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    # includes 0 (no old tokens), a mid-block length, and full cache - 1
    starts = jnp.asarray([0, 1, 130, s - 1], jnp.int32)
    for layer in (0, 2):
        ref, kref, vref = layered_decode_reference(
            q, kn, vn, kc, vc, jnp.int32(layer), starts
        )
        out = layered_decode_attention(
            q, kn, vn, kc, vc, jnp.int32(layer), starts,
            s_block=128, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        kw = write_cache_rows(kc, kn, jnp.int32(layer), starts)
        np.testing.assert_array_equal(np.asarray(kw), np.asarray(kref))


def test_layered_attention_respects_layer_index(rng):
    """Attending over layer 1 must not read layer 0's cache."""
    l, hkv, r, b, s, d = 2, 1, 2, 2, 128, 64
    kvd = hkv * d
    q = jnp.asarray(rng.standard_normal((b, hkv * r, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    starts = jnp.asarray([64, 100], jnp.int32)
    out1 = layered_decode_attention(
        q, kn, vn, kc, vc, jnp.int32(1), starts, s_block=128, interpret=True
    )
    # scrambling layer 0 must not change the result
    kc0 = kc.at[0].set(jnp.flip(kc[0], axis=-1) * 3.0)
    vc0 = vc.at[0].set(jnp.flip(vc[0], axis=-1) * 3.0)
    out1b = layered_decode_attention(
        q, kn, vn, kc0, vc0, jnp.int32(1), starts, s_block=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out1b))


def test_layered_attention_gqa_head_isolation(rng):
    """With Hkv=2 groups, scrambling head 1's cache must not change head 0's
    output (the block-diagonal query trick must not leak across heads)."""
    l, hkv, r, b, s, d = 1, 2, 2, 2, 128, 64
    hq, kvd = hkv * r, hkv * d
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    starts = jnp.asarray([100, 64], jnp.int32)
    out = layered_decode_attention(
        q, kn, vn, kc, vc, jnp.int32(0), starts, s_block=128, interpret=True
    )
    # scramble head 1's columns (d..2d) everywhere
    kc2 = kc.at[..., d:].multiply(-2.0)
    vc2 = vc.at[..., d:].multiply(3.0)
    kn2 = kn.at[..., d:].multiply(-1.5)
    vn2 = vn.at[..., d:].multiply(2.5)
    out2 = layered_decode_attention(
        q, kn2, vn2, kc2, vc2, jnp.int32(0), starts, s_block=128,
        interpret=True,
    )
    # head group 0 (query rows 0..r) untouched; group 1 must differ
    np.testing.assert_array_equal(
        np.asarray(out[:, :r]), np.asarray(out2[:, :r])
    )
    assert np.abs(np.asarray(out[:, r:]) - np.asarray(out2[:, r:])).max() > 0


def _fused_vs_xla_logits(path, quantized, prompt_len=5):
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        params = load_params(g, cfg, dtype=jnp.float32, quantized=quantized)
    b, s = 2, 128
    cache = KVCache.zeros(cfg, b, s, jnp.float32)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(4, 200, (b, prompt_len)), jnp.int32)
    pos = jnp.broadcast_to(
        jnp.arange(prompt_len, dtype=jnp.int32), (b, prompt_len)
    )
    h, cache = forward(params, cfg, toks, pos, cache, activation_dtype=jnp.float32)
    nt = jnp.asarray(rng.integers(4, 200, (b, 1)), jnp.int32)
    npos = jnp.full((b, 1), prompt_len, jnp.int32)

    llama_mod.FUSED_DECODE_IMPL = "xla"
    h_x, c_x = forward(params, cfg, nt, npos, cache, activation_dtype=jnp.float32)
    llama_mod.FUSED_DECODE_IMPL = "fused"
    h_f, c_f = forward(params, cfg, nt, npos, cache, activation_dtype=jnp.float32)
    lx = np.asarray(logits_for(params, h_x), np.float32)
    lf = np.asarray(logits_for(params, h_f), np.float32)
    return lx, lf, c_x, c_f


@pytest.mark.parametrize(
    "kwargs,quantized",
    [
        # llama NORM-rope weights (loader permutes to neox layout), quantized
        (dict(quant=GGMLType.Q4_0), "auto"),
        # qwen2-style attention biases, dense f32
        (dict(arch="qwen2", attn_bias=True, rope_base=1e6), False),
        # qwen3-style qk-norm
        (dict(arch="qwen3", qk_norm=True, rope_base=1e6), False),
        # phi3-style pre-fused wqkv / gate-up
        (dict(arch="phi3", fused_tensors=True, tied=False), False),
    ],
)
def test_fused_decode_matches_xla(tmp_path, force_fused, kwargs, quantized):
    path = make_tiny_llama_gguf(
        tmp_path / "m.gguf",
        hidden=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        ffn_dim=256,
        seed=3,
        **kwargs,
    )
    lx, lf, c_x, c_f = _fused_vs_xla_logits(path, quantized)
    scale = np.abs(lx).max() + 1e-6
    tol = 0.02 if quantized else 2e-4
    assert np.abs(lx - lf).max() / scale < tol
    kscale = np.abs(np.asarray(c_x.k)).max() + 1e-6
    assert np.abs(np.asarray(c_x.k) - np.asarray(c_f.k)).max() / kscale < tol
    assert np.abs(np.asarray(c_x.v) - np.asarray(c_f.v)).max() / kscale < tol


def test_fused_decode_multistep_generation(tmp_path, force_fused):
    """Greedy decode for several steps must track the XLA path token-for-token."""
    path = make_tiny_llama_gguf(
        tmp_path / "m.gguf", hidden=128, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=256, seed=7,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        params = load_params(g, cfg, dtype=jnp.float32, quantized=False)

    def greedy(impl, steps=6):
        llama_mod.FUSED_DECODE_IMPL = impl
        cache = KVCache.zeros(cfg, 1, 128, jnp.float32)
        toks = jnp.asarray([[5, 9, 33]], jnp.int32)
        pos = jnp.arange(3, dtype=jnp.int32)[None, :]
        h, cache = forward(params, cfg, toks, pos, cache,
                           activation_dtype=jnp.float32)
        out = []
        tok = jnp.argmax(logits_for(params, h[:, -1:]), axis=-1).astype(jnp.int32)
        for i in range(steps):
            out.append(int(tok[0, 0]))
            h, cache = forward(params, cfg, tok, jnp.full((1, 1), 3 + i, jnp.int32),
                               cache, activation_dtype=jnp.float32)
            tok = jnp.argmax(logits_for(params, h), axis=-1).astype(jnp.int32)
        return out

    assert greedy("xla") == greedy("fused")


def test_eligibility_gates(tmp_path):
    """Fused path must decline multi-token, paged, MoE and TP calls."""
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, n_layers=1, n_heads=2, n_kv_heads=1,
        head_dim=32, ffn_dim=64, rope_base=1e4, context_length=256,
    )
    assert not llama_mod._fused_decode_eligible({}, cfg, 4, None, 256)
    assert not llama_mod._fused_decode_eligible({}, cfg, 1, object(), 256)
    moe = cfg._replace(n_experts=4) if hasattr(cfg, "_replace") else None
    if moe is not None:
        assert not llama_mod._fused_decode_eligible({}, moe, 1, None, 256)


def test_layered_attention_window_softcap_parity(rng):
    """Sliding-window masking + gemma2 tanh softcap + custom query scale in
    the fused kernel vs the jnp reference (incl. the low-block skip clamp)."""
    l, hkv, r, b, s, d = 2, 2, 4, 4, 512, 64
    hq, kvd = hkv * r, hkv * d
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    # lengths spanning: inside one block, window crossing block boundaries,
    # and near the end of the cache
    starts = jnp.asarray([0, 100, 300, s - 1], jnp.int32)
    for window, softcap, scale in [(64, 0.0, None), (200, 50.0, 0.11), (8, 30.0, None)]:
        ref, _, _ = layered_decode_reference(
            q, kn, vn, kc, vc, jnp.int32(1), starts,
            scale=scale, softcap=softcap, window=window,
        )
        out = layered_decode_attention(
            q, kn, vn, kc, vc, jnp.int32(1), starts,
            s_block=128, interpret=True,
            scale=scale, softcap=softcap, window=window,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5,
            err_msg=f"window={window} softcap={softcap}",
        )


def test_slab_attention_kernel_parity(rng):
    """Batch-slab kernel == per-row kernel == reference, incl. non-uniform
    row lengths and the analytic new-token fold."""
    from nfai_tpu.ops.fused_decode import layered_decode_attention_slab

    l, hkv, r, b, s, d = 3, 2, 4, 4, 256, 64
    hq, kvd = hkv * r, hkv * d
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    starts = jnp.asarray([0, 1, 130, s - 1], jnp.int32)
    for layer in (0, 2):
        ref, _, _ = layered_decode_reference(
            q, kn, vn, kc, vc, jnp.int32(layer), starts
        )
        out = layered_decode_attention_slab(
            q, kn, vn, kc, vc, jnp.int32(layer), starts,
            s_block=128, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_slab_attention_int8_parity(rng):
    """Slab kernel with the int8 cache + scale operands matches the per-row
    quantized kernel bit-for-bit semantics."""
    from nfai_tpu.models.llama import quantize_kv
    from nfai_tpu.ops.fused_decode import layered_decode_attention_slab

    l, hkv, r, b, s, d = 2, 2, 2, 2, 256, 64
    hq, kvd = hkv * r, hkv * d
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    kq, ks4 = quantize_kv(kf, hkv)
    vq, vs4 = quantize_kv(vf, hkv)
    ks = jnp.swapaxes(ks4, -1, -2)
    vs = jnp.swapaxes(vs4, -1, -2)
    starts = jnp.asarray([200, 64], jnp.int32)
    for layer in (0, 1):
        ref = layered_decode_attention(
            q, kn, vn, kq, vq, jnp.int32(layer), starts,
            s_block=128, interpret=True, k_scales=ks, v_scales=vs,
        )
        out = layered_decode_attention_slab(
            q, kn, vn, kq, vq, jnp.int32(layer), starts,
            s_block=128, interpret=True, k_scales=ks, v_scales=vs,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
