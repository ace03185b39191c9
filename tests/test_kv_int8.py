"""int8 KV cache: quantization roundtrip, fused-kernel parity, model and
engine end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from nfai_tpu.models.llama import KVCache, dequant_kv, quantize_kv


def test_quantize_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 4 * 16)), jnp.float32)
    q, s = quantize_kv(x, 4)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 4)
    back = dequant_kv(q, jnp.swapaxes(s, -1, -2), jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(x)).max()
    # worst case one int8 step of the per-head amax
    amax = np.abs(np.asarray(x)).reshape(2, 5, 4, 16).max(-1)
    assert err <= (amax.max() / 127.0) * 0.5 + 1e-6


def test_fused_kernel_int8_parity():
    """Quantized-cache fused attention == reference attention over the
    dequantized cache (exact same int8 grid, so only f32 assoc noise)."""
    from nfai_tpu.ops.fused_decode import (
        layered_decode_attention,
        layered_decode_reference,
    )

    rng = np.random.default_rng(1)
    L, B, S, HKV, D, HQ = 3, 2, 256, 2, 64, 4
    KVD = HKV * D
    kf = rng.standard_normal((L, B, S, KVD)).astype(np.float32)
    vf = rng.standard_normal((L, B, S, KVD)).astype(np.float32)
    kq, ks4 = quantize_kv(jnp.asarray(kf), HKV)
    vq, vs4 = quantize_kv(jnp.asarray(vf), HKV)
    # scale arrays are stored time-minor [L, B, Hkv, S]
    ks = jnp.swapaxes(ks4, -1, -2)
    vs = jnp.swapaxes(vs4, -1, -2)
    # the reference runs over the dequantized values (bit-identical grid)
    kd = np.stack([np.asarray(dequant_kv(kq[l], ks[l], jnp.float32))
                   for l in range(L)])
    vd = np.stack([np.asarray(dequant_kv(vq[l], vs[l], jnp.float32))
                   for l in range(L)])
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, KVD)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, KVD)), jnp.float32)
    starts = jnp.asarray([200, 64], jnp.int32)
    for layer in (0, 2):
        ref, _, _ = layered_decode_reference(
            q, kn, vn, jnp.asarray(kd), jnp.asarray(vd),
            jnp.int32(layer), starts,
        )
        got = layered_decode_attention(
            q, kn, vn, kq, vq, jnp.int32(layer), starts,
            s_block=128, interpret=True, k_scales=ks, v_scales=vs,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-3
        )


def _tiny(tmp_path, name, **kw):
    from nfai_tpu.models.testing import make_tiny_llama_gguf

    return make_tiny_llama_gguf(
        tmp_path / name, hidden=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, seed=7, **kw,
    )


def test_model_int8_cache_close_to_bf16(tmp_path):
    """Same model, same prompt: int8-cache logits stay close to the
    full-precision-cache logits through prefill + several decode steps."""
    from nfai_tpu.config import EngineConfig
    from nfai_tpu.models import prefill_step
    from nfai_tpu.models.llama import decode_step
    from nfai_tpu.runtime.engine import InferenceEngine

    path = _tiny(tmp_path, "kv8.gguf")
    eng = InferenceEngine(path, EngineConfig(max_seq_len=64, dtype="float32"))
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]

    def run(quantized):
        cache = KVCache.zeros(eng.model_cfg, 1, 64, jnp.float32,
                              quantized=quantized)
        logits, cache = eng.prefill(cache, prompt)
        outs = [np.asarray(logits)]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = len(prompt)
        for _ in range(4):
            logits, cache = decode_step(
                eng.params, eng.model_cfg, tok,
                jnp.asarray([pos], jnp.int32), cache,
            )
            outs.append(np.asarray(logits))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            pos += 1
        return outs

    full = run(False)
    quant = run(True)
    for a, b in zip(full, quant):
        # int8 KV error is small relative to the logit scale
        assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.05


def test_engine_int8_end_to_end(tmp_path):
    from nfai_tpu.config import EngineConfig, SamplingParams
    from nfai_tpu.runtime.engine import ChatSession, InferenceEngine

    path = _tiny(tmp_path, "kv8e.gguf")
    eng = InferenceEngine(
        path, EngineConfig(max_seq_len=96, dtype="float32", kv_dtype="int8")
    )
    sp = SamplingParams(temperature=0.0, max_new_tokens=12)
    out = list(eng.generate([5, 6, 7, 8], sp))
    assert len(out) == 12
    # session save/restore carries the scale arrays
    sess = ChatSession(eng, sp)
    sess.send("hi")
    p = tmp_path / "sess.npz"
    sess.save(p)
    restored = ChatSession.load(eng, p)
    assert restored._cache is not None and restored._cache.ks is not None


def test_paged_int8_kernel_parity():
    """int8 paged pool + scales through the block-table kernel matches the
    dense reference on the dequantized pool."""
    import jax
    import jax.numpy as jnp

    from nfai_tpu.models.llama import quantize_kv
    from nfai_tpu.ops.paged_attention import (
        paged_attention_reference,
        paged_flash_decode_attention,
    )

    rng = np.random.default_rng(3)
    b, hq, hkv, d, ps, npages = 2, 8, 4, 64, 16, 9
    tables = jnp.asarray([[1, 3, 5, 7], [2, 4, 6, 8]], jnp.int32)
    lengths = jnp.asarray([37, 52], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kd = rng.standard_normal((hkv, npages, ps, d)).astype(np.float32)
    vd = rng.standard_normal((hkv, npages, ps, d)).astype(np.float32)
    # quantize per (page-token, head): reshape to [..., H*D] rows
    kq, ks = quantize_kv(
        jnp.asarray(kd).transpose(1, 2, 0, 3).reshape(npages, ps, hkv * d), hkv
    )
    vq, vs = quantize_kv(
        jnp.asarray(vd).transpose(1, 2, 0, 3).reshape(npages, ps, hkv * d), hkv
    )
    k_pages = kq.reshape(npages, ps, hkv, d).transpose(2, 0, 1, 3)
    v_pages = vq.reshape(npages, ps, hkv, d).transpose(2, 0, 1, 3)
    ksp = ks.transpose(2, 0, 1)  # [Hkv, P, ps]
    vsp = vs.transpose(2, 0, 1)
    out = paged_flash_decode_attention(
        q, k_pages, v_pages, tables, lengths, interpret=True,
        k_scales=ksp, v_scales=vsp,
    )
    # reference on the dequantized dense pool
    kdeq = k_pages.astype(jnp.float32) * ksp[..., None]
    vdeq = v_pages.astype(jnp.float32) * vsp[..., None]
    ref = paged_attention_reference(
        q, kdeq.astype(jnp.float32), vdeq.astype(jnp.float32), tables, lengths
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_batch_engine_int8_paged(tmp_path):
    """int8 KV now runs on the paged pool (capacity + prefix sharing keep
    working); greedy output matches the bf16-paged run on a tiny model."""
    from nfai_tpu.config import EngineConfig, SamplingParams
    from nfai_tpu.runtime.engine import InferenceEngine
    from nfai_tpu.runtime.scheduler import BatchEngine

    path = _tiny(tmp_path, "kv8b.gguf")
    outs = {}
    for kv in ("auto", "int8"):
        eng = InferenceEngine(
            path,
            EngineConfig(max_seq_len=64, dtype="float32", kv_dtype=kv,
                         paged_kv=True),
        )
        be = BatchEngine(eng, max_batch=2)
        assert be.paged
        if kv == "int8":
            assert be.cache.quantized and be.cache.ks is not None
        req = be.submit([1, 2, 3], SamplingParams(temperature=0.0,
                                                  max_new_tokens=6))
        be.start()
        outs[kv] = list(req.stream(timeout=120))
        be.close()
    assert len(outs["int8"]) == 6
    # tiny f32 model: int8 KV error is far below the argmax margin
    assert outs["int8"] == outs["auto"]


def test_flash_prefill_int8_parity():
    """int8 cache + in-kernel scales through the flash prefill kernel
    matches the dequantized einsum reference."""
    import jax.numpy as jnp

    from nfai_tpu.models import llama as lm
    from nfai_tpu.models.llama import quantize_kv, dequant_kv

    rng = np.random.default_rng(11)
    b, t, hq, hkv, d, s = 2, 64, 8, 4, 64, 256
    kvd = hkv * d
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((b, s, kvd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, s, kvd)), jnp.float32)
    positions = jnp.broadcast_to(
        jnp.arange(128, 128 + t, dtype=jnp.int32), (b, t)
    )
    kq, ks = quantize_kv(kc, hkv)  # [B,S,KVD] int8, [B,S,Hkv]
    vq, vs = quantize_kv(vc, hkv)
    ks_tm = ks.transpose(0, 2, 1)  # time-minor [B,Hkv,S]
    vs_tm = vs.transpose(0, 2, 1)
    old = lm.PREFILL_ATTN_IMPL
    lm.PREFILL_ATTN_IMPL = "flash"
    try:
        out = lm._cached_attention(
            q, kq, vq, positions, k_scales=ks_tm, v_scales=vs_tm
        )
    finally:
        lm.PREFILL_ATTN_IMPL = old
    ref = lm._cached_attention(
        q, dequant_kv(kq, ks_tm, jnp.float32),
        dequant_kv(vq, vs_tm, jnp.float32), positions
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
