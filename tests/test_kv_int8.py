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


def test_batch_engine_int8_falls_back_dense(tmp_path):
    from nfai_tpu.config import EngineConfig, SamplingParams
    from nfai_tpu.runtime.engine import InferenceEngine
    from nfai_tpu.runtime.scheduler import BatchEngine

    path = _tiny(tmp_path, "kv8b.gguf")
    eng = InferenceEngine(
        path,
        EngineConfig(max_seq_len=64, dtype="float32", kv_dtype="int8",
                     paged_kv=True),
    )
    be = BatchEngine(eng, max_batch=2)
    assert not be.paged  # int8 forces dense lanes
    req = be.submit([1, 2, 3], SamplingParams(temperature=0.0,
                                              max_new_tokens=6))
    be.start()
    toks = list(req.stream(timeout=120))
    assert len(toks) == 6
    be.close()
