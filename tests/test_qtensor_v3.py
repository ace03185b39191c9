"""v3 bit-decode container: pack/dequant/matmul parity vs the v2 nibble
container (exact — both decode the same integer grid)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from nfai_tpu.gguf.constants import GGMLType
from nfai_tpu.ops.qmatmul import qmatmul
from nfai_tpu.ops.qtensor import (
    QTensor,
    _pack_v3_words,
    dequant_qtensor,
    to_v3,
)


def make_v2(rng, k, n, with_mins=True):
    qs = rng.integers(-128, 128, (k // 2, n), dtype=np.int8)
    scales = (rng.random((k // 32, n), dtype=np.float32) * 0.01).astype(
        np.float32
    )
    mins = (
        (rng.random((k // 32, n), dtype=np.float32) * 0.05).astype(np.float32)
        if with_mins
        else None
    )
    return QTensor(
        jnp.asarray(qs), jnp.asarray(scales),
        jnp.asarray(mins) if mins is not None else None, "q4", k, n,
    )


def test_pack_v3_words_layout():
    rng = np.random.default_rng(0)
    k, n = 16, 4
    q = rng.integers(0, 16, (k, n), dtype=np.uint8)
    w = _pack_v3_words(q).view(np.uint32)
    assert w.shape == (2, 4)
    # plane p, row r -> word row r//2, bits (r%2*2 + byte_pair)*8 + nib_shift
    kq = k // 4
    for p, (bp, ns) in enumerate([(0, 0), (1, 0), (0, 4), (1, 4)]):
        for r in range(kq):
            got = (w[r // 2] >> ((r % 2 * 2 + bp) * 8 + ns)) & 0xF
            assert np.array_equal(got, q[p * kq + r]), (p, r)


@pytest.mark.parametrize("with_mins", [True, False])
def test_v3_dequant_matches_v2(with_mins, monkeypatch):
    # f32 scale storage isolates the packing math (bf16 default tested below)
    monkeypatch.setenv("NFAI_V3_SCALE_DTYPE", "f32")
    rng = np.random.default_rng(1)
    qt = make_v2(rng, 2048, 256, with_mins)
    v3 = to_v3(qt)
    assert v3.kind == "q4v3"
    assert v3.scales.dtype == jnp.float32
    w2 = np.asarray(dequant_qtensor(qt, jnp.float32))
    w3 = np.asarray(dequant_qtensor(v3, jnp.float32))
    # both expand the same integers; bf16 plane decode is exact for
    # (2 + q/8) so the only difference is f32 rounding in scale folds
    np.testing.assert_allclose(w3, w2, rtol=2e-3, atol=2e-6)


def test_v3_bf16_scale_default_error_bound():
    """v3 containers store scales/mins bf16 by default; the added error vs
    f32 storage must stay within bf16 rounding of the weight magnitudes —
    far below 4-bit quantization noise (the kernels multiply scales in bf16
    regardless, so only the rank-1 mins correction gains from f32)."""
    rng = np.random.default_rng(11)
    qt = make_v2(rng, 2048, 256, True)
    v3 = to_v3(qt)
    assert v3.scales.dtype == jnp.bfloat16
    w2 = np.asarray(dequant_qtensor(qt, jnp.float32))
    w3 = np.asarray(dequant_qtensor(v3, jnp.float32))
    # bf16 has 8 mantissa bits -> each of the two v3 terms
    # (scale*(2+q/8), mins) carries <= 2^-9 relative rounding; the error
    # bound is relative to the TERM magnitudes (which partially cancel in
    # the weight value), not the weight magnitude
    term_mag = (
        np.abs(np.asarray(v3.scales, np.float32)).max() * 3.875
        + np.abs(np.asarray(v3.mins, np.float32)).max()
    )
    assert np.abs(w3 - w2).max() < 2 ** -7 * term_mag


def test_v3_matmul_matches_v2():
    rng = np.random.default_rng(2)
    qt = make_v2(rng, 2048, 512)
    v3 = to_v3(qt)
    x = jnp.asarray(rng.standard_normal((8, 2048)), jnp.bfloat16)
    y2 = np.asarray(qmatmul(x, qt, use_kernel=False), np.float32)
    y3k = np.asarray(qmatmul(x, v3, use_kernel=True), np.float32)
    y3f = np.asarray(qmatmul(x, v3, use_kernel=False), np.float32)
    scale = np.abs(y2).max()
    assert np.abs(y3f - y2).max() / scale < 2e-2
    assert np.abs(y3k - y3f).max() / scale < 2e-2


def test_to_v3_guards():
    rng = np.random.default_rng(3)
    # odd K: unchanged
    qt = make_v2(rng, 512, 64)
    assert to_v3(qt) is qt
    # sectioned containers: unchanged
    qt2 = make_v2(rng, 2048, 64).replace(sections=2)
    assert to_v3(qt2) is qt2
    # q8: unchanged
    q8 = QTensor(
        jnp.zeros((256, 64), jnp.int8), jnp.ones((8, 64), jnp.float32),
        None, "q8", 256, 64,
    )
    assert to_v3(q8) is q8


def test_v3_in_model_logits(tmp_path):
    """Untied quantized model end-to-end: load_params repacks the head to
    v3; logits must match a v2-head run."""
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.runtime.engine import InferenceEngine
    from nfai_tpu.config import EngineConfig

    # hidden must be >= 2048 for the v3 repack guard; use a 1-layer model
    path = make_tiny_llama_gguf(
        tmp_path / "v3.gguf", hidden=2048, n_layers=1, n_heads=8,
        n_kv_heads=4, ffn_dim=256, vocab_size=32768, quant=GGMLType.Q4_K, tied=False, seed=9,
    )
    eng = InferenceEngine(path, EngineConfig(max_seq_len=64))
    assert eng.params["lm_head"].kind == "q4v3"
    from nfai_tpu.config import SamplingParams

    out = list(
        eng.generate([3, 5, 7], SamplingParams(temperature=0.0,
                                               max_new_tokens=4))
    )
    assert len(out) == 4


def test_v3_stacked_layered_matmul():
    """to_v3_stacked + the layered v3 kernel == the v2 layered path."""
    from nfai_tpu.ops.qmatmul import qmatmul_layered
    from nfai_tpu.ops.qtensor import to_v3_stacked

    rng = np.random.default_rng(5)
    L, K, N = 3, 2048, 1024
    qs = rng.integers(-128, 128, (L, K // 2, N), dtype=np.int8)
    sc = (rng.random((L, K // 32, N)) * 0.01).astype(np.float32)
    mn = (rng.random((L, K // 32, N)) * 0.05).astype(np.float32)
    qt = QTensor(jnp.asarray(qs), jnp.asarray(sc), jnp.asarray(mn),
                 "q4", K, N)
    v3 = to_v3_stacked(qt)
    assert v3.kind == "q4v3" and v3.qs.shape == (L, K // 8, N)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((8, K)),
                    jnp.bfloat16)
    for layer in (0, 2):
        y2 = np.asarray(
            qmatmul_layered(x, qt, jnp.int32(layer)), np.float32
        )
        y3 = np.asarray(
            qmatmul_layered(x, v3, jnp.int32(layer)), np.float32
        )
        y3f = np.asarray(
            qmatmul_layered(x, v3, jnp.int32(layer), use_kernel=False),
            np.float32,
        )
        scale = np.abs(y2).max()
        assert np.abs(y3 - y2).max() / scale < 2e-2, layer
        assert np.abs(y3f - y2).max() / scale < 2e-2, layer


def test_v3_stacked_guards():
    from nfai_tpu.ops.qtensor import to_v3_stacked

    rng = np.random.default_rng(7)
    # no mins -> unchanged
    qt = QTensor(
        jnp.asarray(rng.integers(-128, 128, (2, 1024, 256), np.int8)),
        jnp.ones((2, 64, 256), jnp.float32), None, "q4", 2048, 256,
    )
    assert to_v3_stacked(qt) is qt
    # K not a multiple of 2048 -> unchanged
    qt2 = QTensor(
        jnp.asarray(rng.integers(-128, 128, (2, 512, 256), np.int8)),
        jnp.ones((2, 32, 256), jnp.float32),
        jnp.ones((2, 32, 256), jnp.float32), "q4", 1024, 256,
    )
    assert to_v3_stacked(qt2) is qt2


def test_v3_full_model_decode(tmp_path):
    """load_params converts eligible layer weights; decode logits match a
    run with conversion disabled (same integer grid)."""
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.runtime.engine import InferenceEngine
    from nfai_tpu.config import EngineConfig, SamplingParams

    path = make_tiny_llama_gguf(
        tmp_path / "v3s.gguf", hidden=2048, n_layers=2, n_heads=8,
        n_kv_heads=4, ffn_dim=2048, vocab_size=4096, quant=GGMLType.Q4_K,
        tied=False, seed=13,
    )
    eng = InferenceEngine(path, EngineConfig(max_seq_len=64))
    # the gate_up/down pair converts further to the fused-MLP containers
    # (ops.fused_mlp); other layer weights go to the v3 bit-decode container
    assert eng.params["layers"]["w_gate_up"].kind == "q4mlpg"
    assert eng.params["layers"]["w_down"].kind == "q4mlpd"
    assert eng.params["layers"]["wqkv"].kind in ("q4v3", "q4v3m")
    out = list(
        eng.generate([2, 4, 6], SamplingParams(temperature=0.0,
                                               max_new_tokens=4))
    )
    assert len(out) == 4

    # same model with the fused-MLP conversion disabled: the two kernel
    # paths share the integer grid but not f32 reduction order (and the
    # XLA:CPU backend may keep the scale*weight product in higher precision
    # depending on fusion), so the check is LOGIT closeness, not exact
    # greedy tokens — a corrupted container shows up as O(1) relative
    # error (the r4 pltpu.repeat bug measured rel 0.6), bf16 path
    # divergence as a few percent
    import os

    import numpy as np

    from nfai_tpu.models import KVCache, forward, logits_for

    os.environ["NFAI_FUSED_MLP"] = "0"
    try:
        eng2 = InferenceEngine(path, EngineConfig(max_seq_len=64))
        assert eng2.params["layers"]["w_gate_up"].kind == "q4v3"
    finally:
        del os.environ["NFAI_FUSED_MLP"]

    toks = jnp.asarray([[2, 4, 6]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)

    def logits(e):
        cache = KVCache.zeros(e.model_cfg, 1, 16, jnp.bfloat16)
        h, _ = forward(e.params, e.model_cfg, toks, pos, cache)
        return np.asarray(logits_for(e.params, h[:, -1]), np.float32)

    a, b = logits(eng), logits(eng2)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    assert rel < 8e-2, rel
    assert a.argmax() == b.argmax()
