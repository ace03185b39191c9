"""Round-2 correctness fixes (ADVICE.md):

- rope_freqs.weight holds llama.cpp frequency *divisors*, not inverse
  frequencies (theta = pos * inv_freq / factors);
- mixed quant kinds across layers (Q4_K_M's Q6_K/Q4_K mix) load via lossless
  container promotion instead of failing;
- per-request top_k is applied exactly within the static sampling window.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfai_tpu.gguf import GGMLType, GGUFFile
from nfai_tpu.models.llama import LlamaConfig, load_params
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.ops.rope import compute_inv_freq


def test_rope_freqs_tensor_is_divisor_table(tmp_path):
    """A llama-3.1-style GGUF carries freq_factors; the loaded inv_freq must
    equal base_inv_freq / factors == the llama3-scaling formula."""
    head_dim, base = 64, 500000.0
    llama3 = compute_inv_freq(
        head_dim, base, "llama3",
        scaling_factor=8.0, low_freq_factor=1.0, high_freq_factor=4.0,
        original_context_length=8192,
    )
    base_inv = compute_inv_freq(head_dim, base)
    factors = (base_inv / llama3).astype(np.float32)  # what convert_hf writes
    assert factors.max() > 1.5  # genuinely not an inv_freq table (~1..8)

    path = make_tiny_llama_gguf(
        tmp_path / "m.gguf", hidden=256, n_heads=4, n_kv_heads=2,
        rope_base=base, rope_freqs=factors,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        params = load_params(g, cfg, device_put=False)
    np.testing.assert_allclose(
        np.asarray(params["inv_freq"]), llama3, rtol=1e-6
    )


@pytest.fixture(scope="module")
def mixed_quant_gguf(tmp_path_factory):
    """ffn_down quantized Q6_K on layer 0 but Q4_K on layer 1 — the Q4_K_M
    use_more_bits pattern the loader must survive."""
    d = tmp_path_factory.mktemp("mixedq")
    return make_tiny_llama_gguf(
        d / "m.gguf", hidden=256, ffn_dim=512, n_heads=4, n_kv_heads=2,
        n_layers=2, quant=GGMLType.Q4_K,
        quant_overrides={"blk.0.ffn_down.weight": GGMLType.Q6_K},
    )


def test_mixed_quant_kinds_load_and_match_dense(mixed_quant_gguf):
    with GGUFFile.open(mixed_quant_gguf) as g:
        cfg = LlamaConfig.from_gguf(g)
        qparams = load_params(g, cfg, quantized="auto")
        dparams = load_params(g, cfg, quantized=False, dtype=jnp.float32)
    from nfai_tpu.ops.qtensor import QTensor, dequant_qtensor

    qd = qparams["layers"]["w_down"]
    assert isinstance(qd, QTensor) and qd.kind == "q8"
    # stacked [L, ...] QTensor dequantizes layer-wise to the dense weights
    for layer in range(cfg.n_layers):
        sl = QTensor(qd.qs[layer], qd.scales[layer],
                     None if qd.mins is None else qd.mins[layer],
                     qd.kind, qd.k, qd.n, qd.group)
        got = np.asarray(dequant_qtensor(sl, jnp.float32))
        want = np.asarray(dparams["layers"]["w_down"][layer])
        np.testing.assert_allclose(got, want, atol=0.02, rtol=0.1)


def test_promote_qtensor_bit_exact():
    """q4 -> q8 container promotion must be lossless (same dequant)."""
    from nfai_tpu.gguf.quants import quantize as gguf_quantize
    from nfai_tpu.ops.qtensor import (
        dequant_qtensor, pack_gguf_tensor, promote_qtensor,
    )

    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 256), dtype=np.float32)
    raw = gguf_quantize(w, GGMLType.Q4_K)
    qt = pack_gguf_tensor(raw, GGMLType.Q4_K, w.shape, device_put=False)
    assert qt.kind == "q4"
    promoted = promote_qtensor(qt, "q8", 16, with_mins=True)
    assert promoted.kind == "q8" and promoted.group == 16
    a = np.asarray(dequant_qtensor(qt, jnp.float32))
    b = np.asarray(dequant_qtensor(promoted, jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_per_row_top_k_masks_exactly():
    from nfai_tpu.ops.sampling import sample_logits

    v = 128
    logits = jnp.broadcast_to(jnp.arange(v, dtype=jnp.float32), (4, v))
    key = jax.random.PRNGKey(0)
    # rows with top_k_rows=1 must always pick the argmax even at high temp
    rows = jnp.asarray([1, 1, 64, 1], jnp.int32)
    for trial in range(8):
        out = np.asarray(sample_logits(
            logits, jax.random.fold_in(key, trial),
            temperature=5.0, top_k=64, top_p=1.0, top_k_rows=rows,
        ))
        assert out[0] == v - 1 and out[1] == v - 1 and out[3] == v - 1
    # a wide row does explore beyond the argmax at high temperature
    seen = {
        int(np.asarray(sample_logits(
            logits, jax.random.fold_in(key, 100 + t),
            temperature=5.0, top_k=64, top_p=1.0, top_k_rows=rows,
        ))[2])
        for t in range(16)
    }
    assert len(seen) > 1
