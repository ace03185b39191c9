"""q8v3 cast-free 8-bit bit-decode container: pack/dequant/matmul parity
vs the plain int8 container (ops.qtensor.to_q8v3_stacked; the kernel runs
one dot per x-plane against the exact bf16 fold u0 = (hi−50)+lo = v/8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from nfai_tpu.ops.qmatmul import qmatmul, qmatmul_layered
from nfai_tpu.ops.qtensor import (
    QTensor,
    dequant_qtensor,
    q8v3_eligible,
    to_q8v3_stacked,
)


def make_q8(rng, k, n, group=32, with_mins=False, layers=0):
    lead = (layers,) if layers else ()
    qs = rng.integers(-128, 128, (*lead, k, n), dtype=np.int8)
    scales = (rng.random((*lead, k // group, n)) * 0.01).astype(np.float32)
    mins = (
        (rng.random((*lead, k // group, n)) * 0.05).astype(np.float32)
        if with_mins
        else None
    )
    return QTensor(
        jnp.asarray(qs), jnp.asarray(scales),
        jnp.asarray(mins) if mins is not None else None, "q8", k, n,
        group=group,
    )


@pytest.mark.parametrize("group,with_mins", [(32, False), (32, True), (16, True)])
def test_q8v3_dequant_matches_q8(group, with_mins, monkeypatch):
    # f32 scale storage isolates the packing math (bf16 default below)
    monkeypatch.setenv("NFAI_V3_SCALE_DTYPE", "f32")
    rng = np.random.default_rng(0)
    qt = make_q8(rng, 2048, 128, group=group, with_mins=with_mins)
    v3 = to_q8v3_stacked(qt)
    assert v3.kind == "q8v3"
    assert v3.qs.shape == (2048 // 4, 128)
    assert v3.scales.shape == (2048 // group, 128)
    assert (v3.mins is not None) == with_mins
    w8 = np.asarray(dequant_qtensor(qt, jnp.float32))
    wv = np.asarray(dequant_qtensor(v3, jnp.float32))
    # both decode the same integer grid; f32 rounding orders differ
    np.testing.assert_allclose(wv, w8, rtol=2e-6, atol=2e-6)


def test_q8v3_eligibility_gates():
    rng = np.random.default_rng(1)
    ok = make_q8(rng, 2048, 64)
    assert q8v3_eligible(ok)
    assert not q8v3_eligible(ok.replace(k=1024))  # K % 2048
    assert not q8v3_eligible(ok.replace(tp_mode="col"))
    assert not q8v3_eligible(ok.replace(group=8))
    assert not q8v3_eligible(ok.replace(kind="q4"))
    # expert stacks [L, E, K, N] stay untouched
    exps = ok.replace(qs=np.asarray(ok.qs)[None, None])
    assert not q8v3_eligible(exps)
    assert to_q8v3_stacked(exps) is exps


@pytest.mark.parametrize("group", [32, 16])
def test_q8v3_layered_kernel_parity(group, monkeypatch):
    monkeypatch.setenv("NFAI_V3_SCALE_DTYPE", "f32")
    rng = np.random.default_rng(2)
    L, k, n, b = 2, 2048, 512, 8
    qt = make_q8(rng, k, n, group=group, with_mins=True, layers=L)
    v3 = to_q8v3_stacked(qt)
    assert v3.kind == "q8v3" and v3.qs.ndim == 3
    x = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    for li in range(L):
        ref = np.asarray(
            x.astype(jnp.float32)
            @ dequant_qtensor(
                qt.replace(
                    qs=qt.qs[li], scales=qt.scales[li], mins=qt.mins[li]
                ),
                jnp.float32,
            )
        )
        got = np.asarray(
            qmatmul_layered(x, v3, jnp.int32(li)), np.float32
        )
        scale = np.maximum(np.abs(ref), 1.0)
        assert np.max(np.abs(got - ref) / scale) < 2e-2, li


def test_q8v3_2d_qmatmul_with_padding(monkeypatch):
    """The 2D (lm_head) container runs through qmatmul via the 1-layer
    stack view, including an N-padded physical layout."""
    monkeypatch.setenv("NFAI_V3_SCALE_DTYPE", "f32")
    from nfai_tpu.ops.qtensor import pad_qtensor_n

    rng = np.random.default_rng(3)
    qt = make_q8(rng, 2048, 384)  # logical n 384 -> padded 512
    padded = pad_qtensor_n(qt, 512)
    v3 = to_q8v3_stacked(padded)
    assert v3.kind == "q8v3" and v3.qs.shape[-1] == 512 and v3.n == 384
    x = jnp.asarray(rng.standard_normal((8, 2048)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    ref = np.asarray(
        x.astype(jnp.float32) @ dequant_qtensor(qt, jnp.float32)
    )
    got = np.asarray(qmatmul(x, v3), np.float32)
    assert got.shape == (8, 384)
    scale = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / scale) < 3e-2


def test_q8v3_full_model_decode(tmp_path, monkeypatch):
    """With NFAI_Q8V3=1, load_params converts eligible Q8_0 layer weights
    to q8v3; greedy decode matches the default plain-q8 run (same integer
    grid, bf16-identical kernels). The container is OPT-IN since r4: it
    lost its head-to-head on the 3B Q8 config (1127 vs 1217 tok/s) once
    the scale-expand dequant landed."""
    from nfai_tpu.config import EngineConfig, SamplingParams
    from nfai_tpu.gguf.constants import GGMLType
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.runtime.engine import InferenceEngine

    path = make_tiny_llama_gguf(
        tmp_path / "q8v3.gguf", hidden=2048, n_layers=2, n_heads=8,
        n_kv_heads=4, ffn_dim=2048, vocab_size=4096, quant=GGMLType.Q8_0,
        tied=False, seed=7,
    )
    monkeypatch.setenv("NFAI_Q8V3", "1")
    eng = InferenceEngine(path, EngineConfig(max_seq_len=64))
    assert eng.params["layers"]["wqkv"].kind == "q8v3"
    assert eng.params["layers"]["wo"].kind == "q8v3"
    assert eng.params["lm_head"].kind == "q8v3"
    out = list(
        eng.generate([2, 4, 6], SamplingParams(temperature=0.0,
                                               max_new_tokens=4))
    )
    assert len(out) == 4

    monkeypatch.setenv("NFAI_Q8V3", "0")
    eng2 = InferenceEngine(path, EngineConfig(max_seq_len=64))
    assert eng2.params["layers"]["wqkv"].kind == "q8"
    out2 = list(
        eng2.generate([2, 4, 6], SamplingParams(temperature=0.0,
                                                max_new_tokens=4))
    )
    assert out == out2


def test_q8v3_bf16_scale_default_error_bound():
    """bf16 effective-scale storage (the default) adds only bf16 rounding
    of the weight magnitudes — far below 8-bit quantization noise."""
    rng = np.random.default_rng(4)
    qt = make_q8(rng, 2048, 128, with_mins=True)
    v3 = to_q8v3_stacked(qt)
    assert v3.scales.dtype == jnp.bfloat16
    w8 = np.asarray(dequant_qtensor(qt, jnp.float32))
    wv = np.asarray(dequant_qtensor(v3, jnp.float32))
    # u0 is exact; only the stored 8s (≤ 0.08) and mins (≤ 0.05) round to
    # bf16 (half-ULP 2^-8 relative): err ≤ 16·0.08·2^-8 + 0.05·2^-8
    bound = 16 * 0.08 * 2.0**-8 + 0.05 * 2.0**-8 + 1e-6
    assert np.max(np.abs(wv - w8)) < bound
