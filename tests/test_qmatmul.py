"""Quantized matmul tests (SURVEY.md §4 "Kernel parity"):
- QTensor packing decodes identically to the GGUF byte decoders
- Pallas kernels (interpret mode on CPU) match the dequant reference
- mins correction algebra (affine kinds)
- embedding dequant-gather
"""
import numpy as np
import pytest

import jax.numpy as jnp

from nfai_tpu.gguf import GGMLType, dequantize, quantize
from nfai_tpu.ops.qmatmul import mins_correction, qmatmul
from nfai_tpu.ops.qtensor import (
    QTensor,
    dequant_gather,
    dequant_qtensor,
    pack_gguf_tensor,
)

KINDS = [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K,
         GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K]


def _make_qt(rng, t: GGMLType, n_out=128, k_in=256):
    w = rng.standard_normal((n_out, k_in)).astype(np.float32) * 0.1
    raw = quantize(w, t)
    qt = pack_gguf_tensor(raw, t, (n_out, k_in))
    # ground truth straight from the GGUF byte decoder
    w_ref = dequantize(raw, n_out * k_in, t).reshape(n_out, k_in)
    return qt, w_ref


@pytest.mark.parametrize("t", KINDS)
def test_pack_matches_gguf_decoder(rng, t):
    qt, w_ref = _make_qt(rng, t)
    w_dev = np.asarray(dequant_qtensor(qt, jnp.float32))  # [K, N]
    np.testing.assert_allclose(w_dev, w_ref.T, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("t", KINDS)
def test_qmatmul_kernel_matches_reference(rng, t):
    qt, w_ref = _make_qt(rng, t, n_out=256, k_in=512)
    x = (rng.standard_normal((8, 512)) * 0.5).astype(np.float32)
    y_kernel = np.asarray(qmatmul(jnp.asarray(x), qt, use_kernel=True), np.float32)
    y_ref = x @ w_ref.T
    # bf16 matmul tolerance
    scale = np.abs(y_ref).max() + 1e-6
    assert np.abs(y_kernel - y_ref).max() / scale < 0.02, (
        np.abs(y_kernel - y_ref).max(),
        scale,
    )


@pytest.mark.parametrize("t", [GGMLType.Q6_K, GGMLType.Q2_K])
def test_group16_scale_granularity(rng, t):
    qt, _ = _make_qt(rng, t)
    assert qt.group == 16
    assert qt.scales.shape[0] == 256 // 16


def test_qmatmul_batched_leading_dims(rng):
    qt, w_ref = _make_qt(rng, GGMLType.Q8_0, n_out=128, k_in=256)
    x = (rng.standard_normal((2, 3, 256))).astype(np.float32)
    y = qmatmul(jnp.asarray(x), qt)
    assert y.shape == (2, 3, 128)
    y_ref = x.reshape(-1, 256) @ w_ref.T
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(-1, 128), y_ref, rtol=0.05, atol=0.05
    )


def test_mins_correction_algebra(rng):
    # y = sum_k x_k * (s*q - m) must equal kernel(s*q part) - bsums@mins
    qt, w_ref = _make_qt(rng, GGMLType.Q4_K, n_out=128, k_in=256)
    assert qt.mins is not None
    x = rng.standard_normal((4, 256)).astype(np.float32)
    y_full = np.asarray(qmatmul(jnp.asarray(x), qt, use_kernel=False), np.float32)
    corr = np.asarray(mins_correction(jnp.asarray(x), qt.mins))
    mins_dense = np.repeat(np.asarray(qt.mins), 32, axis=0)  # [K, N]
    corr_ref = x @ mins_dense
    np.testing.assert_allclose(corr, corr_ref, rtol=1e-4, atol=1e-4)
    y_ref = x @ w_ref.T
    assert np.abs(y_full - y_ref).max() < 0.05 * (np.abs(y_ref).max() + 1e-6)


@pytest.mark.parametrize("t", [GGMLType.Q8_0, GGMLType.Q4_K])
def test_dequant_gather_matches_rows(rng, t):
    # head-layout table [K=hidden, N=vocab]; embedding row v = column v
    qt, w_ref = _make_qt(rng, t, n_out=96, k_in=256)  # vocab=96, hidden=256
    ids = jnp.asarray([[0, 5, 95], [7, 7, 1]])
    rows = np.asarray(dequant_gather(qt, ids, jnp.float32))
    assert rows.shape == (2, 3, 256)
    np.testing.assert_allclose(rows[0, 1], w_ref[5], rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(rows[1, 2], w_ref[1], rtol=1e-2, atol=1e-3)


def test_unsupported_kind_raises(rng):
    w = rng.standard_normal((8, 256)).astype(np.float32)
    raw = quantize(w, GGMLType.Q5_0)
    with pytest.raises(KeyError):
        pack_gguf_tensor(raw, GGMLType.Q5_0, (8, 256))


def test_padded_qtensor_matches_unpadded():
    """N-padded containers (pad_qtensor_n, used for the 128k LM head) must
    produce identical logical outputs through both the kernel and fallback
    paths."""
    import numpy as np

    from nfai_tpu.ops.qmatmul import qmatmul
    from nfai_tpu.ops.qtensor import QTensor, dequant_qtensor, pad_qtensor_n

    rng = np.random.default_rng(0)
    k, n = 512, 384  # n % 512 != 0 -> pads to 512
    qs = rng.integers(-128, 128, (k // 2, n), dtype=np.int8)
    scales = (rng.random((k // 32, n)) * 0.01).astype(np.float32)
    mins = (rng.random((k // 32, n)) * 0.01).astype(np.float32)
    qt = QTensor(jnp.asarray(qs), jnp.asarray(scales), jnp.asarray(mins),
                 "q4", k, n)
    padded = pad_qtensor_n(qt.replace(qs=qs, scales=scales, mins=mins), 512)
    assert padded.qs.shape[-1] == 512 and padded.n == n
    padded = padded.replace(
        qs=jnp.asarray(padded.qs),
        scales=jnp.asarray(padded.scales),
        mins=jnp.asarray(padded.mins),
    )

    x = jnp.asarray(rng.standard_normal((4, k)), jnp.bfloat16)
    ref = np.asarray(qmatmul(x, qt, use_kernel=False), np.float32)
    scale = np.abs(ref).max()
    for use_kernel in (False, True):
        out = np.asarray(qmatmul(x, padded, use_kernel=use_kernel), np.float32)
        assert out.shape == (4, n)
        # bf16 output has ~2^-8 ulps: one ulp at max|y| is ~4e-3 relative;
        # allow a couple (different tile reduction orders round differently)
        assert np.abs(out - ref).max() / scale < 1e-2
    # dense dequant view also returns the logical width
    assert dequant_qtensor(padded).shape == (k, n)
