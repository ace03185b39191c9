"""Block-quant codec tests: round-trip error bounds + hand-computed goldens.

The round-trip tests bound |decode(encode(x)) - x| by the format's step size;
the golden tests pin the exact bit layout (nibble order, 6-bit scale packing,
high-bit placement) against hand-assembled blocks so the decoders match ggml's
layouts independent of our encoders.
"""
import numpy as np
import pytest

from nfai_tpu.gguf import GGMLType, dequantize, quantize
from nfai_tpu.gguf.constants import GGML_BLOCK_LAYOUT


def _roundtrip(rng, t: GGMLType, n=2048):
    x = rng.standard_normal(n).astype(np.float32)
    enc = quantize(x, t)
    assert enc.dtype == np.uint8
    layout = GGML_BLOCK_LAYOUT[t]
    assert enc.size == (n // layout.block_size) * layout.type_size
    dec = dequantize(enc, n, t)
    return x, dec


def _max_block_range(x, t):
    """Per-block max-min (the scale-setting range) for error normalization."""
    bs = GGML_BLOCK_LAYOUT[t].block_size
    xb = x.reshape(-1, bs)
    return np.maximum(xb.max(1) - xb.min(1), 1e-8)


@pytest.mark.parametrize(
    "t,levels",
    [
        (GGMLType.Q8_0, 254),
        (GGMLType.Q4_0, 15),
        (GGMLType.Q4_1, 15),
        (GGMLType.Q5_0, 31),
        (GGMLType.Q5_1, 31),
    ],
)
def test_roundtrip_32_block(rng, t, levels):
    x, dec = _roundtrip(rng, t)
    step = _max_block_range(x, t) / levels
    err = np.abs((x - dec).reshape(-1, 32))
    # allow 1.1 steps: f16 scale rounding adds a little on top of the quant step
    assert (err <= 1.1 * step[:, None] + 1e-6).all()


@pytest.mark.parametrize(
    "t,rel_tol",
    [
        (GGMLType.Q2_K, 0.6),
        (GGMLType.Q3_K, 0.35),
        (GGMLType.Q4_K, 0.12),
        (GGMLType.Q5_K, 0.06),
        (GGMLType.Q6_K, 0.03),
    ],
)
def test_roundtrip_k_quants(rng, t, rel_tol):
    x = rng.standard_normal(4 * 256).astype(np.float32)
    enc = quantize(x, t)
    dec = dequantize(enc, x.size, t)
    rms = np.sqrt(np.mean((x - dec) ** 2)) / np.sqrt(np.mean(x**2))
    assert rms < rel_tol, f"{t.name}: relative RMS error {rms:.4f}"


def test_roundtrip_fp(rng):
    x = rng.standard_normal(256).astype(np.float32)
    assert np.array_equal(dequantize(quantize(x, GGMLType.F32), 256, GGMLType.F32), x)
    np.testing.assert_allclose(
        dequantize(quantize(x, GGMLType.F16), 256, GGMLType.F16), x, atol=1e-3
    )
    np.testing.assert_allclose(
        dequantize(quantize(x, GGMLType.BF16), 256, GGMLType.BF16), x, rtol=8e-3
    )


def test_bf16_round_nearest_even():
    # 1.0 + 2^-9 rounds down to 1.0; 1.0 + 3*2^-9 rounds up
    x = np.array([1.0 + 2.0**-9], dtype=np.float32)
    dec = dequantize(quantize(x, GGMLType.BF16), 1, GGMLType.BF16)
    assert dec[0] == 1.0


# ---------------------------------------------------------------------------
# golden bit-layout tests (hand-assembled blocks)


def test_q8_0_golden():
    d = np.float16(0.5)
    q = np.arange(-16, 16, dtype=np.int8)
    block = d.tobytes() + q.tobytes()
    dec = dequantize(np.frombuffer(block, np.uint8), 32, GGMLType.Q8_0)
    np.testing.assert_allclose(dec, 0.5 * q.astype(np.float32), rtol=1e-6)


def test_q4_0_golden_nibble_order():
    # low nibbles are elements 0..15, high nibbles are 16..31
    d = np.float16(2.0)
    qs = np.full(16, 0x30 | 0x01, np.uint8)  # lo=1 → elems 0..15; hi=3 → 16..31
    block = d.tobytes() + qs.tobytes()
    dec = dequantize(np.frombuffer(block, np.uint8), 32, GGMLType.Q4_0)
    np.testing.assert_allclose(dec[:16], 2.0 * (1 - 8))
    np.testing.assert_allclose(dec[16:], 2.0 * (3 - 8))


def test_q5_0_golden_high_bit():
    # qh bit j is the 5th bit of: elem j (j<16 via low nibble), elem 16+j-16...
    d = np.float16(1.0)
    qh = np.uint32(1 | (1 << 16))  # elem 0 and elem 16 get +16
    qs = np.zeros(16, np.uint8)
    block = d.tobytes() + qh.tobytes() + qs.tobytes()
    dec = dequantize(np.frombuffer(block, np.uint8), 32, GGMLType.Q5_0)
    expected = np.full(32, -16.0, np.float32)
    expected[0] = expected[16] = 0.0  # (0 | 1<<4) - 16
    np.testing.assert_allclose(dec, expected)


def test_q4_k_golden():
    # one super-block: d=1, dmin=0, scales: sc[j]=j+1, m[j]=0; qs all = j-th pattern
    d = np.float16(1.0).tobytes()
    dmin = np.float16(0.0).tobytes()
    sc = np.arange(1, 9, dtype=np.uint8)
    mi = np.zeros(8, np.uint8)
    from nfai_tpu.gguf.quants import _pack_kquant_scales, _unpack_kquant_scales

    packed = _pack_kquant_scales(sc[None], mi[None])[0]
    s, m = _unpack_kquant_scales(packed[None])
    np.testing.assert_array_equal(s[0], sc)
    np.testing.assert_array_equal(m[0], mi)
    qs = np.full(128, 0x21, np.uint8)  # lo=1 (even sub-blocks), hi=2 (odd)
    block = d + dmin + packed.tobytes() + qs.tobytes()
    dec = dequantize(np.frombuffer(block, np.uint8), 256, GGMLType.Q4_K)
    dec = dec.reshape(8, 32)
    for j in range(8):
        q = 1 if j % 2 == 0 else 2
        np.testing.assert_allclose(dec[j], float((j + 1) * q), err_msg=f"sub-block {j}")


def test_q6_k_golden():
    # ql low nibble=1 for elems 0..31 of each half; qh=0; scales[i]=i; d=0.25
    ql = np.zeros(128, np.uint8)
    ql[:32] = 0x01  # half 0, elems 0..31 (q1 low nibble)
    qh = np.zeros(64, np.uint8)
    scales = np.arange(16, dtype=np.int8)
    d = np.float16(0.25)
    block = ql.tobytes() + qh.tobytes() + scales.tobytes() + d.tobytes()
    dec = dequantize(np.frombuffer(block, np.uint8), 256, GGMLType.Q6_K)
    # elems 0..15: scale 0 → 0; elems 16..31: scale 1 → 0.25*1*(1-32)
    np.testing.assert_allclose(dec[:16], 0.0)
    np.testing.assert_allclose(dec[16:32], 0.25 * 1 * (1 - 32))
    # elems 32..47 use scale 2, q=0-32
    np.testing.assert_allclose(dec[32:48], 0.25 * 2 * (0 - 32))


def test_unsupported_type_raises():
    with pytest.raises(NotImplementedError):
        dequantize(np.zeros(66, np.uint8), 256, GGMLType.IQ2_XXS)
