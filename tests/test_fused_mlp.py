"""Fused one-kernel MLP (ops.fused_mlp + the permuted v3 containers).

Covers: container conversion round-trip (exact), kernel parity vs the
dense-dequant reference (interpret mode on CPU), the batch-tiled big-b
path (prefill shapes, incl. row padding), and eligibility gating.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfai_tpu.ops.fused_mlp import fused_mlp, fused_mlp_layered
from nfai_tpu.ops.qtensor import (
    QTensor,
    dequant_qtensor,
    mlp_eligible,
    to_v3_mlp_stacked,
)

L, K, F, H = 2, 1024, 1024, 256


def _pair(rng, l=L, k=K, f=F, h=H):
    def qt(k_, n_):
        qs = jnp.asarray(
            rng.integers(-128, 128, (l, k_ // 2, n_), np.int64).astype(np.int8)
        )
        sc = jnp.asarray((rng.random((l, k_ // 32, n_)) * 0.01).astype(np.float32))
        mn = jnp.asarray((rng.random((l, k_ // 32, n_)) * 0.02).astype(np.float32))
        return QTensor(qs, sc, mn, "q4", k_, n_)

    return qt(k, 2 * f), qt(f, h)


def _slice(qt, i):
    return qt.replace(
        qs=qt.qs[i], scales=qt.scales[i],
        mins=None if qt.mins is None else qt.mins[i],
    )


def test_conversion_roundtrip_exact(monkeypatch):
    # f32 scale storage isolates the permutation/packing math (the bf16
    # default's rounding is bounded in test_qtensor_v3)
    monkeypatch.setenv("NFAI_V3_SCALE_DTYPE", "f32")
    rng = np.random.default_rng(0)
    gu, dn = _pair(rng)
    gum, dnm = to_v3_mlp_stacked(gu, dn)
    assert gum.kind == "q4mlpg" and dnm.kind == "q4mlpd"
    for orig, conv in ((gu, gum), (dn, dnm)):
        for i in range(L):
            a = np.asarray(dequant_qtensor(_slice(orig, i), jnp.float32))
            b = np.asarray(dequant_qtensor(_slice(conv, i), jnp.float32))
            np.testing.assert_allclose(a, b, atol=1e-6)


def test_fused_kernel_parity():
    rng = np.random.default_rng(1)
    gu, dn = _pair(rng)
    gum, dnm = to_v3_mlp_stacked(gu, dn)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.bfloat16)
    for li in range(L):
        wg = dequant_qtensor(_slice(gu, li), jnp.float32)
        wd = dequant_qtensor(_slice(dn, li), jnp.float32)
        y = x.astype(jnp.float32) @ wg
        a = jax.nn.silu(y[:, :F]) * y[:, F:]
        ref = np.asarray(a @ wd, np.float32)
        got = np.asarray(fused_mlp_layered(x, gum, dnm, jnp.int32(li)), np.float32)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 5e-2, (li, rel)


def test_fused_kernel_gelu_and_leading_dims():
    rng = np.random.default_rng(2)
    gu, dn = _pair(rng)
    gum, dnm = to_v3_mlp_stacked(gu, dn)
    x = jnp.asarray(rng.standard_normal((2, 3, K)), jnp.bfloat16)
    wg = dequant_qtensor(_slice(gu, 0), jnp.float32)
    wd = dequant_qtensor(_slice(dn, 0), jnp.float32)
    y = x.astype(jnp.float32) @ wg
    a = jax.nn.gelu(y[..., :F], approximate=True) * y[..., F:]
    ref = np.asarray(a @ wd, np.float32)
    got = np.asarray(
        fused_mlp_layered(x, gum, dnm, jnp.int32(0), act="gelu"), np.float32
    )
    assert got.shape == (2, 3, H)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-2, rel


def test_big_batch_tiling_and_padding():
    # rows > 128 exercise the (nb, nj) grid; 130 exercises row padding
    rng = np.random.default_rng(3)
    gu, dn = _pair(rng)
    gum, dnm = to_v3_mlp_stacked(gu, dn)
    x = jnp.asarray(rng.standard_normal((130, K)), jnp.bfloat16)
    wg = dequant_qtensor(_slice(gu, 1), jnp.float32)
    wd = dequant_qtensor(_slice(dn, 1), jnp.float32)
    y = x.astype(jnp.float32) @ wg
    a = jax.nn.silu(y[:, :F]) * y[:, F:]
    ref = np.asarray(a @ wd, np.float32)
    got = np.asarray(fused_mlp_layered(x, gum, dnm, jnp.int32(1)), np.float32)
    assert got.shape == (130, H)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-2, rel


def test_sliced_single_layer_wrapper():
    rng = np.random.default_rng(4)
    gu, dn = _pair(rng)
    gum, dnm = to_v3_mlp_stacked(gu, dn)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.bfloat16)
    full = fused_mlp_layered(x, gum, dnm, jnp.int32(1))
    single = fused_mlp(x, _slice(gum, 1), _slice(dnm, 1))
    np.testing.assert_allclose(
        np.asarray(full, np.float32), np.asarray(single, np.float32),
        atol=1e-3, rtol=1e-3,
    )


def test_eligibility_gating():
    rng = np.random.default_rng(5)
    gu, dn = _pair(rng)
    # TP-marked pair must be left alone
    g2, d2 = to_v3_mlp_stacked(gu.replace(tp_mode="col"), dn)
    assert g2.kind == "q4" and d2.kind == "q4"
    # odd ffn dim (not a multiple of 4*MLP_TFB) must be left alone
    gu3, dn3 = _pair(rng, f=768)
    assert not mlp_eligible(gu3, dn3)
    g3, d3 = to_v3_mlp_stacked(gu3, dn3)
    assert g3.kind == "q4" and d3.kind == "q4"
