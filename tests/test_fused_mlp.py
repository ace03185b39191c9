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
    # f=768 divides only the 4*64 step width -> eligible at tfb=64
    gu3, dn3 = _pair(rng, f=768)
    from nfai_tpu.ops.qtensor import mlp_tfb_for

    assert mlp_tfb_for(gu3, dn3) == 64
    # an ffn dim with no 4*tfb divisor must be left alone
    gu4, dn4 = _pair(rng, f=704)  # 704 % 256 != 0
    assert not mlp_eligible(gu4, dn4)
    g4, d4 = to_v3_mlp_stacked(gu4, dn4)
    assert g4.kind == "q4" and d4.kind == "q4"


def test_mlp_prefill_parity():
    """mlp_prefill (dequant-once prefill path) matches the fused kernel
    within bf16 rounding on the same per-layer container slices."""
    from nfai_tpu.ops.fused_mlp import mlp_prefill

    rng = np.random.default_rng(7)
    gu, dn = _pair(rng)
    gum, dnm = to_v3_mlp_stacked(gu, dn)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.bfloat16)
    for li in range(L):
        yk = np.asarray(fused_mlp_layered(x, gum, dnm, jnp.int32(li)), np.float32)
        yp = np.asarray(
            mlp_prefill(
                x,
                gum.replace(qs=gum.qs[li], scales=gum.scales[li]),
                dnm.replace(qs=dnm.qs[li], scales=dnm.scales[li]),
            ),
            np.float32,
        )
        rel = np.abs(yk - yp).max() / (np.abs(yk).max() + 1e-9)
        assert rel < 5e-2, (li, rel)


def test_mlp_prefill_leading_dims_and_gelu():
    from nfai_tpu.ops.fused_mlp import mlp_prefill

    rng = np.random.default_rng(8)
    gu, dn = _pair(rng)
    gum, dnm = to_v3_mlp_stacked(gu, dn)
    gs = gum.replace(qs=gum.qs[0], scales=gum.scales[0])
    ds = dnm.replace(qs=dnm.qs[0], scales=dnm.scales[0])
    x = jnp.asarray(rng.standard_normal((2, 3, K)), jnp.bfloat16)
    y = mlp_prefill(x, gs, ds, act="gelu")
    assert y.shape == (2, 3, H)
    # reference: dense dequant through the documented un-permuting path
    wg = np.asarray(dequant_qtensor(gs, jnp.float32))
    wd = np.asarray(dequant_qtensor(ds, jnp.float32))
    xb = np.asarray(x, np.float32).reshape(-1, K)
    g = xb @ wg
    import jax.nn

    a = np.asarray(jax.nn.gelu(g[:, :F], approximate=True)) * g[:, F:]
    ref = (a @ wd).reshape(2, 3, H)
    rel = np.abs(np.asarray(y, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-2, rel


def test_mlp_eligible_vmem_guard():
    """Shapes whose per-grid-step operand blocks exceed the kernel VMEM
    budget step down to a smaller grid width (tfb) or become ineligible
    (two-kernel fallback) instead of failing at Mosaic compile.
    Metadata-only check: no giant arrays materialized."""
    from nfai_tpu.ops.fused_mlp import _pick_bt, mlp_weight_block_bytes

    # 8B-class shapes [K=4096, F=14336, H=4096]: tfb=256 blocks are
    # ~15.7 MB double-buffered (over VMEM); tfb=128 fits
    assert _pick_bt(8, 4096, 4096, mlp_weight_block_bytes(4096, 4096, 2, 256)) is None
    assert _pick_bt(8, 4096, 4096, mlp_weight_block_bytes(4096, 4096, 2, 128)) is not None
    # an absurdly wide model overflows at every tfb
    for tfb in (256, 128, 64):
        wb = mlp_weight_block_bytes(16384, 65536, 4, tfb)
        assert _pick_bt(8, 16384, 65536, wb) is None


def test_fused_mlp_dynamic_bt_still_tiles():
    """Row counts above the chosen bt pad and tile correctly."""
    rng = np.random.default_rng(9)
    gu, dn = _pair(rng)
    gum, dnm = to_v3_mlp_stacked(gu, dn)
    x = jnp.asarray(rng.standard_normal((130, K)), jnp.bfloat16)
    y = fused_mlp_layered(x, gum, dnm, jnp.int32(0))
    assert y.shape == (130, H)
    y8 = fused_mlp_layered(x[:8], gum, dnm, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(y[:8], np.float32), np.asarray(y8, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_adaptive_tfb_parity():
    """A pair that packs at tfb=64 (F=768) produces correct results through
    both the kernel and the prefill path."""
    from nfai_tpu.ops.fused_mlp import mlp_prefill
    from nfai_tpu.ops.qtensor import mlp_tfb_for

    rng = np.random.default_rng(11)
    gu, dn = _pair(rng, f=768)
    assert mlp_tfb_for(gu, dn) == 64
    gum, dnm = to_v3_mlp_stacked(gu, dn)
    assert gum.tfb == dnm.tfb == 64
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.bfloat16)
    wg = dequant_qtensor(_slice(gu, 0), jnp.float32)
    wd = dequant_qtensor(_slice(dn, 0), jnp.float32)
    y = x.astype(jnp.float32) @ wg
    a = jax.nn.silu(y[:, :768]) * y[:, 768:]
    ref = np.asarray(a @ wd, np.float32)
    got_k = np.asarray(fused_mlp_layered(x, gum, dnm, jnp.int32(0)), np.float32)
    got_p = np.asarray(
        mlp_prefill(x, _slice(gum, 0), _slice(dnm, 0)), np.float32
    )
    for got in (got_k, got_p):
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 5e-2, rel
    # round-trip dequant with the non-default tfb is exact in f32 mode
