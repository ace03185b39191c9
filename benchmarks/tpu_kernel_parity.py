"""Per-kernel real-TPU parity: layered attention, layered matmuls, cache write.

Isolates each Pallas kernel of the fused decode path against its jnp
reference on the actual chip (no interpret mode). Run when tpu_parity.py
fails to localize which kernel miscompiles.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np


def report(name, got, want, tol=2e-2):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = np.abs(want).max() + 1e-6
    dev = np.abs(got - want).max() / scale
    print(f"{name}: rel dev {dev:.5f} {'OK' if dev < tol else 'FAIL'}",
          flush=True)
    return dev < tol


def main():
    print("device:", jax.devices()[0], flush=True)
    ok = True
    rng = np.random.default_rng(0)

    # --- layered decode attention ------------------------------------------
    from nfai_tpu.ops.fused_decode import (
        layered_decode_attention,
        layered_decode_reference,
        write_all_layers,
        write_cache_rows,
    )

    l, hkv, r, b, s, d = 3, 2, 4, 4, 256, 64
    hq, kvd = hkv * r, hkv * d
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, kvd)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((l, b, s, kvd)), jnp.float32)
    starts = jnp.asarray([0, 1, 130, s - 1], jnp.int32)
    for layer in (0, 2):
        ref, kref, vref = layered_decode_reference(
            q, kn, vn, kc, vc, jnp.int32(layer), starts
        )
        out = layered_decode_attention(
            q, kn, vn, kc, vc, jnp.int32(layer), starts, s_block=128
        )
        # f32 MXU dots round through bf16 passes on TPU: ~0.4% vs the XLA
        # einsum reference is expected, bf16-pipeline-accurate
        ok &= report(f"attn layer={layer}", out, ref, tol=2e-2)

    # --- write_all_layers ---------------------------------------------------
    rows = jnp.asarray(rng.standard_normal((l, b, kvd)), jnp.float32)
    want = kc
    for li in range(l):
        want = write_cache_rows(want, rows[li], jnp.int32(li), starts)
    got = write_all_layers(kc, rows, starts)
    ok &= report("write_all_layers", got, want, tol=1e-6)

    # --- layered matmuls ----------------------------------------------------
    from nfai_tpu.ops.qmatmul import linear_layered
    from nfai_tpu.ops.qtensor import QTensor

    L, K, N = 3, 512, 1024
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((L, K, N)) * 0.05, jnp.bfloat16)
    for li in (0, L - 1):
        got = linear_layered(x, wd, jnp.int32(li))
        want = (x @ wd[li]).astype(x.dtype)
        ok &= report(f"dense_layered l={li}", got, want, tol=2e-2)

    qs8 = jnp.asarray(rng.integers(-127, 128, (L, K, N)), jnp.int8)
    sc8 = jnp.asarray(rng.uniform(0.001, 0.01, (L, K // 32, N)), jnp.float32)
    qt8 = QTensor(qs8, sc8, None, "q8", K, N)
    for li in (0, L - 1):
        got = linear_layered(x, qt8, jnp.int32(li))
        wl = (
            qs8[li].astype(jnp.float32).reshape(K // 32, 32, N)
            * sc8[li][:, None, :]
        ).reshape(K, N)
        want = x.astype(jnp.float32) @ wl
        ok &= report(f"q8_layered l={li}", got, want, tol=2e-2)

    qs4 = jnp.asarray(rng.integers(-128, 128, (L, K // 2, N)), jnp.int8)
    sc4 = jnp.asarray(rng.uniform(0.001, 0.01, (L, K // 32, N)), jnp.float32)
    mins4 = sc4 * 8.0
    qt4 = QTensor(qs4, sc4, mins4, "q4", K, N)
    from nfai_tpu.ops.qmatmul import qmatmul as qmm_ref

    for li in (0, L - 1):
        got = linear_layered(x, qt4, jnp.int32(li))
        sliced = QTensor(qs4[li], sc4[li], mins4[li], "q4", K, N)
        want = qmm_ref(x, sliced, use_kernel=False)
        ok &= report(f"q4_layered l={li}", got, want, tol=2e-2)

    # --- flash prefill attention (flat-row GQA layout) -----------------------
    from nfai_tpu.ops.prefill_attention import flash_prefill_attention

    def dense_prefill_ref(q, kc_hm, vc_hm, off, softcap=0.0, window=0,
                          ks=None, vs=None):
        """Independent dense oracle: [B,Hkv,S,D] head-major cache."""
        bb, tt, hh, dd = q.shape
        kv = kc_hm.shape[1]
        rr = hh // kv
        if ks is not None:
            kc_hm = kc_hm.astype(np.float32) * np.asarray(ks)[:, :, :, None]
            vc_hm = vc_hm.astype(np.float32) * np.asarray(vs)[:, :, :, None]
        qg = np.asarray(q, np.float32).reshape(bb, tt, kv, rr, dd)
        scores = np.einsum(
            "bthrd,bhsd->bhrts", qg, np.asarray(kc_hm, np.float32)
        ) / np.sqrt(dd)
        if softcap:
            scores = softcap * np.tanh(scores / softcap)
        ss = kc_hm.shape[2]
        span = np.arange(ss)[None, None, None, None, :]
        pos = (np.asarray(off)[:, None] + np.arange(tt)[None, :])[
            :, None, None, :, None
        ]
        vis = span <= pos
        if window:
            vis &= span > pos - window
        scores = np.where(vis, scores, -1e30)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        o = np.einsum("bhrts,bhsd->bthrd", p, np.asarray(vc_hm, np.float32))
        return o.reshape(bb, tt, hh, dd)

    b, t, hq, hkv, d, s = 2, 256, 8, 2, 64, 1024
    q = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, hkv, s, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, hkv, s, d)), jnp.float32)
    off = jnp.asarray([0, 512], jnp.int32)
    got = flash_prefill_attention(q, kc, vc, off, t_block=128, s_block=256)
    want = flash_prefill_attention(
        q, kc, vc, off, t_block=128, s_block=256, interpret=True
    )
    ok &= report("flash_prefill", got, want, tol=2e-2)
    # windowed + softcap + int8-scales variant
    ks = jnp.asarray(rng.uniform(0.01, 0.05, (b, hkv, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.05, (b, hkv, s)), jnp.float32)
    kc8 = jnp.asarray(rng.integers(-128, 128, (b, hkv, s, d)), jnp.int8)
    vc8 = jnp.asarray(rng.integers(-128, 128, (b, hkv, s, d)), jnp.int8)
    got = flash_prefill_attention(
        q, kc8, vc8, off, t_block=128, s_block=256, softcap=30.0,
        window=300, k_scales=ks, v_scales=vs,
    )
    want = flash_prefill_attention(
        q, kc8, vc8, off, t_block=128, s_block=256, softcap=30.0,
        window=300, k_scales=ks, v_scales=vs, interpret=True,
    )
    ok &= report("flash_prefill win+cap+int8", got, want, tol=2e-2)

    # headmajor vs the independent dense oracle (not interpret mode)
    want = dense_prefill_ref(q, kc, vc, off)
    got = flash_prefill_attention(q, kc, vc, off, t_block=128, s_block=256)
    ok &= report("flash_prefill vs dense", got, want, tol=2e-2)

    # --- kv_layout='full' (production default): native merged-lane cache ----
    for dd, name in ((64, "full d=64"), (128, "full d=128")):
        hq2, hkv2 = 8, 2
        kvd = hkv2 * dd
        q2 = jnp.asarray(rng.normal(size=(b, t, hq2, dd)), jnp.float32)
        kcm = jnp.asarray(rng.normal(size=(b, s, kvd)), jnp.float32)
        vcm = jnp.asarray(rng.normal(size=(b, s, kvd)), jnp.float32)
        kc_hm = kcm.reshape(b, s, hkv2, dd).transpose(0, 2, 1, 3)
        vc_hm = vcm.reshape(b, s, hkv2, dd).transpose(0, 2, 1, 3)
        got = flash_prefill_attention(
            q2, kcm, vcm, off, t_block=128, s_block=256, kv_layout="full"
        )
        want = dense_prefill_ref(q2, kc_hm, vc_hm, off)
        ok &= report(f"flash_prefill {name}", got, want, tol=2e-2)
        # int8-scales variant over the full layout
        ks2 = jnp.asarray(
            rng.uniform(0.01, 0.05, (b, hkv2, s)), jnp.float32
        )
        vs2 = jnp.asarray(
            rng.uniform(0.01, 0.05, (b, hkv2, s)), jnp.float32
        )
        kq = jnp.asarray(rng.integers(-128, 128, (b, s, kvd)), jnp.int8)
        vq = jnp.asarray(rng.integers(-128, 128, (b, s, kvd)), jnp.int8)
        kq_hm = kq.reshape(b, s, hkv2, dd).transpose(0, 2, 1, 3)
        vq_hm = vq.reshape(b, s, hkv2, dd).transpose(0, 2, 1, 3)
        got = flash_prefill_attention(
            q2, kq, vq, off, t_block=128, s_block=256, kv_layout="full",
            k_scales=ks2, v_scales=vs2,
        )
        want = dense_prefill_ref(
            q2, kq_hm, vq_hm, off, ks=ks2, vs=vs2
        )
        ok &= report(f"flash_prefill {name} int8", got, want, tol=2e-2)

    print("KERNELS-OK" if ok else "KERNELS-FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
