"""Probe: ops.fused_mlp (one-kernel quantized MLP, permuted v3 containers)
vs the shipped two-kernel layered path (q4v3m gate_up + w_down).

Parity on CPU (interpret mode, small shapes); timing on the TPU at the
1B decode shape. See ops/fused_mlp.py for the design.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np


def build(rng, L, K, F, H):
    """Random stacked v2 q4 containers for gate_up and down."""
    from nfai_tpu.ops.qtensor import QTensor

    def qt(k, n):
        qs = jnp.asarray(
            rng.integers(-128, 128, (L, k // 2, n), np.int64).astype(np.int8)
        )
        sc = jnp.asarray((rng.random((L, k // 32, n)) * 0.01).astype(np.float32))
        mn = jnp.asarray((rng.random((L, k // 32, n)) * 0.02).astype(np.float32))
        return QTensor(qs, sc, mn, "q4", k, n)

    return qt(K, 2 * F), qt(F, H)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--big", action="store_true", help="1B shapes (TPU)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    on_cpu = jax.default_backend() == "cpu"
    print("device:", jax.devices()[0])

    from nfai_tpu.ops.fused_mlp import fused_mlp_layered
    from nfai_tpu.ops.qmatmul import qmatmul_layered
    from nfai_tpu.ops.qtensor import dequant_qtensor, to_v3_mlp_stacked, to_v3_stacked

    if args.big or not on_cpu:
        B, K, F, H, L = args.batch, 2048, 8192, 2048, 16
    else:
        B, K, F, H, L = 4, 1024, 1024, 512, 2
    rng = np.random.default_rng(0)
    gu, dn = build(rng, L, K, F, H)
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)

    gum, dnm = to_v3_mlp_stacked(gu, dn)
    assert gum.kind == "q4mlpg" and dnm.kind == "q4mlpd", (gum.kind, dnm.kind)

    # dense reference on layer index 1
    li = 1
    if args.skip_parity:
        guv, dnv = to_v3_stacked(gu), to_v3_stacked(dn)
        _time_chains(args, gu, dn, gum, dnm, guv, dnv, x, L, F)
        return
    wg = dequant_qtensor(gu.replace(qs=gu.qs[li], scales=gu.scales[li], mins=gu.mins[li]), jnp.float32)
    wd = dequant_qtensor(dn.replace(qs=dn.qs[li], scales=dn.scales[li], mins=dn.mins[li]), jnp.float32)
    xf = x.astype(jnp.float32)
    gu_out = xf @ wg
    a = jax.nn.silu(gu_out[:, :F]) * gu_out[:, F:]
    ref = np.asarray(a @ wd, np.float32)

    # dequant parity of the converted containers (round-trip check)
    wg2 = dequant_qtensor(gum.replace(qs=gum.qs[li], scales=gum.scales[li]), jnp.float32)
    wd2 = dequant_qtensor(dnm.replace(qs=dnm.qs[li], scales=dnm.scales[li]), jnp.float32)
    for nm, a1, a2 in [("gu", wg, wg2), ("dn", wd, wd2)]:
        err = np.abs(np.asarray(a1) - np.asarray(a2)).max()
        print(f"container round-trip {nm}: max abs err {err:.3e}")

    got = np.asarray(
        fused_mlp_layered(x, gum, dnm, jnp.int32(li)), np.float32
    )
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"fused kernel parity vs dense: rel err {rel:.3e}")
    assert rel < 6e-2, rel

    # two-kernel shipped path on v3m containers (same bf16 scale rounding —
    # this comparison is the tight one)
    guv, dnv = to_v3_stacked(gu), to_v3_stacked(dn)

    def two_kernel(x, li):
        y = qmatmul_layered(x, guv, li)
        a = (jax.nn.silu(y[..., :F].astype(jnp.float32))
             * y[..., F:].astype(jnp.float32)).astype(jnp.bfloat16)
        return qmatmul_layered(a, dnv, li)

    tk = np.asarray(two_kernel(x, jnp.int32(li)), np.float32)
    rel2 = np.abs(got - tk).max() / (np.abs(tk).max() + 1e-9)
    print(f"fused vs two-kernel: rel err {rel2:.3e}")
    assert rel2 < 2e-2, rel2
    if on_cpu:
        print("CPU parity OK")
        return

    _time_chains(args, gu, dn, gum, dnm, guv, dnv, x, L, F)


def _time_chains(args, gu, dn, gum, dnm, guv, dnv, x, L, F):
    from nfai_tpu.ops.fused_mlp import fused_mlp_layered
    from nfai_tpu.ops.qmatmul import qmatmul_layered

    # weights ride as jit ARGUMENTS — the axon remote-compile service 413s
    # on >100 MB captured constants (STATUS.md operational notes)
    @functools.partial(jax.jit, static_argnames=("m", "which"))
    def chain(x0, ws, m, which):
        gum2 = gum.replace(qs=ws[0], scales=ws[1])
        dnm2 = dnm.replace(qs=ws[2], scales=ws[3])
        guv2 = guv.replace(qs=ws[4], scales=ws[5])
        dnv2 = dnv.replace(qs=ws[6], scales=ws[7])

        def tk(c, i):
            y = qmatmul_layered(c, guv2, i)
            a = (jax.nn.silu(y[..., :F].astype(jnp.float32))
                 * y[..., F:].astype(jnp.float32)).astype(jnp.bfloat16)
            return qmatmul_layered(a, dnv2, i)

        def body(c, i):
            y = (fused_mlp_layered(c, gum2, dnm2, i % L) if which == "fused"
                 else tk(c, i % L))
            bump = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(c.dtype)
            return c + bump, ()

        c, _ = jax.lax.scan(body, x0, jnp.arange(m, dtype=jnp.int32))
        return c

    ws = (gum.qs, gum.scales, dnm.qs, dnm.scales,
          guv.qs, guv.scales, dnv.qs, dnv.scales)

    def sync(v):
        return np.asarray(jnp.sum(v.astype(jnp.float32)))

    bytes_layer = (
        gum.qs.nbytes + gum.scales.nbytes + dnm.qs.nbytes + dnm.scales.nbytes
    ) // L
    ideal = bytes_layer / (args.hbm_gbps * 1e3)

    def timed(which, m):
        t0 = time.perf_counter()
        sync(chain(x, ws, m, which))
        return time.perf_counter() - t0

    for which in ("fused", "2-kernel"):
        timed(which, 16), timed(which, 32)  # compile
        t1 = min(timed(which, 16) for _ in range(5))
        t2 = min(timed(which, 32) for _ in range(5))
        per = (t2 - t1) / 16 * 1e6
        print(f"{which:>9}: {per:7.1f} us/layer  ideal {ideal:6.1f}  "
              f"({per/ideal:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
