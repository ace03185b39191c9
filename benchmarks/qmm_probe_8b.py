"""Probe: the two named 8B Q4 hot spots (VERDICT r3 / STATUS gaps 1).

1. fused-MLP pair at the 8B shape [K=4096, F=14336, H=4096] (tfb=128):
   shipped kernel vs the combined-slab `_mlp_kernel_v2` (one dot set over
   the whole [gate|up] slab + hoisted gate/up block-sums: 36 -> 20 MXU dot
   launches per grid step) vs the two-kernel layered v3m path.
2. lm_head [4096, 128256->128512] v3 tile sweep (tw, tn): the shipped
   (256, 512) tile makes 502 grid cells of ~0.6 us DMA each — per-cell
   fixed cost is a plausible cause of the measured 1.79x-of-ideal.

Weights ride as jit arguments (HTTP 413 on captured constants >100 MB) and
are packed HOST-side in numpy (device arrays would round-trip through the
TPU tunnel at ~80 s per 270 MB).
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

GBPS = 819.0


def build_q4(rng, *shape):
    """Host-numpy stacked q4 container (bf16-rounded scales like bench.py)."""
    from nfai_tpu.ops.qtensor import QTensor

    lead, k, n = shape[:-2], shape[-2], shape[-1]
    qs = rng.integers(-128, 128, (*lead, k // 2, n), dtype=np.int8)
    sc = (rng.random((*lead, k // 32, n), dtype=np.float32) * 0.004)
    return QTensor(qs, sc, sc * 8.0, "q4", k, n)


def sync(v):
    return np.asarray(jnp.sum(v.astype(jnp.float32)))


def time_chain(fn, x, m_small=8, m_big=24, reps=5):
    """min-of-reps (big - small) scan timing -> seconds per iteration."""
    fn(x, m_small), fn(x, m_big)  # compile
    t1 = min(
        (lambda t0: (sync(fn(x, m_small)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    t2 = min(
        (lambda t0: (sync(fn(x, m_big)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(reps)
    )
    return (t2 - t1) / (m_big - m_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--skip-mlp", action="store_true")
    ap.add_argument("--skip-head", action="store_true")
    args = ap.parse_args()
    print("device:", jax.devices()[0], flush=True)

    from nfai_tpu.ops.fused_mlp import _fused_mlp
    from nfai_tpu.ops.qmatmul import _q4v3_matmul, qmatmul_layered
    from nfai_tpu.ops.qtensor import to_v3, to_v3_mlp_stacked, to_v3_stacked

    B, K, F, H, L = args.batch, 4096, 14336, 4096, args.layers
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)

    if not args.skip_mlp:
        print("packing 8B MLP containers (host numpy)...", flush=True)
        gu, dn = build_q4(rng, L, K, 2 * F), build_q4(rng, L, F, H)
        gum, dnm = to_v3_mlp_stacked(gu, dn)
        assert gum.kind == "q4mlpg", gum.kind
        print(f"  tfb={gum.tfb}", flush=True)
        guv, dnv = to_v3_stacked(gu), to_v3_stacked(dn)
        del gu, dn
        bytes_layer = sum(
            a.nbytes for a in (gum.qs, gum.scales, dnm.qs, dnm.scales)
        ) // L
        ideal = bytes_layer / (GBPS * 1e3)  # us

        ws = jax.device_put(
            (gum.qs, gum.scales, dnm.qs, dnm.scales,
             guv.qs, guv.scales, dnv.qs, dnv.scales)
        )

        @functools.partial(jax.jit, static_argnames=("m", "which"))
        def chain(x0, ws, m, which):
            g_qs, g_sc, d_qs, d_sc, gv_qs, gv_sc, dv_qs, dv_sc = ws
            guv2 = guv.replace(qs=gv_qs, scales=gv_sc)
            dnv2 = dnv.replace(qs=dv_qs, scales=dv_sc)

            def body(c, i):
                li = i % L
                if which in ("fused", "fused-v2"):
                    y = _fused_mlp(
                        c, li, g_qs, g_sc, d_qs, d_sc,
                        tfb=gum.tfb, v2=(which == "fused-v2"),
                    )
                else:
                    t = qmatmul_layered(c, guv2, li)
                    a = (jax.nn.silu(t[..., :F].astype(jnp.float32))
                         * t[..., F:].astype(jnp.float32)).astype(jnp.bfloat16)
                    y = qmatmul_layered(a, dnv2, li)
                bump = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(c.dtype)
                return c + bump, ()

            c, _ = jax.lax.scan(body, x0, jnp.arange(m, dtype=jnp.int32))
            return c

        for which in ("fused", "fused-v2", "2-kernel"):
            per = time_chain(
                lambda x0, m, w=which: chain(x0, ws, m, w), x
            ) * 1e6
            print(f"MLP {which:>9}: {per:7.1f} us/layer  ideal {ideal:6.1f}"
                  f"  ({per/ideal:4.2f}x)", flush=True)
        del ws

    if not args.skip_head:
        print("packing lm_head (host numpy)...", flush=True)
        from nfai_tpu.ops.qtensor import pad_qtensor_n

        head = pad_qtensor_n(build_q4(rng, K, 128256))
        headv3 = to_v3(head)
        hbytes = headv3.qs.nbytes + headv3.scales.nbytes + headv3.mins.nbytes
        ideal = hbytes / (GBPS * 1e3)
        hw = jax.device_put((headv3.qs, headv3.scales))

        @functools.partial(jax.jit, static_argnames=("m", "tag"))
        def hchain(x0, hw, m, tag):
            def body(c, i):
                y = _q4v3_matmul(c, hw[0], hw[1])
                bump = (jnp.sum(y[:, :256].astype(jnp.float32))
                        * 1e-12).astype(c.dtype)
                return c + bump, ()

            c, _ = jax.lax.scan(body, x0, jnp.arange(m, dtype=jnp.int32))
            return c

        for tiles in ("default", "256,512", "512,512", "512,1024",
                      "256,1024", "128,512"):
            if tiles == "default":
                os.environ.pop("NFAI_V3_TILES", None)
            else:
                os.environ["NFAI_V3_TILES"] = tiles
            _q4v3_matmul.clear_cache()
            try:
                per = time_chain(
                    lambda x0, m, t=tiles: hchain(x0, hw, m, t), x
                ) * 1e6
            except Exception as e:  # Mosaic VMEM rejections etc.
                print(f"lm_head tiles {tiles:>9}: FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            print(f"lm_head tiles {tiles:>9}: {per:7.1f} us  "
                  f"ideal {ideal:6.1f}  ({per/ideal:4.2f}x)", flush=True)
        os.environ.pop("NFAI_V3_TILES", None)


if __name__ == "__main__":
    main()
