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


def time_chain(fn, x, m_small=64, m_big=320, reps=5):
    """min-of-reps (big - small) scan timing -> seconds per iteration.
    The delta must dwarf the ~ms-scale tunnel dispatch noise: 256 extra
    iterations of a >=100 us op gives a >=25 ms delta (the first probe run
    used 16 extra iterations and returned negative numbers)."""
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
    ap.add_argument("--skip-anatomy", action="store_true")
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

        for tiles in ("default", "512,512"):
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

        if not args.skip_anatomy:
            _anatomy(x, headv3, ideal, label="lm_head")

    if os.environ.get("NFAI_ANATOMY_WQKV"):
        # the 8B profile has wqkv at 2.0x and wo at 2.1x ideal — the worst
        # ratios post-scexp; these shapes carry IN-KERNEL mins dots (the
        # lm_head applies mins externally). Anatomy with "+mins" modes
        # isolates that term at the wqkv shape.
        from nfai_tpu.ops.qtensor import to_v3

        wq = to_v3(build_q4(rng, K, 6144))
        wbytes = wq.qs.nbytes + wq.scales.nbytes + wq.mins.nbytes
        _anatomy(x, wq, wbytes / (GBPS * 1e3), label="wqkv")


def _anatomy(x, headv3, ideal, label="lm_head"):
    """Kernel-anatomy timing at the lm_head shape: which VPU term makes the
    v3 kernel ~1.7x its DMA ideal? Variants (timing-only; wrong numerics for
    all but `full`):
      full      — the shipped decode (4 plane decodes + scale mult + 4 dots)
      noscale   — skip the per-element scale multiply
      oneplane  — decode plane 0 only, reuse it for all 4 dots (saves 9 of
                  12 decode ops; DMA, dots, scale mults unchanged)
      floor     — oneplane + noscale (DMA + minimal VPU + dots)
    full-noscale = scale-mult cost; full-oneplane = 3/4 decode cost;
    floor vs ideal = everything else (DMA shortfall + dot latency).
    """
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nfai_tpu.ops.qmatmul import _block_sums, _scaled_deq

    b, k = x.shape
    q32, scales = headv3.qs, headv3.scales
    n = q32.shape[1]
    nw = k // 8
    tw, tn = 512, 512
    nk = nw // tw
    tkp = 2 * tw
    kb = tkp // 32

    def kernel(x0, x1, x2, x3, q32_ref, s0, s1, s2, s3, o_ref, acc_ref,
               *, mode):
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w = q32_ref[...]
        hdr = jnp.int32(0x40004000)
        msk = jnp.int32(0x00780078)

        def plane(shifted):
            return pltpu.bitcast((shifted & msk) | hdr, jnp.bfloat16)

        base = mode.split("+")[0]
        if base in ("oneplane", "floor"):
            ws = [plane(w << 3)] * 4
        else:
            ws = [plane(w << 3), plane(w >> 5), plane(w >> 1), plane(w >> 9)]
        for xr, wr, sr in zip((x0, x1, x2, x3), ws, (s0, s1, s2, s3)):
            if base in ("noscale", "floor"):
                wsc = wr
            elif base == "rowscale":
                # same mult count, NO sublane regroup: is the reshape the
                # real cost, or the multiply itself?
                wsc = wr * sr[0:1, :].astype(jnp.bfloat16)
            elif base == "repeat":
                # WRONG NUMERICS (kept as a timing bound): pltpu.repeat is
                # tile-concat, not per-row repeat — caught by
                # tpu_kernel_parity when this briefly shipped
                wsc = wr * pltpu.repeat(
                    sr[...].astype(jnp.bfloat16), 32, axis=0
                )
            elif base == "scexp":
                # CORRECT: expand the SCALES [kb,tn]->[kb,32,tn]->[tkp,tn]
                # (merge of two sublane dims; no split-regroup of the big
                # weight array like _scaled_deq's reshape does)
                sb = sr[...].astype(jnp.bfloat16)
                kbr = sb.shape[0]
                wsc = wr * jax.lax.broadcast_in_dim(
                    sb, (kbr, 32, sb.shape[1]), (0, 2)
                ).reshape(kbr * 32, sb.shape[1])
            elif base == "scalef32":
                # multiply in f32 after upcast (2 ops/el but maybe better
                # ALU packing story)
                wsc = (wr.astype(jnp.float32)
                       * sr[0:1, :].astype(jnp.float32)).astype(jnp.bfloat16)
            else:
                wsc = _scaled_deq(wr, sr[...], 32)
            acc_ref[...] += jax.lax.dot(
                xr[...].astype(jnp.bfloat16), wsc,
                preferred_element_type=jnp.float32,
            )
            if mode.endswith("+mins"):
                # the layered kernels' in-kernel affine term: one bsums
                # selector-dot + one mins dot per plane (sr stands in for
                # the mins rows — same shape, timing-equivalent)
                acc_ref[...] -= jax.lax.dot(
                    _block_sums(xr[...], 32),
                    sr[...].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def build(mode):
        xspecs = [
            pl.BlockSpec((b, tkp), lambda j, kk, p=p, nk=nk: (0, kk + p * nk))
            for p in range(4)
        ]
        sspecs = [
            pl.BlockSpec((kb, tn), lambda j, kk, p=p, nk=nk: (kk + p * nk, j))
            for p in range(4)
        ]

        @jax.jit
        def run(xx, qq, ss):
            return pl.pallas_call(
                ft.partial(kernel, mode=mode),
                out_shape=jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=0,
                    grid=(n // tn, nk),
                    in_specs=xspecs
                    + [pl.BlockSpec((tw, tn), lambda j, kk: (kk, j))]
                    + sspecs,
                    out_specs=pl.BlockSpec((b, tn), lambda j, kk: (0, j)),
                    scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                ),
                interpret=jax.default_backend() == "cpu",
            )(xx, xx, xx, xx, qq, ss, ss, ss, ss)
        return run

    hw = jax.device_put((q32, scales))
    modes = os.environ.get(
        "NFAI_ANATOMY",
        "full,noscale,oneplane,floor,rowscale,repeat,scalef32",
    ).split(",")
    # correctness gate for the exact variants (full/scexp must match the
    # XLA dequant reference; the others are knowingly wrong, timing-only)
    from nfai_tpu.ops.qtensor import dequant_qtensor

    ref = np.asarray(
        x.astype(jnp.float32)
        @ dequant_qtensor(headv3.replace(mins=None), jnp.float32),
        np.float32,
    )
    for mode in modes:
        runk = build(mode)
        if mode in ("full", "scexp"):
            got = np.asarray(runk(x, *jax.device_put((q32, scales))),
                             np.float32)[:, : ref.shape[1]]
            rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            tag = "OK" if rel < 2e-2 else "FAIL"
            print(f"anatomy[{label}] {mode:>9}: parity rel {rel:.3e} {tag}",
                  flush=True)

        @functools.partial(jax.jit, static_argnames=("m", "tag"))
        def chain(x0, hw, m, tag):
            def body(c, i):
                y = runk(c, hw[0], hw[1])
                bump = (jnp.sum(y[:, :256].astype(jnp.float32))
                        * 1e-12).astype(c.dtype)
                return c + bump, ()

            c, _ = jax.lax.scan(body, x0, jnp.arange(m, dtype=jnp.int32))
            return c

        per = time_chain(
            lambda x0, m, mm=mode: chain(x0, hw, m, mm), x
        ) * 1e6
        print(f"anatomy[{label}] {mode:>10}: {per:7.1f} us  ideal {ideal:6.1f}  "
              f"({per/ideal:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
