"""Kernel-variant experiment for the q4 dequant-matmul VPU wall.

Round-1 micro bench: q4 kernels are dequant-bound, not HBM-bound
(gate_up 2048x16384: ~104 us vs 30.7 us bandwidth ideal). Mosaic probe
results (v5e): int8 AND lowers; int8 SUB/XOR/MUL do NOT; int8xint8->int32
MXU dot DOES. Variants:

  cur   — shipped kernel: unsigned nibbles, int32 widen+shift for hi
  vab   — biased-hi repack: byte = ((q_hi - 8) & 0xF) << 4 | q_lo, decoded
          as hi16f = (b & 0xF0).astype(bf16)   (= 16*(q_hi-8) exactly)
             lof   = b.astype(bf16) - hi16f     (= q_lo exactly)
          with /16 folded into hi-half scales and the -8 bias absorbed by
          the external mins correction. No i32 ops, no shifts.
  q8    — int8 container (cast+scale floor, 2x the weight bytes)
  dense — bf16 x @ w baseline
  null  — empty pallas kernel (fixed launch overhead)
  i8dot — raw int8 MXU dot kernel (W4A8/W8A8 ceiling probe)

Usage: python benchmarks/qmm_variants.py [K N] (defaults 2048 16384)
"""
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 8
QBLOCK = 32


def sync(x):
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def _timed(fn, state):
    t0 = time.perf_counter()
    out = fn(state)
    sync(out)
    return time.perf_counter() - t0


def bench_slope(name, step_fn, state, n=128, rep=3):
    def scan_n(m):
        @jax.jit
        def run(s):
            c, _ = jax.lax.scan(lambda c, _: (step_fn(c), ()), s, length=m)
            return c

        return run

    r1, r2 = scan_n(n), scan_n(2 * n)
    _timed(r1, state), _timed(r2, state)  # compile
    t1 = min(_timed(r1, state) for _ in range(rep))
    t2 = min(_timed(r2, state) for _ in range(rep))
    per = (t2 - t1) / n
    print(f"{name}: {per*1e6:.1f} us/iter", flush=True)
    return per


def _scaled_deq(q_bf16, sc, group=QBLOCK):
    tk, tn = q_bf16.shape
    w = q_bf16.reshape(tk // group, group, tn) * sc[:, None, :].astype(
        jnp.bfloat16
    )
    return w.reshape(tk, tn)


def _acc_epilogue(o, acc):
    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o[...] = acc[...].astype(o.dtype)


# --- current kernel (unsigned nibbles, int32 widen for hi) -----------------


def _cur_kernel(x_lo, x_hi, qs, sc_lo, sc_hi, o, acc):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    byte = qs[...]
    lo = (byte & 0x0F).astype(jnp.bfloat16)
    hi = ((byte.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.bfloat16)
    w_lo = _scaled_deq(lo, sc_lo[...])
    w_hi = _scaled_deq(hi, sc_hi[...])
    acc[...] += jax.lax.dot(
        x_lo[...].astype(jnp.bfloat16), w_lo, preferred_element_type=jnp.float32
    )
    acc[...] += jax.lax.dot(
        x_hi[...].astype(jnp.bfloat16), w_hi, preferred_element_type=jnp.float32
    )
    _acc_epilogue(o, acc)


# --- vab: biased-hi repack, AND + bf16 SUB decode ---------------------------


def _vab_kernel(x_lo, x_hi, qs, sc_lo, sc_hi, o, acc):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    byte = qs[...]
    hi16f = (byte & jnp.int8(-16)).astype(jnp.bfloat16)  # 16*(q_hi-8)
    lof = byte.astype(jnp.bfloat16) - hi16f  # q_lo, exact
    w_lo = _scaled_deq(lof, sc_lo[...])
    w_hi = _scaled_deq(hi16f, sc_hi[...])  # sc_hi pre-divided by 16
    acc[...] += jax.lax.dot(
        x_lo[...].astype(jnp.bfloat16), w_lo, preferred_element_type=jnp.float32
    )
    acc[...] += jax.lax.dot(
        x_hi[...].astype(jnp.bfloat16), w_hi, preferred_element_type=jnp.float32
    )
    _acc_epilogue(o, acc)


def q4_call(kernel, x, qs, scales, tkb=512, tn=256):
    b, k = x.shape
    n = qs.shape[1]
    tkb = min(tkb, k // 2)
    nk = (k // 2) // tkb
    grid = (n // tn, nk)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, tkb), lambda j, kk: (0, kk)),
                pl.BlockSpec((b, tkb), lambda j, kk, nk=nk: (0, kk + nk)),
                pl.BlockSpec((tkb, tn), lambda j, kk: (kk, j)),
                pl.BlockSpec((tkb // QBLOCK, tn), lambda j, kk: (kk, j)),
                pl.BlockSpec(
                    (tkb // QBLOCK, tn), lambda j, kk, nk=nk: (kk + nk, j)
                ),
            ],
            out_specs=pl.BlockSpec((b, tn), lambda j, kk: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x, x, qs, scales, scales)


# --- q8 reference ------------------------------------------------------------


def _q8_kernel(x, qs, sc, o, acc):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = _scaled_deq(qs[...].astype(jnp.bfloat16), sc[...])
    acc[...] += jax.lax.dot(
        x[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    _acc_epilogue(o, acc)


def q8_call(x, qs, scales, tk=512, tn=256):
    b, k = x.shape
    n = qs.shape[1]
    grid = (n // tn, k // tk)
    return pl.pallas_call(
        _q8_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, tk), lambda j, kk: (0, kk)),
                pl.BlockSpec((tk, tn), lambda j, kk: (kk, j)),
                pl.BlockSpec((tk // QBLOCK, tn), lambda j, kk: (kk, j)),
            ],
            out_specs=pl.BlockSpec((b, tn), lambda j, kk: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x, qs, scales)


# --- i8 MXU dot probe --------------------------------------------------------


def _i8dot_kernel(x, qs, o, acc):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot(
        x[...], qs[...], preferred_element_type=jnp.int32
    )
    _acc_epilogue(o, acc)


def i8dot_call(x8, qs, tk=512, tn=256):
    b, k = x8.shape
    n = qs.shape[1]
    grid = (n // tn, k // tk)
    return pl.pallas_call(
        _i8dot_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, tk), lambda j, kk: (0, kk)),
                pl.BlockSpec((tk, tn), lambda j, kk: (kk, j)),
            ],
            out_specs=pl.BlockSpec((b, tn), lambda j, kk: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.int32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x8, qs)


def _null_kernel(x, o):
    o[...] = x[...]


def null_call(x):
    return pl.pallas_call(
        _null_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 2 else 2048
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    print("device:", jax.devices()[0], f" shape K={k} N={n} B={B}")
    key = jax.random.PRNGKey(0)
    kk = jax.random.split(key, 4)
    x = jax.random.normal(kk[0], (B, k), jnp.bfloat16)
    qs = jax.random.randint(kk[1], (k // 2, n), -128, 128, jnp.int32).astype(
        jnp.int8
    )
    scales = jax.random.uniform(kk[2], (k // QBLOCK, n), jnp.float32) * 0.004
    qs8 = jax.random.randint(kk[3], (k, n), -128, 128, jnp.int32).astype(
        jnp.int8
    )
    w = jax.random.normal(kk[3], (k, n), jnp.bfloat16)

    q4_bytes = qs.size + scales.size * 4
    q8_bytes = qs8.size + scales.size * 4
    print(
        f"ideal q4 {q4_bytes/819e9*1e6:.1f} us, q8 {q8_bytes/819e9*1e6:.1f} us,"
        f" dense {k*n*2/819e9*1e6:.1f} us, i8 {qs8.size/819e9*1e6:.1f} us"
    )

    # correctness cross-check: vab repack must reproduce cur semantics
    rng = np.random.RandomState(0)
    qv = rng.randint(0, 16, size=(k, n), dtype=np.uint8)  # unsigned values
    packed_u = (qv[: k // 2] | (qv[k // 2 :] << 4)).view(np.int8)
    hi_biased = (qv[k // 2 :].astype(np.int8) - 8).astype(np.uint8) & 0x0F
    packed_v = (qv[: k // 2] | (hi_biased << 4)).view(np.int8)
    sc_np = np.asarray(scales)
    sc_vab = sc_np.copy()
    sc_vab[k // QBLOCK // 2 :] /= 16.0  # hi-half rows pre-divided
    y_cur = q4_call(_cur_kernel, x, jnp.asarray(packed_u), scales)
    y_vab = q4_call(_vab_kernel, x, jnp.asarray(packed_v), jnp.asarray(sc_vab))
    # vab hi = q_hi - 8  ->  y_vab = y_cur - 8 * (x_hi @ repeat(sc_hi))
    sc_hi_exp = np.repeat(sc_np[k // QBLOCK // 2 :], QBLOCK, axis=0)
    corr = (
        np.asarray(x[:, k // 2 :], np.float32) @ sc_hi_exp * 8.0
    )
    err = np.max(
        np.abs(np.asarray(y_vab, np.float32) - (np.asarray(y_cur, np.float32) - corr))
    )
    ref = np.max(np.abs(np.asarray(y_cur, np.float32))) + 1e-9
    print(f"vab-vs-cur relative err: {err/ref:.2e}")

    def couple(y, x):
        return x * (1.0 + 1e-9 * jnp.mean(y).astype(x.dtype))

    bench_slope("null  ", lambda c: couple(null_call(c[:, :256]), c), x)
    bench_slope(
        "cur   ", lambda c: couple(q4_call(_cur_kernel, c, qs, scales), c), x
    )
    bench_slope(
        "vab   ", lambda c: couple(q4_call(_vab_kernel, c, qs, scales), c), x
    )
    for tkb, tn_ in ((512, 512), (1024, 256), (1024, 512), (1024, 1024), (2048, 256), (256, 256)):
        if (k // 2) % tkb == 0 and n % tn_ == 0:
            bench_slope(
                f"vab {tkb}x{tn_}",
                lambda c, tkb=tkb, tn_=tn_: couple(
                    q4_call(_vab_kernel, c, qs, scales, tkb=tkb, tn=tn_), c
                ),
                x,
            )
    bench_slope("q8    ", lambda c: couple(q8_call(c, qs8, scales), c), x)
    x8 = (x * 10).astype(jnp.int8)
    bench_slope(
        "i8dot ",
        lambda c: couple(
            i8dot_call((c * 10).astype(jnp.int8), qs8).astype(jnp.bfloat16), c
        ),
        x,
    )
    bench_slope("dense ", lambda c: couple(c @ w, c), x)


if __name__ == "__main__" and "sweep" not in sys.argv:
    main()


def sweep():
    """Tile sweep for vab across the 1B/8B decode matmul shapes."""
    key = jax.random.PRNGKey(0)
    shapes = [(2048, 3072), (2048, 2048), (2048, 16384), (8192, 2048),
              (2048, 128256)]
    best = {}
    for k, n in shapes:
        kk = jax.random.split(jax.random.fold_in(key, k * n), 3)
        x = jax.random.normal(kk[0], (B, k), jnp.bfloat16)
        qs = jax.random.randint(
            kk[1], (k // 2, n), -128, 128, jnp.int32
        ).astype(jnp.int8)
        scales = (
            jax.random.uniform(kk[2], (k // QBLOCK, n), jnp.float32) * 0.004
        )
        ideal = (qs.size + scales.size * 4) / 819e9
        print(f"--- K={k} N={n}  ideal {ideal*1e6:.1f} us")

        def couple(y, x):
            return x * (1.0 + 1e-9 * jnp.mean(y).astype(x.dtype))

        results = {}
        for tkb in (512, 1024, 2048, 4096):
            if (k // 2) % tkb:
                continue
            for tn in (256, 512, 1024):
                if n % tn:
                    continue
                # VMEM estimate: qs 2x double-buffered + dequant temps
                vmem = tkb * tn * (2 + 4) + 8 * tn * 4
                if vmem > 12 * 2**20:
                    continue
                t = bench_slope(
                    f"vab {tkb}x{tn}",
                    lambda c, tkb=tkb, tn=tn: couple(
                        q4_call(_vab_kernel, c, qs, scales, tkb=tkb, tn=tn), c
                    ),
                    x,
                )
                results[(tkb, tn)] = t
        bst = min(results, key=results.get)
        best[(k, n)] = (bst, results[bst], ideal / results[bst])
        print(
            f"  BEST {bst}: {results[bst]*1e6:.1f} us "
            f"eff {ideal/results[bst]:.2f}"
        )
    print("\nsummary:")
    for (k, n), (bst, t, eff) in best.items():
        print(f"  K={k:6d} N={n:6d}: tiles {bst} {t*1e6:7.1f} us eff {eff:.2f}")


if __name__ == "__main__" and "sweep" in sys.argv:
    sweep()
