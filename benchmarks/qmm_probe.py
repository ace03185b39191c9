"""Decisive probes for the q4/q8 kernel gap (v5e): is it int8 DMA, the
int8->bf16 cast, the per-block scale multiply, or the int8 MXU dot?

Background (qmm_variants @ 2048x16384, B=8): dense bf16 runs 1.2x its DMA
ideal, but i8dot (pure int8 MXU dot, no VPU work) and q8 (cast+scale) both
run ~2.5x their ideals, and vab q4 ~3.5x. Something int8-specific is slow.

Probes (matched ~128 KB blocks; every iteration data-depends on the carry):
  stream-i8    pallas stream of int8 [2048,16384] (33.5 MB), no per-elem work
  stream-i32   same bytes typed int32 (no (4,1) sublane packing)
  stream-bf16  bf16 [2048,16384] (67 MB) reference stream
  q8-noscale   stream + cast int8->bf16 + bf16 dot (no scales)
  q8-full      q8-noscale + per-32-block scale multiply
  mixeddot     x_bf16 @ w_int8 handed straight to jax.lax.dot
  xla-i8dot    XLA (non-pallas) int8 dot, same shape
  bitload-vab  vab decode, input typed int32 + pltpu.bitcast to int8 in-kernel
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
K, N = 2048, 16384
TN = 256
GBPS = 819.0

PARAMS = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def bench(name, fn, x0, ws, bytes_touched, n=48, rep=5):
    """fn(x, *ws) -> y; the chain feeds a y-derived scalar back into x so
    every iteration truly serializes (no hoisting)."""

    @functools.partial(jax.jit, static_argnames=("m",))
    def chain(x, ws, m):
        def body(c, _):
            y = fn(c, *ws)
            bump = (y.reshape(-1)[:1].astype(jnp.float32) * 1e-12).sum()
            return c + bump.astype(c.dtype), ()

        c, _ = jax.lax.scan(body, x, length=m)
        return c

    def timed(m):
        t0 = time.perf_counter()
        sync(chain(x0, ws, m))
        return time.perf_counter() - t0

    timed(n), timed(2 * n)
    t1 = min(timed(n) for _ in range(rep))
    t2 = min(timed(2 * n) for _ in range(rep))
    per = (t2 - t1) / n * 1e6
    ideal = bytes_touched / (GBPS * 1e3)
    print(f"{name:>12}: {per:7.1f} us  ideal {ideal:6.1f}  ({per/ideal:4.2f}x)",
          flush=True)


# --- pure stream kernels -----------------------------------------------------
# x rides in so the call depends on the loop carry; the weight block is
# touched with one row-read (the block DMA covers the whole tile regardless).


def _stream_kernel(x_ref, w_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[0, :] += (
        w_ref[0, :].astype(jnp.float32) + x_ref[0, :TN].astype(jnp.float32)
    )


def stream(x, w, tk):
    k, n = w.shape
    return pl.pallas_call(
        _stream_kernel,
        out_shape=jax.ShapeDtypeStruct((8, TN), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // TN, k // tk),
            in_specs=[
                pl.BlockSpec((B, K), lambda j, kk: (0, 0)),
                pl.BlockSpec((tk, TN), lambda j, kk: (kk, j)),
            ],
            out_specs=pl.BlockSpec((8, TN), lambda j, kk: (0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(x, w)


# --- q8-ish matmul kernels ---------------------------------------------------


def _epi(o_ref, acc_ref):
    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _q8_noscale_kernel(x_ref, qs_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16),
        qs_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    _epi(o_ref, acc_ref)


def _q8_full_kernel(x_ref, qs_ref, sc_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = qs_ref[...].astype(jnp.bfloat16)
    tk, tn = q.shape
    w = (
        q.reshape(tk // QBLOCK, QBLOCK, tn)
        * sc_ref[...][:, None, :].astype(jnp.bfloat16)
    ).reshape(tk, tn)
    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    _epi(o_ref, acc_ref)


def _mixed_kernel(x_ref, qs_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...], qs_ref[...], preferred_element_type=jnp.float32
    )
    _epi(o_ref, acc_ref)


def q8ish(kernel, x, ws, tk=512, scaled=False):
    k = x.shape[1]
    n = ws[0].shape[1]
    in_specs = [
        pl.BlockSpec((B, tk), lambda j, kk: (0, kk)),
        pl.BlockSpec((tk, TN), lambda j, kk: (kk, j)),
    ]
    if scaled:
        in_specs.append(pl.BlockSpec((tk // QBLOCK, TN), lambda j, kk: (kk, j)))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // TN, k // tk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B, TN), lambda j, kk: (0, j)),
            scratch_shapes=[pltpu.VMEM((B, TN), jnp.float32)],
        ),
        compiler_params=PARAMS,
    )(x, *ws)


# --- bitcast-load vab --------------------------------------------------------


def _bitload_kernel(x_lo_ref, x_hi_ref, q32_ref, sc_lo_ref, sc_hi_ref, o_ref,
                    acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    byte = pltpu.bitcast(q32_ref[...], jnp.int8)  # [TKB, TN]
    hi16f = (byte & jnp.int8(-16)).astype(jnp.bfloat16)
    lof = byte.astype(jnp.bfloat16) - hi16f
    tk, tn = lof.shape

    def deq(q, sc):
        return (
            q.reshape(tk // QBLOCK, QBLOCK, tn)
            * sc[...][:, None, :].astype(jnp.bfloat16)
        ).reshape(tk, tn)

    acc_ref[...] += jax.lax.dot(
        x_lo_ref[...].astype(jnp.bfloat16), deq(lof, sc_lo_ref),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += jax.lax.dot(
        x_hi_ref[...].astype(jnp.bfloat16), deq(hi16f, sc_hi_ref),
        preferred_element_type=jnp.float32,
    )
    _epi(o_ref, acc_ref)


def bitload_vab(x, q32, scales, tkb=512):
    k = x.shape[1]
    n = q32.shape[1]
    nk = (k // 2) // tkb
    kb = tkb // QBLOCK
    return pl.pallas_call(
        _bitload_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // TN, nk),
            in_specs=[
                pl.BlockSpec((B, tkb), lambda j, kk: (0, kk)),
                pl.BlockSpec((B, tkb), lambda j, kk, nk=nk: (0, kk + nk)),
                pl.BlockSpec((tkb // 4, TN), lambda j, kk: (kk, j)),
                pl.BlockSpec((kb, TN), lambda j, kk: (kk, j)),
                pl.BlockSpec((kb, TN), lambda j, kk, nk=nk: (kk + nk, j)),
            ],
            out_specs=pl.BlockSpec((B, TN), lambda j, kk: (0, j)),
            scratch_shapes=[pltpu.VMEM((B, TN), jnp.float32)],
        ),
        compiler_params=PARAMS,
    )(x, x, q32, scales, scales)


def main():
    print("device:", jax.devices()[0], f"K={K} N={N} B={B}")
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 16))
    x = jax.random.normal(next(ks), (B, K), jnp.bfloat16)
    qs8 = jax.random.randint(next(ks), (K, N), -127, 128, jnp.int32).astype(jnp.int8)
    qs4 = jax.random.randint(next(ks), (K // 2, N), -128, 128, jnp.int32).astype(jnp.int8)
    scales = jax.random.uniform(next(ks), (K // QBLOCK, N), jnp.float32) * 0.004
    wbf = jax.random.normal(next(ks), (K, N), jnp.bfloat16)

    i8_bytes = K * N
    q4_bytes = (K // 2) * N

    bench("stream-i8", lambda c, w: stream(c, w, 512), x, (qs8,), i8_bytes)
    q32s = jax.lax.bitcast_convert_type(
        qs8.reshape(K // 4, 4, N).swapaxes(1, 2), jnp.int32
    ).reshape(K // 4, N)
    bench("stream-i32", lambda c, w: stream(c, w, 128), x, (q32s,), i8_bytes)
    bench("stream-bf16", lambda c, w: stream(c, w, 256), x, (wbf,),
          K * N * 2)

    bench("q8-noscale", lambda c, w: q8ish(_q8_noscale_kernel, c, (w,)),
          x, (qs8,), i8_bytes)
    bench("q8-full",
          lambda c, w, s: q8ish(_q8_full_kernel, c, (w, s), scaled=True),
          x, (qs8, scales), i8_bytes + scales.size * 4)
    bench("mixeddot", lambda c, w: q8ish(_mixed_kernel, c, (w,)),
          x, (qs8,), i8_bytes)

    def xla_i8dot(c, xq, w):
        xq = xq + (c[:, :1] * 0).astype(jnp.int8)  # carry dependence
        return jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    xi8 = jax.random.randint(next(ks), (B, K), -127, 128, jnp.int32).astype(jnp.int8)
    bench("xla-i8dot", xla_i8dot, x, (xi8, qs8), i8_bytes)

    q32 = jax.lax.bitcast_convert_type(
        qs4.reshape(K // 8, 4, N).swapaxes(1, 2), jnp.int32
    ).reshape(K // 8, N)
    bench("bitload-vab", lambda c, w, s: bitload_vab(c, w, s),
          x, (q32, scales), q4_bytes + scales.size * 4)


if __name__ == "__main__":
    main()
