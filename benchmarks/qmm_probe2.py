"""Round-2 q4 kernel variants: tile sizes x decode styles, at the two hot
shapes (gate_up 2048x16384, w_down 8192x2048) plus the lm_head (2048x128256).

Variants:
  vab      shipped decode: AND+cast-hi, cast-full, sub; scales on weights
  floor    single cast + floor split: f=cast(byte); h=floor(f/16); l=f-16h
           (exact: byte = 16*(q_hi-8)+q_lo, all integers exact in bf16);
           hi scales pre-multiplied by 16 fold the /16 back in
  outsc    vab nibble decode, but UNSCALED dots per 32-block via a
           block-diagonal activation matrix; scales applied to the [B*KB,TN]
           partial sums (VPU work ~TK/B smaller), reduced back with an MXU dot
Tiles: (512,256) shipped, (1024,512), (1024,1024), (1024, 2048)

All variants compute y = x_lo @ W_lo + x_hi @ W_hi with per-32-block scales
(no mins — external correction, same as production).
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
GBPS = 819.0

PARAMS = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def bench(name, fn, x0, ws, bytes_touched, n=48, rep=5):
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

    try:
        timed(n), timed(2 * n)
        t1 = min(timed(n) for _ in range(rep))
        t2 = min(timed(2 * n) for _ in range(rep))
    except Exception as e:  # noqa: BLE001 - report and continue the sweep
        print(f"{name:>24}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return
    per = (t2 - t1) / n * 1e6
    ideal = bytes_touched / (GBPS * 1e3)
    print(f"{name:>24}: {per:7.1f} us  ideal {ideal:6.1f}  ({per/ideal:4.2f}x)",
          flush=True)


def _deq(q, sc):
    tk, tn = q.shape
    return (
        q.reshape(tk // QBLOCK, QBLOCK, tn)
        * sc[:, None, :].astype(jnp.bfloat16)
    ).reshape(tk, tn)


def _init(acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)


def _epi(o_ref, acc_ref):
    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _vab_kernel(x_lo, x_hi, qs, sc_lo, sc_hi, o, acc):
    _init(acc)
    byte = qs[...]
    hi16f = (byte & jnp.int8(-16)).astype(jnp.bfloat16)
    lof = byte.astype(jnp.bfloat16) - hi16f
    acc[...] += jax.lax.dot(
        x_lo[...].astype(jnp.bfloat16), _deq(lof, sc_lo[...]),
        preferred_element_type=jnp.float32,
    )
    acc[...] += jax.lax.dot(
        x_hi[...].astype(jnp.bfloat16), _deq(hi16f, sc_hi[...]),
        preferred_element_type=jnp.float32,
    )
    _epi(o, acc)


def _floor_kernel(x_lo, x_hi, qs, sc_lo, sc_hi, o, acc):
    _init(acc)
    f = qs[...].astype(jnp.bfloat16)  # 16*(q_hi-8) + q_lo, exact
    h = jnp.floor(f * jnp.bfloat16(1 / 16))  # q_hi - 8
    lof = f - h * jnp.bfloat16(16.0)  # q_lo
    acc[...] += jax.lax.dot(
        x_lo[...].astype(jnp.bfloat16), _deq(lof, sc_lo[...]),
        preferred_element_type=jnp.float32,
    )
    # sc_hi here carries 16x (the host folds /16 for vab; for this probe we
    # pass the same scales and accept numerically-different output)
    acc[...] += jax.lax.dot(
        x_hi[...].astype(jnp.bfloat16), _deq(h, sc_hi[...]),
        preferred_element_type=jnp.float32,
    )
    _epi(o, acc)


def _outsc_kernel(xbd_lo, xbd_hi, qs, sc_lo, sc_hi, o, acc):
    """Unscaled per-block dots via block-diagonal activations.

    xbd_* [B*KB_TILE, TKB]: row r = kb*B + b holds x[b, block kb] (zeros
    elsewhere), built OUTSIDE the kernel per k-tile (tiny: B*K values).
    P = xbd @ w -> [B*KB, TN] per-block partials; scale rows by sc[kb, tn]
    replicated over b (one multiply per partial), reduce kb via an MXU dot
    with a 0/1 selector.
    """
    _init(acc)
    byte = qs[...]
    hi16f = (byte & jnp.int8(-16)).astype(jnp.bfloat16)
    lof = byte.astype(jnp.bfloat16) - hi16f
    p_lo = jax.lax.dot(
        xbd_lo[...].astype(jnp.bfloat16), lof,
        preferred_element_type=jnp.float32,
    )  # [B*KB, TN]
    p_hi = jax.lax.dot(
        xbd_hi[...].astype(jnp.bfloat16), hi16f,
        preferred_element_type=jnp.float32,
    )
    rbk, tn = p_lo.shape
    kb = rbk // B
    # replicate scales over the b sub-rows: s_rep[kb*B+b, tn] = sc[kb, tn]
    rep_t = (
        jax.lax.broadcasted_iota(jnp.int32, (rbk, kb), 0) // B
        == jax.lax.broadcasted_iota(jnp.int32, (rbk, kb), 1)
    ).astype(jnp.bfloat16)  # [B*KB, KB] replication matrix
    s_lo = jax.lax.dot(
        rep_t, sc_lo[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # [B*KB, TN]
    s_hi = jax.lax.dot(
        rep_t, sc_hi[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    scaled = p_lo * s_lo + p_hi * s_hi  # [B*KB, TN]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (B, rbk), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (B, rbk), 1) % B
    ).astype(jnp.bfloat16)  # [B, B*KB]
    acc[...] += jax.lax.dot(
        sel, scaled.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    _epi(o, acc)


def build_xbd(x_half, tkb):
    """[B, Khalf] -> [Khalf//tkb, KB*B, tkb] block-diagonal tiles (XLA side)."""
    b, khalf = x_half.shape
    kb = tkb // QBLOCK
    nk = khalf // tkb
    xt = x_half.reshape(b, nk, kb, QBLOCK)
    out = jnp.zeros((nk, kb, b, kb, QBLOCK), x_half.dtype)
    ii = jnp.arange(kb)
    # advanced indices on axes 1 and 3 (non-adjacent) move to the front:
    # value shape must be [kb, nk, b, QBLOCK]
    out = out.at[:, ii, :, ii, :].set(jnp.moveaxis(xt, (2, 1, 0), (0, 1, 2)))
    return out.reshape(nk, kb * b, tkb)


def call(kernel, x, qs, scales, tkb, tn, outsc=False):
    b, k = x.shape
    n = qs.shape[1]
    nk = (k // 2) // tkb
    kb = tkb // QBLOCK
    if outsc:
        xbd_lo = build_xbd(x[:, : k // 2], tkb)  # [nk, KB*B, tkb]
        xbd_hi = build_xbd(x[:, k // 2 :], tkb)
        xspecs = [
            pl.BlockSpec((None, kb * B, tkb), lambda j, kk: (kk, 0, 0)),
            pl.BlockSpec((None, kb * B, tkb), lambda j, kk: (kk, 0, 0)),
        ]
        xargs = [xbd_lo, xbd_hi]
    else:
        xspecs = [
            pl.BlockSpec((B, tkb), lambda j, kk: (0, kk)),
            pl.BlockSpec((B, tkb), lambda j, kk, nk=nk: (0, kk + nk)),
        ]
        xargs = [x, x]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n // tn, nk),
            in_specs=xspecs
            + [
                pl.BlockSpec((tkb, tn), lambda j, kk: (kk, j)),
                pl.BlockSpec((kb, tn), lambda j, kk: (kk, j)),
                pl.BlockSpec((kb, tn), lambda j, kk, nk=nk: (kk + nk, j)),
            ],
            out_specs=pl.BlockSpec((B, tn), lambda j, kk: (0, j)),
            scratch_shapes=[pltpu.VMEM((B, tn), jnp.float32)],
        ),
        compiler_params=PARAMS,
    )(*xargs, qs, scales, scales)


def main():
    print("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)
    for k, n, label in [
        (2048, 16384, "gate_up"),
        (8192, 2048, "w_down"),
        (2048, 129024, "lm_head(pad)"),
    ]:
        ks = iter(jax.random.split(jax.random.fold_in(key, k * 7 + n), 8))
        x = jax.random.normal(next(ks), (B, k), jnp.bfloat16)
        qs = jax.random.randint(next(ks), (k // 2, n), -128, 128, jnp.int32).astype(jnp.int8)
        scales = jax.random.uniform(next(ks), (k // QBLOCK, n), jnp.float32) * 0.004
        bytes_ = qs.size + scales.size * 4
        print(f"--- {label} K={k} N={n} ({bytes_/1e6:.1f} MB)")
        if k == 2048:  # one-time parity: outsc must match vab bit-for-bit-ish
            y_vab = call(_vab_kernel, x, qs, scales, 512, 256)
            y_out = call(_outsc_kernel, x, qs, scales, 512, 256, outsc=True)
            err = float(
                jnp.max(jnp.abs(y_vab.astype(jnp.float32) - y_out.astype(jnp.float32)))
                / (jnp.max(jnp.abs(y_vab.astype(jnp.float32))) + 1e-9)
            )
            print(f"    outsc-vs-vab rel err: {err:.2e}")
        for tkb, tn in [(512, 256), (1024, 512), (1024, 1024), (1024, 2048)]:
            if (k // 2) % tkb or n % tn:
                continue
            for vname, kern, outsc in [
                ("vab", _vab_kernel, False),
                ("floor", _floor_kernel, False),
                ("outsc", _outsc_kernel, True),
            ]:
                bench(
                    f"{vname} {tkb}x{tn}",
                    lambda c, w, s, kern=kern, tkb=tkb, tn=tn, outsc=outsc: call(
                        kern, c, w, s, tkb, tn, outsc
                    ),
                    x,
                    (qs, scales),
                    bytes_,
                )


if __name__ == "__main__":
    main()
