"""Probe: ONE Pallas kernel for the whole q4 MLP of a layer —
    y = (silu(x @ Wg) * (x @ Wu)) @ Wd
with all three weights streamed from the stacked layer arrays (layer index
via scalar prefetch) and the [B, F] activation living only in VMEM.

Motivation (profile_decode, v5e 1B q4 b8): gate_up 64 us/call + w_down
33 us/call = 97 us/layer vs ~46 us of HBM bytes. Two kernels pay two
pipeline fills, an HBM round-trip of the [B, 2F] intermediate, and w_down
runs 1.7x over its standalone time in-graph. One kernel with a single
F-tile grid overlaps everything.

Grid: (F/2 / TFB,) sequential. Step kk covers down-projection byte rows
[kk*TFB, (kk+1)*TFB) = ffn k-ranges [flo, flo+TFB) (low nibbles) and
[F/2+flo, ...) (high nibbles), so it needs gate/up column tiles at BOTH
ranges: 4 gate/up byte tiles -> 8 half-dots -> silu/mul -> 2 down dots into
a [B, H] f32 accumulator. Mins corrections: gate/up use x block-sums
computed outside; down uses block-sums of the in-kernel activation,
produced with a selector-matrix MXU dot (in-kernel lane reshapes are not
available on Mosaic).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 32


def _deq_half(byte, sc_lo, sc_hi):
    """v2 container byte tile [TK, TN] -> (w_lo, w_hi) bf16 scaled."""
    hi16f = (byte & jnp.int8(-16)).astype(jnp.bfloat16)
    lof = byte.astype(jnp.bfloat16) - hi16f

    def scl(w, sc):
        tk, tn = w.shape
        return (
            w.reshape(tk // QBLOCK, QBLOCK, tn)
            * sc[...][:, None, :].astype(jnp.bfloat16)
        ).reshape(tk, tn)

    return scl(lof, sc_lo), scl(hi16f, sc_hi)


def _mlp_kernel(
    lref, x_ref, bs_ref,
    ggl_ref, ggh_ref, gul_ref, guh_ref,  # 4 gate/up byte tiles [KB, TFB]
    sgl_lo, sgl_hi, sgh_lo, sgh_hi,      # gate scales lo/hi-k per col tile
    sul_lo, sul_hi, suh_lo, suh_hi,      # up scales
    mgl_lo, mgl_hi, mgh_lo, mgh_hi,      # gate mins
    mul_lo, mul_hi, muh_lo, muh_hi,      # up mins
    dn_ref,                              # down byte tile [TFB, H]
    dsl_ref, dsh_ref, dml_ref, dmh_ref,  # down scales/mins lo/hi rows
    o_ref, acc_ref,
    *, kb: int, tfb: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b, k = x_ref.shape
    x_lo = x_ref[:, : k // 2].astype(jnp.bfloat16)
    x_hi = x_ref[:, k // 2 :].astype(jnp.bfloat16)
    bs = bs_ref[...]  # [K/32, B] f32 block sums of x (transposed)
    bs_lo, bs_hi = bs[: kb // 2], bs[kb // 2 :]

    def col_tile(byte_ref, sc_lo, sc_hi, mn_lo, mn_hi):
        w_lo, w_hi = _deq_half(byte_ref[...], sc_lo[...], sc_hi[...])
        acc = jax.lax.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
        acc += jax.lax.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
        acc -= jax.lax.dot_general(
            bs_lo, mn_lo[...].astype(jnp.float32),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc -= jax.lax.dot_general(
            bs_hi, mn_hi[...].astype(jnp.float32),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return acc  # [B, TFB] f32

    g_lo = col_tile(ggl_ref, sgl_lo, sgl_hi, mgl_lo, mgl_hi)
    g_hi = col_tile(ggh_ref, sgh_lo, sgh_hi, mgh_lo, mgh_hi)
    u_lo = col_tile(gul_ref, sul_lo, sul_hi, mul_lo, mul_hi)
    u_hi = col_tile(guh_ref, suh_lo, suh_hi, muh_lo, muh_hi)

    a_lo = (jax.nn.silu(g_lo) * u_lo).astype(jnp.bfloat16)  # [B, TFB]
    a_hi = (jax.nn.silu(g_hi) * u_hi).astype(jnp.bfloat16)

    # block sums of the activations via a selector-matrix dot (no in-kernel
    # lane reshapes on Mosaic): S[i, j] = (i // 32 == j)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (tfb, tfb // QBLOCK), 0) // QBLOCK
        == jax.lax.broadcasted_iota(jnp.int32, (tfb, tfb // QBLOCK), 1)
    ).astype(jnp.bfloat16)
    bsa_lo = jax.lax.dot(a_lo, sel, preferred_element_type=jnp.float32)
    bsa_hi = jax.lax.dot(a_hi, sel, preferred_element_type=jnp.float32)

    w_dn_lo, w_dn_hi = _deq_half(dn_ref[...], dsl_ref[...], dsh_ref[...])
    acc_ref[...] += jax.lax.dot(a_lo, w_dn_lo, preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot(a_hi, w_dn_hi, preferred_element_type=jnp.float32)
    acc_ref[...] -= jax.lax.dot(
        bsa_lo.astype(jnp.float32), dml_ref[...].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] -= jax.lax.dot(
        bsa_hi.astype(jnp.float32), dmh_ref[...].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tfb", "interpret"))
def fused_mlp(x, layer, gu_qs, gu_sc, gu_mn, dn_qs, dn_sc, dn_mn,
              tfb=256, interpret=False):
    """x [B, K] -> [B, H]; stacked arrays gu_qs [L, K/2, 2F] (gate|up),
    dn_qs [L, F/2, H], scales/mins [L, K/32, 2F] / [L, F/32, H]."""
    b, k = x.shape
    l, kbyte, f2 = gu_qs.shape
    f = f2 // 2
    h = dn_qs.shape[2]
    kb = k // QBLOCK
    fb2 = tfb // QBLOCK  # scale rows per down tile half
    n_half = (f // 2) // tfb  # grid length
    bsums = jnp.sum(
        x.astype(jnp.float32).reshape(b, kb, QBLOCK), axis=-1
    ).T  # [K/32, B]
    larr = jnp.asarray(layer, jnp.int32).reshape(1)

    # column offsets (in tfb units) for the 4 gate/up tiles at step kk:
    # gate-lo: kk                      gate-hi: kk + (F/2)/tfb
    # up-lo:   kk + F/tfb              up-hi:   kk + (3F/2)/tfb
    offs = [0, (f // 2) // tfb, f // tfb, (3 * f // 2) // tfb]

    def gu_q_spec(o):
        return pl.BlockSpec(
            (None, kbyte, tfb), lambda kk, lr, o=o: (lr[0], 0, kk + o)
        )

    def gu_s_spec(o, hi):
        # scale rows: lo-k rows [0, kb/2), hi-k rows [kb/2, kb)
        ro = 0 if not hi else (kb // 2) // (kb // 2)  # row-block index below
        return pl.BlockSpec(
            (None, kb // 2, tfb),
            lambda kk, lr, o=o, ro=(1 if hi else 0): (lr[0], ro, kk + o),
        )

    in_specs = [pl.BlockSpec((b, k), lambda kk, lr: (0, 0)),
                pl.BlockSpec((kb, b), lambda kk, lr: (0, 0))]
    args = [larr, x, bsums]
    for o in offs:  # 4 byte tiles
        in_specs.append(gu_q_spec(o))
        args.append(gu_qs)
    for o in offs:  # scales lo+hi per tile
        in_specs.append(gu_s_spec(o, False))
        args.append(gu_sc)
        in_specs.append(gu_s_spec(o, True))
        args.append(gu_sc)
    for o in offs:  # mins lo+hi per tile
        in_specs.append(gu_s_spec(o, False))
        args.append(gu_mn)
        in_specs.append(gu_s_spec(o, True))
        args.append(gu_mn)
    # down byte tile + scales/mins rows (lo rows kk, hi rows kk + (F/2)/tfb
    # in fb2-row units)
    in_specs.append(
        pl.BlockSpec((None, tfb, h), lambda kk, lr: (lr[0], kk, 0))
    )
    args.append(dn_qs)
    hi_off = (f // 2) // tfb
    for arr in (dn_sc, dn_mn):
        in_specs.append(
            pl.BlockSpec((None, fb2, h), lambda kk, lr: (lr[0], kk, 0))
        )
        args.append(arr)
        in_specs.append(
            pl.BlockSpec(
                (None, fb2, h), lambda kk, lr, o=hi_off: (lr[0], kk + o, 0)
            )
        )
        args.append(arr)
    # reorder: (dn_sc lo, dn_sc hi, dn_mn lo, dn_mn hi) matches kernel
    return pl.pallas_call(
        functools.partial(_mlp_kernel, kb=kb, tfb=tfb),
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_half,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((b, h), lambda kk, lr: (0, 0)),
            scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * f2 + 2 * b * f * h,
            bytes_accessed=kbyte * f2 + (f // 2) * h
            + (kb * f2 + (f // QBLOCK) * h) * 8,
            transcendentals=b * f,
        ),
        interpret=interpret,
    )(*args)


def reference(x, layer, gu_qs, gu_sc, gu_mn, dn_qs, dn_sc, dn_mn):
    """Two-kernel reference via the shipped layered matmuls."""
    from nfai_tpu.ops.qmatmul import qmatmul_layered
    from nfai_tpu.ops.qtensor import QTensor

    k = x.shape[1]
    f2 = gu_qs.shape[2]
    f = f2 // 2
    h = dn_qs.shape[2]
    gu = QTensor(gu_qs, gu_sc, gu_mn, "q4", k, f2)
    dn = QTensor(dn_qs, dn_sc, dn_mn, "q4", f, h)
    y = qmatmul_layered(x, gu, layer)
    a = jax.nn.silu(y[..., :f]) * y[..., f:]
    return qmatmul_layered(a.astype(jnp.bfloat16), dn, layer)


def sync(v):
    return np.asarray(jnp.sum(v.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tfb", type=int, default=256)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    interp = jax.default_backend() == "cpu"
    print("device:", jax.devices()[0])

    rng = np.random.default_rng(0)
    B, K, F, H, L = 8, 2048, 8192, 2048, 16
    gu_qs = jnp.asarray(rng.integers(-128, 128, (L, K // 2, 2 * F), np.int8))
    gu_sc = jnp.asarray((rng.random((L, K // 32, 2 * F)) * 0.01).astype(np.float32))
    gu_mn = jnp.asarray((rng.random((L, K // 32, 2 * F)) * 0.02).astype(np.float32))
    dn_qs = jnp.asarray(rng.integers(-128, 128, (L, F // 2, H), np.int8))
    dn_sc = jnp.asarray((rng.random((L, F // 32, H)) * 0.01).astype(np.float32))
    dn_mn = jnp.asarray((rng.random((L, F // 32, H)) * 0.02).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)

    ref = np.asarray(
        reference(x, jnp.int32(3), gu_qs, gu_sc, gu_mn, dn_qs, dn_sc, dn_mn),
        np.float32,
    )
    got = np.asarray(
        fused_mlp(x, jnp.int32(3), gu_qs, gu_sc, gu_mn, dn_qs, dn_sc, dn_mn,
                  tfb=args.tfb, interpret=interp),
        np.float32,
    )
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"parity vs two-kernel path: rel err {rel:.3e}")
    if interp:
        return

    # timing: scan-chained like the model (weights as jit ARGUMENTS — the
    # axon remote-compile service 413s on >100MB captured constants)
    @functools.partial(jax.jit, static_argnames=("m",))
    def chain(x0, ws, m):
        def body(c, i):
            y = fused_mlp(c, i % L, *ws, tfb=args.tfb)
            bump = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(c.dtype)
            return c + bump, ()

        c, _ = jax.lax.scan(body, x0, jnp.arange(m, dtype=jnp.int32))
        return c

    @functools.partial(jax.jit, static_argnames=("m",))
    def chain2(x0, ws, m):
        def body(c, i):
            y = reference(c, i % L, *ws)
            bump = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(c.dtype)
            return c + bump, ()

        c, _ = jax.lax.scan(body, x0, jnp.arange(m, dtype=jnp.int32))
        return c

    bytes_layer = (
        gu_qs.nbytes + gu_sc.nbytes + gu_mn.nbytes
        + dn_qs.nbytes + dn_sc.nbytes + dn_mn.nbytes
    ) // L
    ideal = bytes_layer / (args.hbm_gbps * 1e3)
    ws = (gu_qs, gu_sc, gu_mn, dn_qs, dn_sc, dn_mn)

    def timed(fn, m):
        t0 = time.perf_counter()
        sync(fn(x, ws, m))
        return time.perf_counter() - t0

    for name, fn in [("fused", chain), ("2-kernel", chain2)]:
        timed(fn, 16), timed(fn, 32)  # compile
        t1 = min(timed(fn, 16) for _ in range(5))
        t2 = min(timed(fn, 32) for _ in range(5))
        per = (t2 - t1) / 16 * 1e6
        print(f"{name:>9}: {per:7.1f} us/layer  ideal {ideal:6.1f}  "
              f"({per/ideal:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
