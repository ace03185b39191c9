"""Probe the v3 bit-decode q4 container: int32-typed words, nibbles placed
so that ((w << s) & 0x00780078) | 0x40004000 bitcast to bf16 yields
2 + q/8 per value — no int8->bf16 casts at all (the casts are ~50 us of the
92 us gate_up kernel; int32 shift/and/or lower natively on Mosaic).

Each int32 word holds 8 nibbles = 8 weights, split into 4 "planes" (one per
byte-position x nibble-position), each decoding a contiguous k-quarter:
  plane 0: lo nibble of bytes 0/2  -> shift <<3
  plane 1: lo nibble of bytes 1/3  -> shift >>5
  plane 2: hi nibble of bytes 0/2  -> shift >>1
  plane 3: hi nibble of bytes 1/3  -> shift >>9
Halfword h of word (s, l) becomes bf16 row (2s + h) after pltpu.bitcast
(verified by the parity check below; the packer adapts if the order is
swapped).

Checks parity against a numpy reference, then times it at the gate_up and
lm_head shapes vs the shipped vab kernel.
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


def pack_v3(q: np.ndarray, low_half_first: bool = True) -> np.ndarray:
    """q [K, N] nibbles (0..15) -> int32 [K/8, N] v3 words.

    Logical k is split into 4 contiguous quarter-planes; plane p's row r
    lives in word row r//2, halfword (r%2 if low_half_first else 1-r%2),
    byte-position (0/2 for even halfword byte... see module docstring).
    """
    k, n = q.shape
    kq = k // 4
    planes = [q[i * kq : (i + 1) * kq].astype(np.uint32) for i in range(4)]
    words = np.zeros((k // 8, n), np.uint32)
    for p, (byte_pair, nib_shift) in enumerate(
        [(0, 0), (1, 0), (0, 4), (1, 4)]
    ):
        pr = planes[p]  # [kq, n], rows r -> word row r//2, half r%2
        for half in (0, 1):
            rows = pr[half::2] if low_half_first else pr[1 - half :: 2]
            # byte index inside the word: half*2 + byte_pair
            bit = (half * 2 + byte_pair) * 8 + nib_shift
            words[: rows.shape[0]] |= rows << bit
    return words.view(np.int32)


def _v3_kernel(x0, x1, x2, x3, q32_ref, s0, s1, s2, s3, o_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q32_ref[...]
    hdr = jnp.int32(0x40004000)
    msk = jnp.int32(0x00780078)

    def plane(shifted):
        return pltpu.bitcast((shifted & msk) | hdr, jnp.bfloat16)

    ws = [
        plane(w << 3),
        plane(w >> 5),
        plane(w >> 1),
        plane(w >> 9),
    ]
    xs = [x0, x1, x2, x3]
    ss = [s0, s1, s2, s3]
    for xr, wr, sr in zip(xs, ws, ss):
        tk, tn = wr.shape
        wsc = (
            wr.reshape(tk // QBLOCK, QBLOCK, tn)
            * sr[...][:, None, :].astype(jnp.bfloat16)
        ).reshape(tk, tn)
        acc_ref[...] += jax.lax.dot(
            xr[...].astype(jnp.bfloat16), wsc,
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def v3_matmul(x, q32, scales, tw, tn):
    """x [B, K] @ v3 container. scales [K/32, N] in plane-major k order
    (same as natural order: planes ARE contiguous k quarters)."""
    b, k = x.shape
    n = q32.shape[1]
    nw = k // 8  # word rows
    nk = nw // tw
    kp = k // 4  # plane length
    tkp = 2 * tw  # k-rows per plane per tile
    kb = tkp // QBLOCK
    xspecs = [
        pl.BlockSpec((b, tkp), lambda j, kk, p=p, nk=nk: (0, kk + p * nk))
        for p in range(4)
    ]
    sspecs = [
        pl.BlockSpec((kb, tn), lambda j, kk, p=p, nk=nk: (kk + p * nk, j))
        for p in range(4)
    ]
    return pl.pallas_call(
        _v3_kernel,
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
        compiler_params=PARAMS,
    )(x, x, x, x, q32, scales, scales, scales, scales)


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
    except Exception as e:  # noqa: BLE001
        print(f"{name:>18}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return
    per = (t2 - t1) / n * 1e6
    ideal = bytes_touched / (GBPS * 1e3)
    print(f"{name:>18}: {per:7.1f} us  ideal {ideal:6.1f}  ({per/ideal:4.2f}x)",
          flush=True)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # --- parity at a small shape -------------------------------------------
    k, n = 2048, 1024
    q = rng.integers(0, 16, (k, n), dtype=np.uint8)
    scales = (rng.random((k // QBLOCK, n)) * 0.01).astype(np.float32)
    x = rng.standard_normal((B, k)).astype(np.float32)
    # reference: value = s * (2 + q/8)
    vals = 2.0 + q.astype(np.float32) / 8.0
    wref = vals * np.repeat(scales, QBLOCK, axis=0)
    ref = x.astype(np.float32) @ wref

    xj = jnp.asarray(x, jnp.bfloat16)
    sj = jnp.asarray(scales)
    for order in (True, False):
        q32 = jnp.asarray(pack_v3(q, low_half_first=order))
        try:
            out = np.asarray(
                v3_matmul(xj, q32, sj, tw=128, tn=512), np.float32
            )
        except Exception as e:  # noqa: BLE001
            print(f"order low_half_first={order}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")
            continue
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"order low_half_first={order}: rel err {rel:.3e}")

    # --- speed at the hot shapes -------------------------------------------
    for k, n, tw, tn, label in [
        (2048, 16384, 256, 1024, "gate_up"),
        (8192, 2048, 256, 1024, "w_down"),
        (2048, 129024, 256, 512, "lm_head"),
    ]:
        q = rng.integers(0, 16, (k, n), dtype=np.uint8)
        q32 = jnp.asarray(pack_v3(q))
        scales = jnp.asarray(
            (rng.random((k // QBLOCK, n)) * 0.01).astype(np.float32)
        )
        x = jnp.asarray(rng.standard_normal((B, k)), jnp.bfloat16)
        bytes_ = q32.size * 4 + scales.size * 4
        bench(f"v3 {label}", lambda c, w, s, tw=tw, tn=tn: v3_matmul(c, w, s, tw, tn),
              x, (q32, scales), bytes_)


if __name__ == "__main__":
    main()
