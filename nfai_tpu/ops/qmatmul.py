"""Fused dequant-matmul Pallas kernels: y = x @ W with W quantized in HBM.

This is the TPU replacement for the reference's FP32 matvec shader
(``NFAI.Vulkan.Shaders/MatrixMultiplyShader.cs:255-289``) — there, weights
were eagerly widened to FP32 on upload (AbstractComputeCollection.cs:62-77);
here they stream from HBM in their quantized form and are dequantized in VMEM
inside the matmul k-loop, cutting decode HBM traffic ~2x (Q8_0) to ~3.5x
(Q4_K) versus bf16 weights.

Kernel structure (per ops.qtensor layouts):
- grid (N/TN, K-tiles) — N parallel, K a sequential reduction with an f32
  VMEM accumulator;
- 8-bit: w_tile = int8[TK, TN] -> bf16 * repeat(scales, 32);
- 4-bit: byte tile uint8[TKB, TN] unpacks to two contiguous k-ranges (low
  nibbles -> k, high -> k + K/2), each matmul'd against its own x slice;
- affine kinds: the per-block `mins` term is *not* in the kernel; it is the
  rank-1-per-block correction  y -= bsums @ mins  with
  bsums[b, kb] = sum of x[b, 32kb:32kb+32] (see `mins_correction`).

All matmuls specify preferred_element_type=f32 (MXU accumulates in f32).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qtensor import QBLOCK, QTensor, dequant_qtensor


# Escape hatch: force the XLA dense-dequant fallback everywhere (tests,
# debugging). The production path keeps this True — under a device mesh the
# kernels run per-shard through shard_map (see `TP_MESH` below).
KERNEL_ENABLED = True

# The engine sets this to the active jax Mesh when tensor parallelism is on.
# QTensor leaves carry their Megatron role in `tp_mode` ("col" | "row");
# qmatmul wraps the Pallas kernel in shard_map so each chip runs the fused
# dequant-matmul on its own weight shard — quantized bytes stream from local
# HBM, no dense dequant materialization (BASELINE config 5; the round-1
# fallback re-expanded weights to bf16 per matmul under a mesh).
TP_MESH = None


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests / fallback)
    return jax.default_backend() == "cpu"


def _pick_tiles(b: int, k: int, n: int) -> tuple[int, int]:
    """(TK, TN) tile sizes in k/n elements. K tiles run the reduction.
    Falls back to full-dim tiles for small/odd shapes (tiny test models).

    Tile sizing is the dominant lever on v5e (measured, qmm_probe2): the
    shipped (512, 256) tiles left gate_up at 92 us vs 25.6 ideal purely from
    per-grid-cell pipeline bubbles; (1024, 1024) runs 47.7 us and w_down
    hits its DMA roofline. Very wide N (the 128k lm_head) prefers TN=512
    (438 vs 461 us) — fewer bubbles already, smaller working set wins. The
    int8 tile is capped at 1 MB; (1024, 2048) = 2 MB regressed everywhere."""

    def pick(dim, prefs):
        for p in prefs:
            if dim % p == 0:
                return p
        return dim

    # VMEM working-set estimate (v5e limit 16 MB): quantized tile + its
    # double buffer + bf16 dequant halves ~ 6*tk*tn, activation blocks
    # (two k-halves, bf16, double-buffered) ~ 8*b*tk, f32 accumulator +
    # output ~ 6*b*tn. Decode (b<=64) gets the big tiles; prefill
    # (b = batch*chunk rows) steps down automatically.
    budget = 12 << 20
    # Wide-but-not-huge N (8B gate_up, 28672) still wants 1024-lane tiles
    # (+2.4% tok/s at 8B); only the 128k-vocab lm_head class prefers 512
    # (smaller working set wins once bubbles are already amortized).
    nprefs = (1024, 512, 256, 128) if n < 65536 else (512, 256, 128)
    if os.environ.get("NFAI_TILE_EXPERIMENT"):  # pragma: no cover - A/B knob
        budget = 40 << 20
        nprefs = (2048,) + nprefs
    kprefs = (1024, 512, 256)  # tk >= 256 keeps the scale block's sublane
    # count a multiple of 8 (group 32); the fallback below preserves the old
    # small-shape paths. Decode (small b) wants TN-major (fewer grid cells
    # along the wide N); prefill (b = batch*chunk rows) wants TK-major
    # (deeper reduction per cell — it is MXU-bound, not bubble-bound).
    outer, inner, swap = (
        (nprefs, kprefs, False) if b <= 64 else (kprefs, nprefs, True)
    )
    for t_out in outer:
        if (k if swap else n) % t_out:
            continue
        for t_in in inner:
            tk, tn = (t_out, t_in) if swap else (t_in, t_out)
            if n % tn or k % tk:
                continue
            if 6 * tk * tn + 8 * b * tk + 6 * b * tn <= budget:
                return tk, tn
    return pick(k, (512, 256, 128)), pick(n, (256, 128))


# ---------------------------------------------------------------------------
# 8-bit kernel


def _scaled_deq(q_bf16, sc, group):
    """Per-block scale multiply: [TK, TN] bf16 * [TK/g, TN] -> [TK, TN].

    The scale multiply is the dominant VPU term of every fused-dequant
    kernel: the probe anatomy (benchmarks/qmm_probe_8b.py) measured the
    v3 lm_head kernel at 633 us with the old reshape-regroup formulation
    vs 402 us with the multiply removed — exactly the DMA ideal. Expanding
    the SMALL scales array (broadcast_in_dim + merge-reshape of two sublane
    dims) instead of sublane-splitting the BIG weight array measured 541 us
    with bit-identical results (parity-gated in the probe): the weight
    regroup, not the multiply itself, was most of the cost. A
    pltpu.repeat-based expansion looked similar but has TILE-CONCAT
    semantics (copies of the whole array, not per-row repeats) and computed
    wrong values — caught by benchmarks/tpu_kernel_parity.py on silicon;
    never land a kernel "optimization" without that gate."""
    tk, tn = q_bf16.shape
    kb = sc.shape[0]
    scb = sc.astype(jnp.bfloat16)
    if tk == kb * group:
        sc_exp = jax.lax.broadcast_in_dim(
            scb, (kb, group, tn), (0, 2)
        ).reshape(tk, tn)
        return q_bf16 * sc_exp
    w = q_bf16.reshape(tk // group, group, tn) * scb[:, None, :]
    return w.reshape(tk, tn)


def _block_sums(x, group):
    """[B, TK] -> [B, TK/g] per-scale-block activation sums (f32).

    Implemented as a dot with a 0/1 block-selector matrix: Mosaic cannot
    lower the lane-splitting reshape a segment-sum would need, and the MXU
    does this for free alongside the main matmul."""
    _, tk = x.shape
    kb = tk // group
    rows = jax.lax.broadcasted_iota(jnp.int32, (tk, kb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tk, kb), 1)
    sel = (rows // group == cols).astype(jnp.bfloat16)
    return jax.lax.dot(
        x.astype(jnp.bfloat16), sel, preferred_element_type=jnp.float32
    )


def _q8_kernel(x_ref, qs_ref, sc_ref, o_ref, acc_ref, *, group):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _scaled_deq(qs_ref[...].astype(jnp.bfloat16), sc_ref[...], group)
    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16),
        w,
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _q8m_kernel(x_ref, qs_ref, sc_ref, mins_ref, o_ref, acc_ref, *, group):
    """8-bit affine: the per-block mins term (y -= bsums @ mins) is fused as a
    second tiny dot per k-tile instead of a separate XLA op chain."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _scaled_deq(qs_ref[...].astype(jnp.bfloat16), sc_ref[...], group)
    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    bs = _block_sums(x_ref[...], group)
    acc_ref[...] -= jax.lax.dot(
        bs, mins_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "group"))
def _q8_matmul(x, qs, scales, mins=None, out_dtype=jnp.bfloat16, group=QBLOCK):
    b, k = x.shape
    n = qs.shape[1]
    tk, tn = _pick_tiles(b, k, n)
    grid = (n // tn, k // tk)
    specs = [
        pl.BlockSpec((b, tk), lambda j, kk: (0, kk)),
        pl.BlockSpec((tk, tn), lambda j, kk: (kk, j)),
        pl.BlockSpec((tk // group, tn), lambda j, kk: (kk, j)),
    ]
    args = [x, qs, scales]
    if mins is not None:
        kernel = functools.partial(_q8m_kernel, group=group)
        specs.append(pl.BlockSpec((tk // group, tn), lambda j, kk: (kk, j)))
        args.append(mins)
    else:
        kernel = functools.partial(_q8_kernel, group=group)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((b, tn), lambda j, kk: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(100 << 20)
            if os.environ.get("NFAI_TILE_EXPERIMENT") else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=k * n + (k // group) * n * 4 + b * k * 2 + b * n * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)


# ---------------------------------------------------------------------------
# 4-bit kernel (split-half packed bytes)


def _q4_kernel(
    x_lo_ref, x_hi_ref, qs_ref, sc_lo_ref, sc_hi_ref, o_ref, acc_ref,
    mins_lo_ref=None, mins_hi_ref=None,
):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    byte = qs_ref[...]  # [TKB, TN] int8 container of packed nibbles
    # v2 container decode (see ops.qtensor): the high nibble is biased-signed
    # ((q-8) & 0xF) so `byte & 0xF0` IS 16*(q_hi-8) in two's complement, and
    # the low nibble falls out of a bf16 subtract. Pure AND + casts + SUB —
    # Mosaic cannot lower int8 shifts/sub/mul or uint8->float casts, and the
    # old int32 widen+shift chain made the kernel VPU-bound (104 us vs 31 us
    # HBM ideal on 2048x16384 @ v5e).
    hi16f = (byte & jnp.int8(-16)).astype(jnp.bfloat16)  # 16*(q_hi - 8)
    lof = byte.astype(jnp.bfloat16) - hi16f  # q_lo (0..15), exact
    w_lo = _scaled_deq(lof, sc_lo_ref[...], QBLOCK)
    w_hi = _scaled_deq(hi16f, sc_hi_ref[...], QBLOCK)  # scales hold the /16
    acc_ref[...] += jax.lax.dot(
        x_lo_ref[...].astype(jnp.bfloat16),
        w_lo,
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += jax.lax.dot(
        x_hi_ref[...].astype(jnp.bfloat16),
        w_hi,
        preferred_element_type=jnp.float32,
    )
    if mins_lo_ref is not None:
        acc_ref[...] -= jax.lax.dot(
            _block_sums(x_lo_ref[...], QBLOCK),
            mins_lo_ref[...],
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] -= jax.lax.dot(
            _block_sums(x_hi_ref[...], QBLOCK),
            mins_hi_ref[...],
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _q4_matmul(x, qs, scales, mins=None, out_dtype=jnp.bfloat16):
    b, k = x.shape
    n = qs.shape[1]
    tkb, tn = _pick_tiles(b, k // 2, n)  # tile in byte rows
    nk = (k // 2) // tkb  # number of k tiles (per half)
    grid = (n // tn, nk)
    specs = [
        # x low half slice [B, TKB] at k-offset kk*TKB
        pl.BlockSpec((b, tkb), lambda j, kk: (0, kk)),
        # x high half slice at k-offset K/2 + kk*TKB
        pl.BlockSpec((b, tkb), lambda j, kk, nk=nk: (0, kk + nk)),
        pl.BlockSpec((tkb, tn), lambda j, kk: (kk, j)),
        pl.BlockSpec((tkb // QBLOCK, tn), lambda j, kk: (kk, j)),
        pl.BlockSpec((tkb // QBLOCK, tn), lambda j, kk, nk=nk: (kk + nk, j)),
    ]
    args = [x, x, qs, scales, scales]
    kernel = _q4_kernel
    if mins is not None:
        specs.append(pl.BlockSpec((tkb // QBLOCK, tn), lambda j, kk: (kk, j)))
        specs.append(
            pl.BlockSpec((tkb // QBLOCK, tn), lambda j, kk, nk=nk: (kk + nk, j))
        )
        args += [mins, mins]
        kernel = functools.partial(_q4_kernel)

        def kernel(*refs):  # reorder: mins refs arrive after o/acc
            (x_lo, x_hi, qs_r, sc_lo, sc_hi, mins_lo, mins_hi, o, acc) = refs
            return _q4_kernel(
                x_lo, x_hi, qs_r, sc_lo, sc_hi, o, acc,
                mins_lo_ref=mins_lo, mins_hi_ref=mins_hi,
            )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((b, tn), lambda j, kk: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(100 << 20)
            if os.environ.get("NFAI_TILE_EXPERIMENT") else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=(k // 2) * n + (k // QBLOCK) * n * 4 + b * k * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)


# ---------------------------------------------------------------------------
# v3 bit-decode 4-bit kernel (LM head)
#
# The v2 nibble kernel's int8→bf16 casts are ~half its wall time at the
# 128k-vocab LM-head shape; the v3 container (ops.qtensor._pack_v3_words)
# places nibbles inside int32 words so that shift+AND+OR+bitcast yields
# bf16 (2 + q/8) directly — no int→float casts at all. Wins only where N is
# very wide (lm_head: 364 µs vs 438 µs, qmm_probe3); the 4-way k-split makes
# it slower at the square-ish layer shapes, which keep the v2 container.
# The per-block affine term stays OUTSIDE (mins_correction), with the +2
# header constant folded into mins by ops.qtensor.to_v3.


def _pick_v3_tiles(b: int, nw: int, n: int, wmul: int = 1) -> tuple[int, int]:
    """(TW, TN) for the v3 kernels: TW in int32 word rows (8 k elements
    each), TN in lanes. Per-grid-cell VMEM (v5e scoped limit 16 MB):
    weight int32 tile + double buffer ~8·tw·tn, four decoded bf16 planes
    ~16·tw·tn, x plane blocks (bf16, double-buffered) ~32·b·tw, f32
    accumulator + output ~6·b·tn. TW stays a multiple of 128 so each
    plane's scale block keeps ≥8 sublanes (kb = tw/16). Decode (small b)
    gets the wide tiles; prefill (b = batch·chunk rows) steps down —
    the decode-sized (256, 1024) tile at b=1024 measured 18.5 MB scoped
    and failed to compile."""
    if os.environ.get("NFAI_V3_TILES"):  # pragma: no cover - probe knob
        tw, tn = (int(t) for t in os.environ["NFAI_V3_TILES"].split(","))
        if nw % tw == 0 and n % tn == 0:
            return tw, tn
    budget = 12 << 20
    nprefs = (1024, 512, 256, 128) if n < 65536 else (512, 256, 128)
    # decode prefers deeper word tiles: (512, 512) halves the 128k-vocab
    # lm_head's grid-cell count vs (256, 512) and measured 647 -> 622 us
    # (probe8b v4; earlier runs saw up to 9%). The VMEM budget check below
    # still steps 512 down wherever it does not fit (q8v3's wmul=2, or
    # tn=1024 shapes).
    wprefs = (512, 256, 128) if b <= 64 else (256, 128)
    outer, inner, swap = (
        (nprefs, wprefs, False) if b <= 64 else (wprefs, nprefs, True)
    )
    for t_out in outer:
        if (nw if swap else n) % t_out:
            continue
        for t_in in inner:
            tw, tn = (t_out, t_in) if swap else (t_in, t_out)
            if n % tn or nw % tw:
                continue
            if 24 * wmul * tw * tn + 32 * b * tw + 6 * b * tn <= budget:
                return tw, tn
    return nw, n  # tiny/odd test shapes


def _q4v3_kernel(x0, x1, x2, x3, q32_ref, s0, s1, s2, s3, o_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q32_ref[...]
    hdr = jnp.int32(0x40004000)
    msk = jnp.int32(0x00780078)

    def plane(shifted):
        # [TW, TN] int32 → [2·TW, TN] bf16 (halfword h → row 2s+h)
        return pltpu.bitcast((shifted & msk) | hdr, jnp.bfloat16)

    ws = [plane(w << 3), plane(w >> 5), plane(w >> 1), plane(w >> 9)]
    for xr, wr, sr in zip((x0, x1, x2, x3), ws, (s0, s1, s2, s3)):
        acc_ref[...] += jax.lax.dot(
            xr[...].astype(jnp.bfloat16),
            _scaled_deq(wr, sr[...], QBLOCK),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _q4v3_matmul(x, q32, scales, out_dtype=jnp.bfloat16):
    """x [B, K] @ v3 container (q32 [K/8, N] int32, scales [K/32, N] in
    natural k order — the 4 planes ARE contiguous k quarters)."""
    b, k = x.shape
    n = q32.shape[1]
    nw = k // 8  # int32 word rows
    tw, tn = _pick_v3_tiles(b, nw, n)
    nk = nw // tw
    tkp = 2 * tw  # k rows per plane per tile
    kb = tkp // QBLOCK  # scale rows per plane per tile
    xspecs = [
        pl.BlockSpec((b, tkp), lambda j, kk, p=p, nk=nk: (0, kk + p * nk))
        for p in range(4)
    ]
    sspecs = [
        pl.BlockSpec((kb, tn), lambda j, kk, p=p, nk=nk: (kk + p * nk, j))
        for p in range(4)
    ]
    return pl.pallas_call(
        _q4v3_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
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
            vmem_limit_bytes=(100 << 20)
            if os.environ.get("NFAI_TILE_EXPERIMENT") else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=(k // 2) * n + (k // QBLOCK) * n * 4 + b * k * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, x, x, x, q32, scales, scales, scales, scales)


# ---------------------------------------------------------------------------
# layer-stacked kernels (scalar-prefetch layer index)
#
# The decode forward scans over layers; slicing each layer's quantized weight
# out of the stacked [L, ...] arrays at the XLA level copies ~45 MB/step
# (measured ~0.9 ms/step on the 1B q4 v5e profile). These variants instead
# take the FULL stacked arrays and a traced layer index: the BlockSpec index
# maps add the layer coordinate, so the kernel DMAs tiles straight from the
# stacked HBM buffer and nothing is materialized per layer. The per-block
# affine `mins` term is folded in as an extra [B, kb] x [kb, TN] MXU dot
# against activation block-sums precomputed outside (XLA fuses that reduce
# into the producer), again avoiding any XLA-level mins slice.


def _q8l_kernel(lref, x_ref, qs_ref, sc_ref, mins_ref, o_ref, acc_ref,
                *, group):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _scaled_deq(qs_ref[...].astype(jnp.bfloat16), sc_ref[...], group)
    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    if mins_ref is not None:
        # per-k-tile mins term: acc -= bsums @ mins_tile, with the
        # activation block-sums computed IN-kernel (one tiny MXU dot —
        # the old XLA reduce/transpose chains cost ~50 us/step of scanned
        # graph time; the mins block stays per-k-tile because a whole-K
        # column block made XLA re-stage the full stacked mins array into
        # alternate memory every layer iteration).
        acc_ref[...] -= jax.lax.dot(
            _block_sums(x_ref[...], group),
            mins_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _q4l_kernel(
    lref, x_lo_ref, x_hi_ref, qs_ref, sc_lo_ref,
    sc_hi_ref, mins_lo_ref, mins_hi_ref, o_ref, acc_ref,
):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    byte = qs_ref[...]
    hi16f = (byte & jnp.int8(-16)).astype(jnp.bfloat16)
    lof = byte.astype(jnp.bfloat16) - hi16f
    w_lo = _scaled_deq(lof, sc_lo_ref[...], QBLOCK)
    w_hi = _scaled_deq(hi16f, sc_hi_ref[...], QBLOCK)
    acc_ref[...] += jax.lax.dot(
        x_lo_ref[...].astype(jnp.bfloat16), w_lo,
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += jax.lax.dot(
        x_hi_ref[...].astype(jnp.bfloat16), w_hi,
        preferred_element_type=jnp.float32,
    )
    if mins_lo_ref is not None:
        # per-k-tile mins term, block-sums in-kernel (see _q8l_kernel)
        acc_ref[...] -= jax.lax.dot(
            _block_sums(x_lo_ref[...], QBLOCK),
            mins_lo_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] -= jax.lax.dot(
            _block_sums(x_hi_ref[...], QBLOCK),
            mins_hi_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "group"))
def _q8_matmul_layered(x, layer, qs, scales, mins=None,
                       out_dtype=jnp.bfloat16, group=QBLOCK):
    """x [B, K] @ qs[layer] for stacked qs [L, K, N]."""
    b, k = x.shape
    n = qs.shape[2]
    tk, tn = _pick_tiles(b, k, n)
    grid = (n // tn, k // tk)
    kb = tk // group
    has_mins = mins is not None
    specs = [
        pl.BlockSpec((b, tk), lambda j, kk, lr: (0, kk)),
        pl.BlockSpec((None, tk, tn), lambda j, kk, lr: (lr[0], kk, j)),
        pl.BlockSpec((None, kb, tn), lambda j, kk, lr: (lr[0], kk, j)),
    ]
    args = [jnp.asarray(layer, jnp.int32).reshape(1), x, qs, scales]
    if has_mins:
        # per-k-tile mins blocks, same shape/index map as the scales
        specs.append(
            pl.BlockSpec((None, kb, tn), lambda j, kk, lr: (lr[0], kk, j))
        )
        args.append(mins)
        kernel = functools.partial(_q8l_kernel, group=group)
    else:
        def kernel(lref, x_ref, qs_ref, sc_ref, o_ref, acc_ref):
            return _q8l_kernel(
                lref, x_ref, qs_ref, sc_ref, None, o_ref, acc_ref,
                group=group,
            )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((b, tn), lambda j, kk, lr: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(100 << 20)
            if os.environ.get("NFAI_TILE_EXPERIMENT") else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=k * n + (k // group) * n * 4 + b * k * 2 + b * n * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _q4_matmul_layered(x, layer, qs, scales, mins=None, out_dtype=jnp.bfloat16):
    """x [B, K] @ 4-bit stacked qs [L, K/2, N] (split-half packed)."""
    b, k = x.shape
    n = qs.shape[2]
    tkb, tn = _pick_tiles(b, k // 2, n)
    nk = (k // 2) // tkb
    grid = (n // tn, nk)
    kb = tkb // QBLOCK
    has_mins = mins is not None
    specs = [
        pl.BlockSpec((b, tkb), lambda j, kk, lr: (0, kk)),
        pl.BlockSpec((b, tkb), lambda j, kk, lr, nk=nk: (0, kk + nk)),
        pl.BlockSpec((None, tkb, tn), lambda j, kk, lr: (lr[0], kk, j)),
        pl.BlockSpec((None, kb, tn), lambda j, kk, lr: (lr[0], kk, j)),
        pl.BlockSpec((None, kb, tn), lambda j, kk, lr, nk=nk: (lr[0], kk + nk, j)),
    ]
    args = [
        jnp.asarray(layer, jnp.int32).reshape(1),
        x, x, qs, scales, scales,
    ]
    if has_mins:
        # per-k-tile mins blocks: lo half at kk, hi half at kk + nk (the
        # mins rows are in natural k order — lo rows then hi rows)
        specs.append(
            pl.BlockSpec((None, kb, tn), lambda j, kk, lr: (lr[0], kk, j))
        )
        specs.append(
            pl.BlockSpec((None, kb, tn), lambda j, kk, lr, nk=nk: (lr[0], kk + nk, j))
        )
        args += [mins, mins]
        kernel = _q4l_kernel
    else:
        def kernel(lref, xlo, xhi, qs_r, sclo, schi, o, acc):
            return _q4l_kernel(
                lref, xlo, xhi, qs_r, sclo, schi, None, None,
                o, acc,
            )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((b, tn), lambda j, kk, lr: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(100 << 20)
            if os.environ.get("NFAI_TILE_EXPERIMENT") else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=(k // 2) * n + (k // QBLOCK) * n * 4 + b * k * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)


def _q4v3l_kernel(
    lref, x0, x1, x2, x3, bs0, bs1, bs2, bs3, q32_ref,
    s0, s1, s2, s3, m0, m1, m2, m3, o_ref, acc_ref,
):
    """Layered v3 bit-decode matmul with the affine mins folded in as four
    per-plane bsums dots (same trick as _q4l_kernel; see _q4v3_kernel for
    the plane decode)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q32_ref[...]
    hdr = jnp.int32(0x40004000)
    msk = jnp.int32(0x00780078)

    def plane(shifted):
        return pltpu.bitcast((shifted & msk) | hdr, jnp.bfloat16)

    ws = [plane(w << 3), plane(w >> 5), plane(w >> 1), plane(w >> 9)]
    for xr, wr, sr, bsr, mr in zip(
        (x0, x1, x2, x3), ws, (s0, s1, s2, s3), (bs0, bs1, bs2, bs3),
        (m0, m1, m2, m3),
    ):
        acc_ref[...] += jax.lax.dot(
            xr[...].astype(jnp.bfloat16),
            _scaled_deq(wr, sr[...], QBLOCK),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] -= jax.lax.dot_general(
            bsr[...], mr[...].astype(jnp.float32),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _q4v3lb_kernel(
    lref, x0, x1, x2, x3, q32_ref,
    s0, s1, s2, s3, m0, m1, m2, m3, o_ref, acc_ref,
):
    """`_q4v3l_kernel` with the activation block-sums computed IN-kernel
    (one extra tiny MXU dot per plane) instead of as XLA reduce chains —
    removes ~50 µs/step of reduce/transpose/copy ops from the scanned
    layer graph (A/B: NFAI_INKERNEL_BSUMS=1)."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q32_ref[...]
    hdr = jnp.int32(0x40004000)
    msk = jnp.int32(0x00780078)

    def plane(shifted):
        return pltpu.bitcast((shifted & msk) | hdr, jnp.bfloat16)

    ws = [plane(w << 3), plane(w >> 5), plane(w >> 1), plane(w >> 9)]
    for xr, wr, sr, mr in zip(
        (x0, x1, x2, x3), ws, (s0, s1, s2, s3), (m0, m1, m2, m3)
    ):
        xv = xr[...]
        acc_ref[...] += jax.lax.dot(
            xv.astype(jnp.bfloat16),
            _scaled_deq(wr, sr[...], QBLOCK),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] -= jax.lax.dot(
            _block_sums(xv, QBLOCK),
            mr[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "merged"))
def _q4v3_matmul_layered(x, layer, q32, scales, mins, out_dtype=jnp.bfloat16,
                         merged=False):
    """x [B, K] @ v3 stacked container q32 [L, K/8, N] (see ops.qtensor
    to_v3_stacked). scales/mins [L, K/32, N] natural k order — the 4 decode
    planes ARE contiguous k quarters.

    `merged` (kind "q4v3m"): `scales` is the single [L, 2*K/32, N] array
    holding scale rows then min rows, and `mins` is the SAME array — the
    min BlockSpecs just index K/32 rows further down. Keeping the pair in
    one ≥64 MB array stops XLA memory-space assignment from re-staging
    the two halves into alternate memory every layer iteration
    (~1.07 GB/step of async copies on the 1B profile; see
    ops.qtensor.V3_MERGE_BYTES)."""
    b, k = x.shape
    n = q32.shape[2]
    nw = k // 8
    tw, tn = _pick_v3_tiles(b, nw, n)
    nk = nw // tw
    tkp = 2 * tw  # k rows per plane per tile
    kbp = tkp // QBLOCK  # scale/bsums rows per plane per tile
    moff = (k // QBLOCK) // kbp if merged else 0  # min rows block offset
    # in-kernel bsums (one extra tiny MXU dot per plane) measured 3026.9 ->
    # 3129.9 tok/s on the driver config vs the XLA reduce-chain version:
    # the reduce/transpose/copy ops it replaces were ~50 us/step of scanned
    # graph time. NFAI_EXTERNAL_BSUMS=1 restores the old path for A/Bs.
    inkernel_bsums = not os.environ.get("NFAI_EXTERNAL_BSUMS")
    xspecs = [
        pl.BlockSpec((b, tkp), lambda j, kk, lr, p=p, nk=nk: (0, kk + p * nk))
        for p in range(4)
    ]
    bspecs = [
        pl.BlockSpec((kbp, b), lambda j, kk, lr, p=p, nk=nk: (kk + p * nk, 0))
        for p in range(4)
    ]
    sspecs = [
        pl.BlockSpec(
            (None, kbp, tn), lambda j, kk, lr, p=p, nk=nk: (lr[0], kk + p * nk, j)
        )
        for p in range(4)
    ]
    mspecs = [
        pl.BlockSpec(
            (None, kbp, tn),
            lambda j, kk, lr, p=p, nk=nk, mo=moff: (lr[0], kk + p * nk + mo, j),
        )
        for p in range(4)
    ]
    if inkernel_bsums:
        kernel, bspecs, bargs = _q4v3lb_kernel, [], []
    else:
        kernel = _q4v3l_kernel
        bsums_t = jnp.sum(
            x.astype(jnp.float32).reshape(b, k // QBLOCK, QBLOCK), axis=-1
        ).T  # [K/32, B]
        bargs = [bsums_t] * 4
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tn, nk),
            in_specs=xspecs
            + bspecs
            + [pl.BlockSpec((None, tw, tn), lambda j, kk, lr: (lr[0], kk, j))]
            + sspecs
            + mspecs,
            out_specs=pl.BlockSpec((b, tn), lambda j, kk, lr: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=(k // 2) * n + (k // QBLOCK) * n * 8 + b * k * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x, x, x, x,
        *bargs,
        q32,
        scales, scales, scales, scales,
        mins, mins, mins, mins,
    )


def _q8v3l_kernel(
    lref, x0, x1, x2, x3, qlo_ref, qhi_ref,
    s0, s1, s2, s3, m0, m1, m2, m3,
    o_ref, acc_ref, *, group,
):
    """Layered cast-free 8-bit matmul (kind "q8v3", ops.qtensor
    to_q8v3_stacked): the lo nibbles decode with the standard 0x4000
    header (2 + ql/8), the hi nibbles with the step-2 header 0x4200
    (32 + 2·qh); the bf16 fold u0 = (hi − 50) + lo is EXACT and equals
    v/8, so each x-plane costs ONE dot against 8s·u0 — no int→float
    casts (the plain q8 kernel's int8→bf16 cast is a ~2x dequant tax)
    and no affine amplification. Symmetric kinds skip the mins dot."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wl, wh = qlo_ref[...], qhi_ref[...]
    msk = jnp.int32(0x00780078)
    hdr_lo = jnp.int32(0x40004000)
    hdr_hi = jnp.int32(_HI_HDR)
    off = jnp.bfloat16(50)

    def u0(p):
        lo = pltpu.bitcast((_shift(wl, p) & msk) | hdr_lo, jnp.bfloat16)
        hi = pltpu.bitcast((_shift(wh, p) & msk) | hdr_hi, jnp.bfloat16)
        return (hi - off) + lo  # exact: v/8 ∈ [−16, 15.875]

    for p, (xr, sr, mr) in enumerate(zip(
        (x0, x1, x2, x3), (s0, s1, s2, s3), (m0, m1, m2, m3)
    )):
        xv = xr[...]
        acc_ref[...] += jax.lax.dot(
            xv.astype(jnp.bfloat16),
            _scaled_deq(u0(p), sr[...], group),
            preferred_element_type=jnp.float32,
        )
        if mr is not None:
            acc_ref[...] -= jax.lax.dot(
                _block_sums(xv, group),
                mr[...].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


_HI_HDR = 0x42004200  # must match ops.qtensor.V3_HI_HDR
_V3_PLANE_SHIFTS = (3, -5, -1, -9)


def _shift(w, p):
    s = _V3_PLANE_SHIFTS[p]
    return (w << s) if s > 0 else (w >> -s)


@functools.partial(jax.jit, static_argnames=("out_dtype", "group"))
def _q8v3_matmul_layered(x, layer, q32, scales, mins=None,
                         out_dtype=jnp.bfloat16, group=QBLOCK):
    """x [B, K] @ q8v3 stacked container: q32 [L, K/4, N] int32 (lo word
    rows [0, K/8) then hi rows), scales [L, K/group, N] effective 8s,
    mins [L, K/group, N] or None. See ops.qtensor.to_q8v3_stacked."""
    b, k = x.shape
    n = q32.shape[2]
    nw = k // 8  # word rows per nibble set
    tw, tn = _pick_v3_tiles(b, nw, n, wmul=2)
    nk = nw // tw
    tkp = 2 * tw  # k rows per plane per tile
    kbp = tkp // group  # scale rows per plane per tile
    has_mins = mins is not None
    xspecs = [
        pl.BlockSpec((b, tkp), lambda j, kk, lr, p=p, nk=nk: (0, kk + p * nk))
        for p in range(4)
    ]
    wspecs = [
        pl.BlockSpec((None, tw, tn), lambda j, kk, lr: (lr[0], kk, j)),
        pl.BlockSpec((None, tw, tn), lambda j, kk, lr, nk=nk: (lr[0], kk + nk, j)),
    ]
    sspecs = [
        pl.BlockSpec(
            (None, kbp, tn),
            lambda j, kk, lr, p=p, nk=nk: (lr[0], kk + p * nk, j),
        )
        for p in range(4)
    ]
    if has_mins:
        kernel = functools.partial(_q8v3l_kernel, group=group)
        margs, mspecs = [mins] * 4, sspecs
    else:
        def kernel(lref, x0, x1, x2, x3, qlo, qhi, s0, s1, s2, s3, o, acc):
            return _q8v3l_kernel(
                lref, x0, x1, x2, x3, qlo, qhi, s0, s1, s2, s3,
                None, None, None, None, o, acc, group=group,
            )
        margs, mspecs = [], []
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // tn, nk),
            in_specs=xspecs + wspecs + sspecs + mspecs,
            out_specs=pl.BlockSpec((b, tn), lambda j, kk, lr: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=k * n
            + (k // group) * n * 4 * (2 if has_mins else 1) + b * k * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x, x, x, x,
        q32, q32,
        scales, scales, scales, scales,
        *margs,
    )


def _densel_kernel(lref, x_ref, w_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # no downcast: bf16 operands hit the MXU natively; f32 (tests, f32
    # activations) keeps full precision instead of silently rounding
    acc_ref[...] += jax.lax.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _dense_matmul_layered(x, layer, w, out_dtype=jnp.bfloat16):
    """x [B, K] @ w[layer] for stacked dense w [L, K, N] — reads the layer's
    tiles straight from the stacked HBM buffer (no XLA-level slice copy)."""
    b, k = x.shape
    n = w.shape[2]
    tk, tn = _pick_tiles(b, k, n)
    grid = (n // tn, k // tk)
    return pl.pallas_call(
        _densel_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, tk), lambda j, kk, lr: (0, kk)),
                pl.BlockSpec((None, tk, tn), lambda j, kk, lr: (lr[0], kk, j)),
            ],
            out_specs=pl.BlockSpec((b, tn), lambda j, kk, lr: (0, j)),
            scratch_shapes=[pltpu.VMEM((b, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(100 << 20)
            if os.environ.get("NFAI_TILE_EXPERIMENT") else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=k * n * 2 + b * k * 2 + b * n * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, w)


# ---------------------------------------------------------------------------
# grouped (MoE expert) quantized matmul
#
# `qmatmul_grouped` contracts row blocks of x against PER-BLOCK-selected
# expert weights from a stacked [G, ...] container: the same layered-kernel
# machinery, but the scalar-prefetch channel carries an [M/tm] block→group
# index array instead of one layer id. Callers lay x out so every tm-row
# block belongs to exactly ONE group (group-aligned padding — see
# models.llama._moe_ffn_grouped_q): megablox-style grouped matmul semantics
# with none of the partial-block bookkeeping, at a worst-case cost of tm-1
# padding rows per active group. Weight traffic per active group ==
# ceil(rows_g / tm) fetches of its tiles — for decode (rows_g ~ batch) that
# is the one-fetch-per-hit-expert optimum.


def _grouped_call(kernel, args, specs, tm, n, tn, grid, out_dtype,
                  cost_bytes, flops):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((args[1].shape[0], n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((tm, tn), lambda mi, j, kk, lr: (mi, j)),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(100 << 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=cost_bytes, transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)


def _q8g_kernel(gref, x_ref, qs_ref, sc_ref, mins_ref, o_ref, acc_ref,
                *, group):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = _scaled_deq(qs_ref[...].astype(jnp.bfloat16), sc_ref[...], group)
    acc_ref[...] += jax.lax.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )
    if mins_ref is not None:
        acc_ref[...] -= jax.lax.dot(
            _block_sums(x_ref[...], group),
            mins_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _q4g_kernel(
    gref, x_lo_ref, x_hi_ref, qs_ref, sc_lo_ref, sc_hi_ref,
    mins_lo_ref, mins_hi_ref, o_ref, acc_ref,
):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    byte = qs_ref[...]
    hi16f = (byte & jnp.int8(-16)).astype(jnp.bfloat16)
    lof = byte.astype(jnp.bfloat16) - hi16f
    w_lo = _scaled_deq(lof, sc_lo_ref[...], QBLOCK)
    w_hi = _scaled_deq(hi16f, sc_hi_ref[...], QBLOCK)
    acc_ref[...] += jax.lax.dot(
        x_lo_ref[...].astype(jnp.bfloat16), w_lo,
        preferred_element_type=jnp.float32,
    )
    acc_ref[...] += jax.lax.dot(
        x_hi_ref[...].astype(jnp.bfloat16), w_hi,
        preferred_element_type=jnp.float32,
    )
    if mins_lo_ref is not None:
        acc_ref[...] -= jax.lax.dot(
            _block_sums(x_lo_ref[...], QBLOCK),
            mins_lo_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] -= jax.lax.dot(
            _block_sums(x_hi_ref[...], QBLOCK),
            mins_hi_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "out_dtype"))
def _qmatmul_grouped_q4(x, block_group, qs, scales, mins=None, tm=8,
                        out_dtype=jnp.bfloat16):
    """x [M, K] (M % tm == 0) against stacked 4-bit qs [G, K/2, N]; row
    block i uses group block_group[i]."""
    m, k = x.shape
    n = qs.shape[2]
    tkb, tn = _pick_tiles(tm, k // 2, n)
    nk = (k // 2) // tkb
    grid = (m // tm, n // tn, nk)
    kb = tkb // QBLOCK
    has_mins = mins is not None
    specs = [
        pl.BlockSpec((tm, tkb), lambda mi, j, kk, lr: (mi, kk)),
        pl.BlockSpec((tm, tkb), lambda mi, j, kk, lr, nk=nk: (mi, kk + nk)),
        pl.BlockSpec((None, tkb, tn), lambda mi, j, kk, lr: (lr[mi], kk, j)),
        pl.BlockSpec((None, kb, tn), lambda mi, j, kk, lr: (lr[mi], kk, j)),
        pl.BlockSpec(
            (None, kb, tn), lambda mi, j, kk, lr, nk=nk: (lr[mi], kk + nk, j)
        ),
    ]
    args = [jnp.asarray(block_group, jnp.int32), x, x, qs, scales, scales]
    if has_mins:
        specs.append(
            pl.BlockSpec((None, kb, tn), lambda mi, j, kk, lr: (lr[mi], kk, j))
        )
        specs.append(
            pl.BlockSpec(
                (None, kb, tn),
                lambda mi, j, kk, lr, nk=nk: (lr[mi], kk + nk, j),
            )
        )
        args += [mins, mins]
        kernel = _q4g_kernel
    else:
        def kernel(gref, xlo, xhi, qs_r, sclo, schi, o, acc):
            return _q4g_kernel(
                gref, xlo, xhi, qs_r, sclo, schi, None, None, o, acc
            )
    return _grouped_call(
        kernel, args, specs, tm, n, tn, grid, out_dtype,
        cost_bytes=(k // 2) * n + (k // QBLOCK) * n * 4 + m * k * 2,
        flops=2 * m * k * n // max(1, qs.shape[0]),
    )


@functools.partial(jax.jit, static_argnames=("tm", "out_dtype", "group"))
def _qmatmul_grouped_q8(x, block_group, qs, scales, mins=None, tm=8,
                        out_dtype=jnp.bfloat16, group=QBLOCK):
    """x [M, K] against stacked 8-bit qs [G, K, N]; per-block group ids."""
    m, k = x.shape
    n = qs.shape[2]
    tk, tn = _pick_tiles(tm, k, n)
    grid = (m // tm, n // tn, k // tk)
    kb = tk // group
    has_mins = mins is not None
    specs = [
        pl.BlockSpec((tm, tk), lambda mi, j, kk, lr: (mi, kk)),
        pl.BlockSpec((None, tk, tn), lambda mi, j, kk, lr: (lr[mi], kk, j)),
        pl.BlockSpec((None, kb, tn), lambda mi, j, kk, lr: (lr[mi], kk, j)),
    ]
    args = [jnp.asarray(block_group, jnp.int32), x, qs, scales]
    if has_mins:
        specs.append(
            pl.BlockSpec((None, kb, tn), lambda mi, j, kk, lr: (lr[mi], kk, j))
        )
        args.append(mins)
        kernel = functools.partial(_q8g_kernel, group=group)
    else:
        def kernel(gref, x_ref, qs_r, sc, o, acc):
            return _q8g_kernel(gref, x_ref, qs_r, sc, None, o, acc,
                               group=group)
    return _grouped_call(
        kernel, args, specs, tm, n, tn, grid, out_dtype,
        cost_bytes=k * n + (k // group) * n * 4 + m * k * 2,
        flops=2 * m * k * n // max(1, qs.shape[0]),
    )


def grouped_supported(qt: QTensor, tm: int = 8) -> bool:
    """Kernel layout check for the grouped expert matmul (stacked v2/q8)."""
    if qt.sections != 1 or qt.kind not in ("q4", "q8"):
        return False
    n_phys = qt.n if qt.qs is None else qt.qs.shape[-1]
    if n_phys != qt.n:
        return False
    if qt.kind == "q8":
        tk, _ = _pick_tiles(tm, qt.k, n_phys)
        rows = tk // qt.group
        return rows % 8 == 0 or rows == qt.k // qt.group
    tkb, _ = _pick_tiles(tm, qt.k // 2, n_phys)
    return (tkb // QBLOCK) % 8 == 0


def qmatmul_grouped(
    x: jax.Array,  # [M, K], M % tm == 0, each tm-block one group's rows
    qt: QTensor,  # stacked [G, ...] v2/q8 container
    block_group: jax.Array,  # [M/tm] int32 group id per row block
    tm: int = 8,
) -> jax.Array:
    """Group-aligned quantized grouped matmul (MoE experts): row block i of
    x contracts against expert block_group[i]'s weights. The XLA fallback
    dequantizes per block via take (correctness reference). Under an active
    TP mesh the expert stacks are GSPMD-sharded (no per-matmul shard_map
    for the grouped kernels yet) — the fallback keeps logical semantics."""
    if KERNEL_ENABLED and TP_MESH is None and grouped_supported(qt, tm):
        if qt.kind == "q8":
            y = _qmatmul_grouped_q8(
                x, block_group, qt.qs, qt.scales, qt.mins, tm=tm,
                group=qt.group,
            )
        else:
            y = _qmatmul_grouped_q4(
                x, block_group, qt.qs, qt.scales, qt.mins, tm=tm
            )
        return y[:, : qt.n]
    # fallback: dense dequant of every group, then per-block gather-dot
    from .qtensor import dequant_qtensor

    g = qt.qs.shape[0]
    dense = jnp.stack(
        [
            dequant_qtensor(
                qt.replace(
                    qs=qt.qs[i], scales=qt.scales[i],
                    mins=None if qt.mins is None else qt.mins[i],
                )
            )
            for i in range(g)
        ]
    )  # [G, K, N]
    m, k = x.shape
    xb = x.reshape(m // tm, tm, k)
    wsel = jnp.take(dense, jnp.asarray(block_group, jnp.int32), axis=0)
    y = jnp.einsum("btk,bkn->btn", xb.astype(jnp.float32),
                   wsel.astype(jnp.float32))
    return y.reshape(m, qt.n).astype(jnp.bfloat16)


def linear_layered(x: jax.Array, w, layer: jax.Array) -> jax.Array:
    """Layer-indexed dense/quantized matmul over stacked weights [L, ...]."""
    if isinstance(w, QTensor):
        return qmatmul_layered(x, w, layer)
    lead = x.shape[:-1]
    k, n = w.shape[1], w.shape[2]
    xb = x.reshape(-1, k)
    tk, tn = _pick_tiles(xb.shape[0], k, n)
    if KERNEL_ENABLED and k % tk == 0 and n % tn == 0 and tk % 128 == 0:
        y = _dense_matmul_layered(xb.astype(w.dtype), layer, w, out_dtype=x.dtype)
    else:
        y = xb @ jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
    return y.reshape(*lead, n).astype(x.dtype)


# The dequant-matmul kernels tile (K, N) but stream x as whole-[B] blocks;
# past ~1k rows the double-buffered x planes alone blow the 16 MB VMEM (a
# 2x2048-token prefill put _q4v3_matmul's scoped allocation at 68 MB —
# Mosaic stack OOM). Row counts above this split into sequential kernel
# calls; weights re-stream per chunk, but >=1024-row chunks keep the
# arithmetic intensity high enough that prefill stays compute-bound.
_MAX_KERNEL_ROWS = 1024


def _chunk_rows(call, xb: jax.Array) -> jax.Array:
    m = xb.shape[0]
    if m <= _MAX_KERNEL_ROWS:
        return call(xb)
    pieces = [
        call(xb[i : i + _MAX_KERNEL_ROWS])
        for i in range(0, m, _MAX_KERNEL_ROWS)
    ]
    return jnp.concatenate(pieces, axis=0)


def _layer_view(qt: QTensor) -> QTensor:
    """Metadata-only per-layer view of a stacked QTensor (leaves [L, ...])."""
    return qt.replace(qs=None, scales=None, mins=None)


def qmatmul_layered(
    x: jax.Array, qt: QTensor, layer: jax.Array, use_kernel: bool = True
) -> jax.Array:
    """x [..., K] @ W[layer] for a layer-stacked QTensor (leaves [L, ...]).

    The Pallas path never materializes the layer's weight: the traced layer
    index rides the scalar-prefetch channel into the BlockSpec index maps.
    Fallback (tiny shapes / disabled kernels) slices the leaves and runs the
    XLA dequant path.
    """
    lead = x.shape[:-1]
    xb = x.reshape(-1, qt.k)
    if (
        use_kernel
        and KERNEL_ENABLED
        and xb.shape[0] > _MAX_KERNEL_ROWS
        and os.environ.get("NFAI_PREFILL_DEQ", "0") != "0"
    ):
        # A/B knob (default OFF — measured a wash at 1B 2x2048: 185.4 ms
        # dense vs 183.1 ms row-chunked kernels, MFU 0.292 vs 0.296):
        # dequantize ONCE per layer (XLA) and run a dense matmul instead
        # of row-chunked fused kernels that re-stream quantized weights
        # per chunk. Kept because the break-even moves with K·N/rows;
        # decode never takes this branch.
        take = functools.partial(jax.lax.dynamic_index_in_dim,
                                 index=layer, axis=0, keepdims=False)
        sliced = qt.replace(
            qs=take(qt.qs),
            scales=take(qt.scales),
            mins=None if qt.mins is None else take(qt.mins),
        )
        y = (xb.astype(jnp.bfloat16) @ dequant_qtensor(sliced)).astype(
            jnp.bfloat16
        )
        if y.shape[-1] != qt.n:
            y = y[..., : qt.n]
        return y.reshape(*lead, qt.n)
    eligible = (
        use_kernel
        and KERNEL_ENABLED
        and qt.sections == 1
        and kernel_supported(_layer_view(qt))
    )
    if eligible:
        if qt.kind == "q8":
            call = lambda xc: _q8_matmul_layered(
                xc, layer, qt.qs, qt.scales, qt.mins, group=qt.group
            )
        elif qt.kind == "q8v3":
            call = lambda xc: _q8v3_matmul_layered(
                xc, layer, qt.qs, qt.scales, qt.mins, group=qt.group
            )
        elif qt.kind == "q4v3m":
            call = lambda xc: _q4v3_matmul_layered(
                xc, layer, qt.qs, qt.scales, qt.scales, merged=True
            )
        elif qt.kind == "q4v3":
            call = lambda xc: _q4v3_matmul_layered(
                xc, layer, qt.qs, qt.scales, qt.mins
            )
        else:
            call = lambda xc: _q4_matmul_layered(
                xc, layer, qt.qs, qt.scales, qt.mins
            )
        y = _chunk_rows(call, xb)
        if y.shape[-1] != qt.n:  # N-padded container
            y = y[..., : qt.n]
    else:
        take = functools.partial(jax.lax.dynamic_index_in_dim,
                                 index=layer, axis=0, keepdims=False)
        sliced = qt.replace(
            qs=take(qt.qs),
            scales=take(qt.scales),
            mins=None if qt.mins is None else take(qt.mins),
        )
        y = _qmatmul_local(xb, sliced, use_kernel)
    return y.reshape(*lead, qt.n)


# ---------------------------------------------------------------------------
# public API


def mins_correction(x: jax.Array, mins: jax.Array, group: int = QBLOCK) -> jax.Array:
    """y -= bsums @ mins for affine kinds: the per-block min contributes
    -min[kb, n] * sum(x block kb) to every output.

    At prefill row counts the block sums come from a selector-matrix DOT
    rather than a reshape+reduce: the reduce emitted [rows, K/32] in a
    reduction layout that XLA then relayouts ({0,1} copy) for the second
    dot — ~6 ms per 2x2048 1B prefill; the MXU dot output is already in
    dot-operand layout. Decode rows (<=64) keep the cheap VPU reduce."""
    b, k = x.shape
    if b > 256:
        kb = k // group
        rows = jax.lax.broadcasted_iota(jnp.int32, (k, kb), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (k, kb), 1)
        sel = (rows // group == cols).astype(jnp.bfloat16)
        bsums = jax.lax.dot(
            x.astype(jnp.bfloat16), sel, preferred_element_type=jnp.float32
        )
    else:
        bsums = jnp.sum(
            x.astype(jnp.float32).reshape(b, k // group, group), axis=-1
        )
    return jax.lax.dot(
        bsums, mins.astype(jnp.float32), preferred_element_type=jnp.float32
    )


def kernel_supported(qt: QTensor) -> bool:
    """Mosaic tiling constraint: the scales block's sublane count must be a
    multiple of 8 (or span the whole scale array). Small-K weights (tiny test
    models) and multi-section containers (row-parallel TP shards — the
    per-shard view is single-section) fall back to the XLA dequant path."""
    if qt.sections != 1:
        return False
    if qt.kind in ("q4mlpg", "q4mlpd"):
        # fused-MLP containers (ffn-permuted) are consumed ONLY by
        # ops.fused_mlp; the generic kernels would read them mis-ordered
        return False
    # physical N may exceed qt.n (N-padded container); metadata-only views
    # (_layer_view) carry qs=None and are never padded
    n_phys = qt.n if qt.qs is None else qt.qs.shape[-1]
    if qt.kind in ("q4v3", "q4v3m", "q8v3"):
        return True  # to_v3/to_q8v3 only produce aligned containers (K % 2048)
    if qt.kind == "q8":
        tk, _ = _pick_tiles(0, qt.k, n_phys)
        rows = tk // qt.group
        return rows % 8 == 0 or rows == qt.k // qt.group
    tkb, _ = _pick_tiles(0, qt.k // 2, n_phys)
    return (tkb // QBLOCK) % 8 == 0


def _qmatmul_local(xb: jax.Array, qt: QTensor, use_kernel: bool) -> jax.Array:
    """Single-shard fused dequant-matmul: xb [B, K] @ qt -> [B, N] bf16."""
    if not use_kernel or not KERNEL_ENABLED or not kernel_supported(qt):
        return (xb @ dequant_qtensor(qt)).astype(jnp.bfloat16)
    # NOTE: in-kernel mins (pass qt.mins into the matmuls) was measured
    # SLOWER than this external rank-1 correction at 1B/b8 on v5e (the
    # selector-matrix block-sum dot costs more per tile than XLA's fused
    # chain); keep the correction outside the kernels.
    if qt.kind == "q4v3m":
        from .qtensor import split_v3m

        qt = split_v3m(qt)
    if qt.kind == "q8v3":
        # the layered kernel serves the 2D container as a 1-layer stack
        # (XLA reshape, no copy); mins ride in-kernel — skip the external
        # rank-1 correction below
        y = _chunk_rows(
            lambda xc: _q8v3_matmul_layered(
                xc, 0, qt.qs[None], qt.scales[None],
                None if qt.mins is None else qt.mins[None], group=qt.group,
            ),
            xb,
        )
        if y.shape[-1] != qt.n:
            y = y[..., : qt.n]
        return y
    elif qt.kind == "q8":
        y = _chunk_rows(
            lambda xc: _q8_matmul(xc, qt.qs, qt.scales, None, group=qt.group),
            xb,
        )
    elif qt.kind == "q4v3":
        y = _chunk_rows(lambda xc: _q4v3_matmul(xc, qt.qs, qt.scales), xb)
    else:
        y = _chunk_rows(
            lambda xc: _q4_matmul(xc, qt.qs, qt.scales, None), xb
        )
    if qt.mins is not None:
        y = (
            y.astype(jnp.float32) - mins_correction(xb, qt.mins, qt.group)
        ).astype(y.dtype)
    if y.shape[-1] != qt.n:  # N-padded container (see pad_qtensor_n)
        y = y[..., : qt.n]
    return y


def _qmatmul_tp(xb: jax.Array, qt: QTensor, use_kernel: bool) -> jax.Array:
    """Tensor-parallel fused dequant-matmul through shard_map.

    Column-parallel (wq/wk/wv/gate/up/lm_head): weights shard along N; x is
    replicated across tp; each chip's kernel emits its N-slice — no
    collective (GSPMD reassembles the logical [B, N] array).
    Row-parallel (wo/w_down): x shards along K, weights along K (4-bit
    containers are packed per-section so each chip's byte rows decode a
    contiguous local k-range — see ops.qtensor `sections`); per-chip partial
    products (including the local mins correction) psum over tp.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DP_AXIS, TP_AXIS

    mesh = TP_MESH
    tp = mesh.shape[TP_AXIS]
    dp = mesh.shape[DP_AXIS]
    # batch rows shard over dp only when they divide it (prefill_slot_step
    # runs batch-1 chunks; single-request generate may have B=1)
    bax = DP_AXIS if (dp > 1 and xb.shape[0] % dp == 0) else None
    wq_axis = 0 if qt.tp_mode == "row" else 1  # qs/scales/mins shard axis
    wspec = P(TP_AXIS, None) if qt.tp_mode == "row" else P(None, TP_AXIS)
    local = qt.replace(
        qs=None, scales=None, mins=None,
        k=qt.k // tp if qt.tp_mode == "row" else qt.k,
        n=qt.n if qt.tp_mode == "row" else qt.n // tp,
        sections=1 if qt.tp_mode == "row" else qt.sections,
        tp_mode=None,
    )

    if qt.tp_mode == "row":
        in_specs = (P(bax, TP_AXIS), wspec, wspec, wspec)
        out_spec = P(bax, None)

        def f(xl, qs, sc, mins):
            y = _qmatmul_local(
                xl, local.replace(qs=qs, scales=sc, mins=mins), use_kernel
            )
            return jax.lax.psum(y.astype(jnp.float32), TP_AXIS).astype(y.dtype)

    else:
        in_specs = (P(bax, None), wspec, wspec, wspec)
        out_spec = P(bax, TP_AXIS)

        def f(xl, qs, sc, mins):
            return _qmatmul_local(
                xl, local.replace(qs=qs, scales=sc, mins=mins), use_kernel
            )

    if qt.mins is None:
        in_specs = in_specs[:-1]
        g = lambda xl, qs, sc: f(xl, qs, sc, None)
        args = (xb, qt.qs, qt.scales)
    else:
        g = f
        args = (xb, qt.qs, qt.scales, qt.mins)
    return shard_map(
        g, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )(*args)


def qmatmul(x: jax.Array, qt: QTensor, use_kernel: bool = True) -> jax.Array:
    """x [..., K] @ quantized W [K, N] → [..., N] (bf16).

    `use_kernel=False` uses the XLA fallback (dense dequant then matmul) —
    the correctness reference; the Pallas path is the production one. With
    an active `TP_MESH` and a tp-marked weight, the kernel runs per-shard
    under shard_map (quantized tensor parallelism).
    """
    lead = x.shape[:-1]
    xb = x.reshape(-1, qt.k)
    if TP_MESH is not None and qt.tp_mode in ("col", "row"):
        y = _qmatmul_tp(xb, qt, use_kernel)
    else:
        y = _qmatmul_local(xb, qt, use_kernel)
    return y.reshape(*lead, qt.n)


def linear(x: jax.Array, w) -> jax.Array:
    """Dense or quantized matmul dispatch used by model forwards."""
    if isinstance(w, QTensor):
        return qmatmul(x, w)
    return x @ w
