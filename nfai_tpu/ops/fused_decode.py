"""Layer-indexed flash-decode attention over the stacked, merged-lane KV cache.

Motivation (v5e profiles of the 1B q4 decode step, benchmarks/profile_decode.py
+ benchmarks/attn_block_sweep.py): the first fused kernel used a
(batch, kv-head, s-block) grid with per-head [r, D] query tiles — r=4 rows of
a 128-row MXU pass, plus 8x the softmax-state updates and 8x the grid cells.
Measured ~100 us/layer vs ~20 us bandwidth ideal at S=1024.

This version makes the head dimension part of the MXU problem instead of the
grid:

- the cache is stored MERGED-LANE: [L, B, S, KVD] with KVD = Hkv*D (head-major
  columns). One S-block is a [s_block, KVD] tile — every head's keys for those
  positions in one contiguous DMA;
- queries enter as a BLOCK-DIAGONAL matrix qbd [Hq, KVD] built in-kernel
  (qbd[h*r+j, h*D+d] = q[h,j,d] * scale, zero elsewhere): ONE MXU dot
  qbd @ k_block^T yields the exact per-head scores [Hq, s_block] — the
  block-diagonal zeros kill every cross-head term. The value pass is one dot
  p @ v_block -> [Hq, KVD]; the per-head slices are extracted with a masked
  replication-matrix dot (again MXU) in the epilogue. The MXU overcompute
  (Hkv x) is free — decode attention is HBM-bound;
- the layer index rides the scalar-prefetch channel into the BlockSpec index
  maps (no XLA-level per-layer cache slice), blocks past each row's length
  clamp to the last valid one (consecutive equal indices skip the DMA), and
  the new token folds in analytically in the epilogue so the caller scatters
  the new K/V rows with ONE batched write per step after the layer scan
  (`write_all_layers`), never copying the cache.

Replaces (with ops.paged_attention for the paged pool) the reference's three
chained attention shaders (AttentionScoreCalculationShader.cs,
AttentionSoftmaxShader.cs, AttentionWeightedValueSumShader.cs) and its
in-shader KV append (MatrixMultiplyShader.cs:52-66).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_S_BLOCK = 256


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=dim)


def _fused_kernel(
    layer_ref,  # scalar-prefetch [1] int32: layer index
    win_ref,  # scalar-prefetch [1] int32: sliding window (0 = unlimited)
    starts_ref,  # scalar-prefetch [B] int32: old length per row
    q_ref,  # [Hq, D] this row's post-rope queries
    knew_ref,  # [1, KVD] post-rope new key row (merged heads)
    vnew_ref,  # [1, KVD] (unit dim lives in the [B, 1, KVD] operand: Mosaic
    # requires block dims to divide 8/128 or equal the array dim)
    k_ref,  # [BS, KVD] cache stream block (layer-indexed; int8 if quantized)
    v_ref,  # [BS, KVD]
    ks_ref,  # [Hkv, BS] f32 per-(token, head) K scales, or None (bf16 cache)
    vs_ref,  # [Hkv, BS] or None (time-minor: S on lanes)
    o_ref,  # [Hq, D]
    qbd_ref,  # VMEM [Hq, KVD] bf16: block-diagonal queries
    m_ref,  # VMEM [Hq, 128] f32 running max
    l_ref,  # VMEM [Hq, 128] f32 running denominator
    acc_ref,  # VMEM [Hq, KVD] f32
    *,
    s_block: int,
    d: int,
    r: int,
    scale: float,
    softcap: float,
    windowed: bool,
):
    kk = pl.program_id(1)
    start = starts_ref[pl.program_id(0)]
    win = win_ref[0]
    hq, kvd = acc_ref.shape

    @pl.when(kk == 0)
    def _():
        # build the block-diagonal scaled query matrix: replicate q's D
        # columns across every head group with an MXU dot against the
        # replication matrix T[dd, j] = (j % D == dd), then zero the
        # off-diagonal groups. (pltpu.repeat on a D<128-lane operand
        # concatenates padded registers on real hardware — avoid it.)
        q = q_ref[...].astype(jnp.float32)  # [Hq, D]
        rep_t = (
            _iota2((d, kvd), 1) % d == _iota2((d, kvd), 0)
        ).astype(jnp.float32)
        tiled = jax.lax.dot(q, rep_t, preferred_element_type=jnp.float32)
        shape = (hq, kvd)
        diag = (_iota2(shape, 1) // d) == (_iota2(shape, 0) // r)
        qbd_ref[...] = jnp.where(diag, tiled * scale, 0.0)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # skip blocks past the row's length, and (sliding window) blocks fully
    # behind the new token's window [start-win+1, start]. `windowed` is
    # static: non-swa models compile none of the window logic (measured
    # ~1% of decode otherwise).
    relevant = kk * s_block < start
    if windowed:
        relevant &= (win == 0) | ((kk + 1) * s_block > start - win + 1)

    @pl.when(relevant)
    def _():
        scores = jax.lax.dot_general(
            qbd_ref[...],
            k_ref[...].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, BS] — exact per-head scores (cross-head terms hit zeros)
        if ks_ref is not None:
            # int8 cache: the per-(token, head) scale factors out of the D
            # contraction — apply it on the score matrix via a tiny
            # replication-matrix dot (row i ← kv-head i//r), never
            # dequantizing the cache tile elementwise
            rep_h = (
                _iota2((hq, ks_ref.shape[0]), 0) // r
                == _iota2((hq, ks_ref.shape[0]), 1)
            ).astype(jnp.float32)
            scores = scores * jax.lax.dot(
                rep_h, ks_ref[...], preferred_element_type=jnp.float32
            )
        if softcap:
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))
        span = kk * s_block + _iota2(scores.shape, 1)
        visible = span < start
        if windowed:
            visible &= (win == 0) | (span > start - win)
        scores = jnp.where(visible, scores, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
            l_ref.shape,
        )
        if vs_ref is not None:
            # fold the V scales into the softmax weights (same factoring)
            rep_h = (
                _iota2((hq, vs_ref.shape[0]), 0) // r
                == _iota2((hq, vs_ref.shape[0]), 1)
            ).astype(jnp.float32)
            p = p * jax.lax.dot(
                rep_h, vs_ref[...], preferred_element_type=jnp.float32
            )
        pv = jax.lax.dot_general(
            p,
            v_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, KVD]
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kk == pl.num_programs(1) - 1)
    def _():
        # fold in the new token analytically (it always sees itself)
        s_new = jax.lax.dot_general(
            qbd_ref[...],
            knew_ref[...].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, 1]
        if softcap:
            s_new = softcap * jnp.tanh(s_new * (1.0 / softcap))
        m_prev = m_ref[:, :1]
        m_fin = jnp.maximum(m_prev, s_new)
        corr = jnp.exp(m_prev - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = l_ref[:, :1] * corr + p_new
        acc = acc_ref[...] * corr + jax.lax.dot_general(
            p_new,
            vnew_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hq_, kvd_ = acc.shape
        # extract each row's own head group: zero the off-diagonal groups,
        # then fold the KVD columns back to D with a replication-matrix dot
        diag = (_iota2((hq_, kvd_), 1) // d) == (_iota2((hq_, kvd_), 0) // r)
        rep = (
            _iota2((kvd_, d), 0) % d == _iota2((kvd_, d), 1)
        ).astype(jnp.float32)
        out = jax.lax.dot(
            jnp.where(diag, acc, 0.0), rep,
            preferred_element_type=jnp.float32,
        )  # [Hq, D]
        o_ref[...] = (out / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("s_block", "interpret", "scale", "softcap")
)
def layered_decode_attention(
    q: jax.Array,  # [B, Hq, D] post-rope queries for the new token
    k_new: jax.Array,  # [B, KVD] post-rope new key row (merged heads)
    v_new: jax.Array,  # [B, KVD]
    k_cache: jax.Array,  # [L, B, S, KVD] stacked merged-lane cache (old tokens)
    v_cache: jax.Array,  # [L, B, S, KVD]
    layer: jax.Array,  # int32 scalar: which layer's cache to attend over
    starts: jax.Array,  # [B] int32: number of valid old tokens per row
    s_block: int = DEFAULT_S_BLOCK,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float = 0.0,  # gemma2 tanh score cap (0 = off)
    window: jax.Array | int = 0,  # sliding window (0 = unlimited; traced ok)
    k_scales: jax.Array | None = None,  # [L, B, Hkv, S] f32 (int8 cache)
    v_scales: jax.Array | None = None,
) -> jax.Array:
    """Returns attn [B, Hq, D] over cache[layer, b, :starts[b]] plus the new
    token. The caller is responsible for writing (k_new, v_new) into the
    cache at ``starts[b]`` (see `write_all_layers` / `write_cache_rows`).

    With `k_scales`/`v_scales`, k_cache/v_cache are int8 and the per-token
    per-head scales are applied inside the kernel on the score matrix /
    softmax weights — halving the attention HBM stream (see _fused_kernel)."""
    b, hq, d = q.shape
    l, _, s, kvd = k_cache.shape
    hkv = kvd // d
    r = hq // hkv
    s_block = min(s_block, s)
    if s % s_block:
        raise ValueError(f"cache length {s} not divisible by s_block {s_block}")
    if scale is None:
        scale = 1.0 / (d**0.5)
    windowed = not (isinstance(window, int) and window == 0)
    quantized = k_scales is not None
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    win_arr = jnp.asarray(window, jnp.int32).reshape(1)

    def stream_idx(bb, kk, lref, wref, sref):
        # clamp past-length blocks to the last valid one, and (sliding
        # window) below-window blocks up to the first in-window one:
        # consecutive equal indices skip the DMA re-fetch
        last = jnp.maximum(sref[bb] - 1, 0) // s_block
        kk2 = jnp.minimum(kk, last)
        if windowed:
            w = wref[0]
            lo = jnp.where(
                w > 0, jnp.maximum(sref[bb] - w + 1, 0) // s_block, 0
            )
            kk2 = jnp.clip(kk, lo, last)
        return (lref[0], bb, kk2, 0)

    grid = (b, s // s_block)
    kernel = functools.partial(
        _fused_kernel, s_block=s_block, d=d, r=r, scale=scale,
        softcap=softcap, windowed=windowed,
    )
    in_specs = [
        pl.BlockSpec(
            (None, hq, d), lambda bb, kk, lr, wr, sr: (bb, 0, 0)
        ),
        pl.BlockSpec(
            (None, 1, kvd), lambda bb, kk, lr, wr, sr: (bb, 0, 0)
        ),
        pl.BlockSpec(
            (None, 1, kvd), lambda bb, kk, lr, wr, sr: (bb, 0, 0)
        ),
        pl.BlockSpec((None, None, s_block, kvd), stream_idx),
        pl.BlockSpec((None, None, s_block, kvd), stream_idx),
    ]
    args = [
        layer_arr, win_arr, starts, q, k_new[:, None], v_new[:, None],
        k_cache, v_cache,
    ]
    if quantized:
        def stream_idx_sc(bb, kk, lref, wref, sref):
            # same block clamping as stream_idx, but scales are [L,B,Hkv,S]
            last = jnp.maximum(sref[bb] - 1, 0) // s_block
            kk2 = jnp.minimum(kk, last)
            if windowed:
                w = wref[0]
                lo = jnp.where(
                    w > 0, jnp.maximum(sref[bb] - w + 1, 0) // s_block, 0
                )
                kk2 = jnp.clip(kk, lo, last)
            return (lref[0], bb, 0, kk2)

        in_specs += [
            pl.BlockSpec((None, None, hkv, s_block), stream_idx_sc),
            pl.BlockSpec((None, None, hkv, s_block), stream_idx_sc),
        ]
        args += [k_scales, v_scales]
    else:
        def kernel(*refs, _k=kernel):
            (lr, wr, sr, qr, knr, vnr, kr, vr, o, qbd, m, l_, acc) = refs
            return _k(lr, wr, sr, qr, knr, vnr, kr, vr, None, None,
                      o, qbd, m, l_, acc)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (None, hq, d), lambda bb, kk, lr, wr, sr: (bb, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hq, kvd), jnp.float32),
                pltpu.VMEM((hq, 128), jnp.float32),
                pltpu.VMEM((hq, 128), jnp.float32),
                pltpu.VMEM((hq, kvd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return out


def _fused_slab_kernel(
    layer_ref,  # scalar-prefetch [1] int32
    win_ref,  # scalar-prefetch [1] int32
    starts_ref,  # scalar-prefetch [B] int32
    mm_ref,  # scalar-prefetch [2] int32: [max(starts), min(starts)]
    q_ref,  # [B, Hq, D]
    knew_ref,  # [B, 1, KVD]
    vnew_ref,  # [B, 1, KVD]
    k_ref,  # [B, BS, KVD] cache slab (all rows, one s-block)
    v_ref,  # [B, BS, KVD]
    ks_ref,  # [B, Hkv, BS] or None
    vs_ref,  # [B, Hkv, BS] or None
    o_ref,  # [B, Hq, D]
    qbd_ref,  # VMEM [B, Hq, KVD] f32
    m_ref,  # VMEM [B, Hq, 128] f32
    l_ref,  # VMEM [B, Hq, 128] f32
    acc_ref,  # VMEM [B, Hq, KVD] f32
    *,
    s_block: int,
    d: int,
    r: int,
    scale: float,
    softcap: float,
    windowed: bool,
):
    """`_fused_kernel` with the whole batch in ONE grid cell per s-block.

    The (batch, s-block) grid costs ~0.7 µs of sequencing per cell on v5e
    (measured, benchmarks/attn_probe.py: ~25 µs fixed per 32-cell call vs a
    3-5 µs DMA ideal at typical fills). Folding the batch into the block
    cuts the grid to S/s_block cells; each cell runs the per-row online-
    softmax updates in an unrolled loop over rows. Per-ROW block clamping
    is traded for a batch-max clamp in the index map (rows shorter than the
    longest still skip their FLOPs via pl.when, but share the slab DMA)."""
    kk = pl.program_id(0)
    win = win_ref[0]
    b, hq, kvd = acc_ref.shape

    @pl.when(kk == 0)
    def _():
        rep_t = (
            _iota2((d, kvd), 1) % d == _iota2((d, kvd), 0)
        ).astype(jnp.float32)
        shape = (hq, kvd)
        diag = (_iota2(shape, 1) // d) == (_iota2(shape, 0) // r)
        for bb in range(b):
            qv = q_ref[bb].astype(jnp.float32)  # [Hq, D]
            tiled = jax.lax.dot(qv, rep_t, preferred_element_type=jnp.float32)
            qbd_ref[bb] = jnp.where(diag, tiled * scale, 0.0)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for bb in range(b):
        start = starts_ref[bb]
        relevant = kk * s_block < start
        if windowed:
            relevant &= (win == 0) | ((kk + 1) * s_block > start - win + 1)

        @pl.when(relevant)
        def _(bb=bb, start=start):
            scores = jax.lax.dot_general(
                qbd_ref[bb],
                k_ref[bb].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, BS]
            if ks_ref is not None:
                rep_h = (
                    _iota2((hq, ks_ref.shape[1]), 0) // r
                    == _iota2((hq, ks_ref.shape[1]), 1)
                ).astype(jnp.float32)
                scores = scores * jax.lax.dot(
                    rep_h, ks_ref[bb], preferred_element_type=jnp.float32
                )
            if softcap:
                scores = softcap * jnp.tanh(scores * (1.0 / softcap))
            span = kk * s_block + _iota2(scores.shape, 1)
            visible = span < start
            if windowed:
                visible &= (win == 0) | (span > start - win)
            scores = jnp.where(visible, scores, NEG_INF)
            m_prev = m_ref[bb, :, :1]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)
            l_ref[bb] = jnp.broadcast_to(
                l_ref[bb, :, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
                l_ref.shape[1:],
            )
            if vs_ref is not None:
                rep_h = (
                    _iota2((hq, vs_ref.shape[1]), 0) // r
                    == _iota2((hq, vs_ref.shape[1]), 1)
                ).astype(jnp.float32)
                p = p * jax.lax.dot(
                    rep_h, vs_ref[bb], preferred_element_type=jnp.float32
                )
            pv = jax.lax.dot_general(
                p,
                v_ref[bb].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[bb] = acc_ref[bb] * corr + pv
            m_ref[bb] = jnp.broadcast_to(m_new, m_ref.shape[1:])

    @pl.when(kk == pl.num_programs(0) - 1)
    def _():
        shape = (hq, kvd)
        diag = (_iota2(shape, 1) // d) == (_iota2(shape, 0) // r)
        rep = (
            _iota2((kvd, d), 0) % d == _iota2((kvd, d), 1)
        ).astype(jnp.float32)
        for bb in range(b):
            s_new = jax.lax.dot_general(
                qbd_ref[bb],
                knew_ref[bb].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, 1]
            if softcap:
                s_new = softcap * jnp.tanh(s_new * (1.0 / softcap))
            m_prev = m_ref[bb, :, :1]
            m_fin = jnp.maximum(m_prev, s_new)
            corr = jnp.exp(m_prev - m_fin)
            p_new = jnp.exp(s_new - m_fin)
            l_fin = l_ref[bb, :, :1] * corr + p_new
            acc = acc_ref[bb] * corr + jax.lax.dot_general(
                p_new,
                vnew_ref[bb].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = jax.lax.dot(
                jnp.where(diag, acc, 0.0), rep,
                preferred_element_type=jnp.float32,
            )  # [Hq, D]
            o_ref[bb] = (out / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("s_block", "interpret", "scale", "softcap")
)
def layered_decode_attention_slab(
    q: jax.Array,  # [B, Hq, D]
    k_new: jax.Array,  # [B, KVD]
    v_new: jax.Array,  # [B, KVD]
    k_cache: jax.Array,  # [L, B, S, KVD]
    v_cache: jax.Array,
    layer: jax.Array,
    starts: jax.Array,  # [B] int32
    s_block: int = DEFAULT_S_BLOCK,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float = 0.0,
    window: jax.Array | int = 0,
    k_scales: jax.Array | None = None,  # [L, B, Hkv, S] f32 (int8 cache)
    v_scales: jax.Array | None = None,
) -> jax.Array:
    """Batch-slab variant of `layered_decode_attention` (see
    _fused_slab_kernel). Same semantics, grid (S/s_block,) instead of
    (B, S/s_block)."""
    b, hq, d = q.shape
    l, _, s, kvd = k_cache.shape
    hkv = kvd // d
    r = hq // hkv
    s_block = min(s_block, s)
    if s % s_block:
        raise ValueError(f"cache length {s} not divisible by s_block {s_block}")
    if scale is None:
        scale = 1.0 / (d**0.5)
    windowed = not (isinstance(window, int) and window == 0)
    quantized = k_scales is not None
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    win_arr = jnp.asarray(window, jnp.int32).reshape(1)

    def slab_idx(kk, lref, wref, sref, mref):
        # batch-max clamp: blocks past the LONGEST row's length repeat the
        # last valid index (the DMA is skipped); windowed models also clamp
        # from below to the earliest in-window block across rows. Mosaic
        # index maps may only read SMEM scalars, so max/min(starts) arrive
        # precomputed in mref.
        last = jnp.maximum(mref[0] - 1, 0) // s_block
        kk2 = jnp.minimum(kk, last)
        if windowed:
            w = wref[0]
            lo = jnp.where(
                w > 0, jnp.maximum(mref[1] - w + 1, 0) // s_block, 0
            )
            kk2 = jnp.clip(kk, lo, last)
        return (lref[0], 0, kk2, 0)

    kernel = functools.partial(
        _fused_slab_kernel, s_block=s_block, d=d, r=r, scale=scale,
        softcap=softcap, windowed=windowed,
    )
    in_specs = [
        pl.BlockSpec((b, hq, d), lambda kk, lr, wr, sr, mr: (0, 0, 0)),
        pl.BlockSpec((b, 1, kvd), lambda kk, lr, wr, sr, mr: (0, 0, 0)),
        pl.BlockSpec((b, 1, kvd), lambda kk, lr, wr, sr, mr: (0, 0, 0)),
        pl.BlockSpec((None, b, s_block, kvd), slab_idx),
        pl.BlockSpec((None, b, s_block, kvd), slab_idx),
    ]
    minmax = jnp.stack([jnp.max(starts), jnp.min(starts)]).astype(jnp.int32)
    args = [
        layer_arr, win_arr, starts, minmax, q, k_new[:, None],
        v_new[:, None], k_cache, v_cache,
    ]
    if quantized:
        def slab_idx_sc(kk, lref, wref, sref, mref):
            last = jnp.maximum(mref[0] - 1, 0) // s_block
            kk2 = jnp.minimum(kk, last)
            if windowed:
                w = wref[0]
                lo = jnp.where(
                    w > 0, jnp.maximum(mref[1] - w + 1, 0) // s_block, 0
                )
                kk2 = jnp.clip(kk, lo, last)
            return (lref[0], 0, 0, kk2)

        in_specs += [
            pl.BlockSpec((None, b, hkv, s_block), slab_idx_sc),
            pl.BlockSpec((None, b, hkv, s_block), slab_idx_sc),
        ]
        args += [k_scales, v_scales]
    else:
        def kernel(*refs, _k=kernel):
            (lr, wr, sr, mr, qr, knr, vnr, kr, vr, o, qbd, m, l_, acc) = refs
            return _k(lr, wr, sr, mr, qr, knr, vnr, kr, vr, None, None,
                      o, qbd, m, l_, acc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(s // s_block,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (b, hq, d), lambda kk, lr, wr, sr, mr: (0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((b, hq, kvd), jnp.float32),
                pltpu.VMEM((b, hq, 128), jnp.float32),
                pltpu.VMEM((b, hq, 128), jnp.float32),
                pltpu.VMEM((b, hq, kvd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*args)


def write_cache_rows(
    cache: jax.Array,  # [L, B, S, KVD]
    new: jax.Array,  # [B, KVD]
    layer: jax.Array,  # int32 scalar
    starts: jax.Array,  # [B] int32
) -> jax.Array:
    """Scatter the new token's K or V row into the merged-lane cache at
    (layer, b, starts[b], :) — one contiguous KVD-row write per sequence."""
    b = new.shape[0]
    return cache.at[layer, jnp.arange(b), starts].set(new.astype(cache.dtype))


def _write_kernel(starts_ref, rows_ref, c_ref, o_ref, *, s_tile, s):
    bb = pl.program_id(0)
    start = starts_ref[bb]
    idx = jax.lax.rem(start, s_tile)
    rows_blk = rows_ref[...]  # [L, 1, KVD] (unit s-dim added outside:
    # Mosaic cannot shape-cast a unit dim across the sublane axis in-kernel)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s_tile, 1), dimension=1)
    # drop semantics for start >= s (mirrors jnp .at[...].set OOB behavior)
    mask = (lane == idx) & (start < s)
    o_ref[...] = jnp.where(mask, rows_blk, c_ref[...])


@functools.partial(jax.jit, static_argnames=("s_tile", "interpret"))
def write_all_layers(
    cache: jax.Array,  # [L, B, S, KVD]
    rows: jax.Array,  # [L, B, KVD] new K or V rows, one per layer
    starts: jax.Array,  # [B] int32
    s_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Write every layer's new token row at (l, b, starts[b], :) in ONE pass
    after the layer scan (the fused attention kernel folds the new token in
    analytically, so nothing reads these rows back within the step).

    Implemented as a Pallas kernel with the cache aliased in/out rather than
    a jnp scatter: the scatter made XLA keep the decode while-loop's cache
    carry in a scatter-friendly layout and convert the full stacked cache to
    the attention kernel's (default) layout every step — two ~full-HBM
    copies per token. One program per batch row rewrites only the 8-row
    sublane tile containing that row across every layer: ~L*s_tile*KVD bytes
    of traffic per sequence instead of a cache-sized copy."""
    l, b, s, kvd = cache.shape
    s_tile = min(s_tile, s)
    if s % s_tile:
        raise ValueError(f"cache length {s} not divisible by s_tile {s_tile}")

    def tile_idx(bb, sref):
        return (0, bb, jnp.minimum(sref[bb], s - 1) // s_tile, 0)

    return pl.pallas_call(
        functools.partial(_write_kernel, s_tile=s_tile, s=s),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                # rows ride as [L, B, 1, KVD]: unit s-dim pre-inserted
                # (Mosaic constraints — see _write_kernel)
                pl.BlockSpec((l, None, 1, kvd), lambda bb, sref: (0, bb, 0, 0)),
                pl.BlockSpec((l, None, s_tile, kvd), tile_idx),
            ],
            out_specs=pl.BlockSpec((l, None, s_tile, kvd), tile_idx),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        input_output_aliases={2: 0},  # cache in == out (indices incl. prefetch)
        interpret=interpret,
    )(starts, rows[:, :, None, :].astype(cache.dtype), cache)


def _write_kernel_t(starts_ref, rows_ref, c_ref, o_ref, *, s_tile, s):
    bb = pl.program_id(0)
    start = starts_ref[bb]
    idx = jax.lax.rem(start, s_tile)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_tile), dimension=2)
    mask = (lane == idx) & (start < s)
    o_ref[...] = jnp.where(mask, rows_ref[...], c_ref[...])


@functools.partial(jax.jit, static_argnames=("s_tile", "interpret"))
def write_all_layers_t(
    arr: jax.Array,  # [L, B, H, S] time-MINOR (the int8 cache scale arrays)
    rows: jax.Array,  # [L, B, H] new values, one per layer
    starts: jax.Array,  # [B] int32
    s_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """write_all_layers for the [L, B, H, S] scale arrays (S on lanes —
    an [.., S, H] layout would pad H≈8 lanes to 128 on TPU)."""
    l, b, h, s = arr.shape
    s_tile = min(s_tile, s)
    if s % s_tile:
        raise ValueError(f"scale length {s} not divisible by s_tile {s_tile}")

    def tile_idx(bb, sref):
        return (0, bb, 0, jnp.minimum(sref[bb], s - 1) // s_tile)

    return pl.pallas_call(
        functools.partial(_write_kernel_t, s_tile=s_tile, s=s),
        out_shape=jax.ShapeDtypeStruct(arr.shape, arr.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((l, None, h, 1), lambda bb, sref: (0, bb, 0, 0)),
                pl.BlockSpec((l, None, h, s_tile), tile_idx),
            ],
            out_specs=pl.BlockSpec((l, None, h, s_tile), tile_idx),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(starts, rows[..., None].astype(arr.dtype), arr)


def layered_decode_reference(
    q: jax.Array,  # [B, Hq, D]
    k_new: jax.Array,  # [B, KVD]
    v_new: jax.Array,  # [B, KVD]
    k_cache: jax.Array,  # [L, B, S, KVD]
    v_cache: jax.Array,
    layer,
    starts: jax.Array,
    scale: float | None = None,
    softcap: float = 0.0,
    window: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """jnp reference with identical semantics incl. the row writes (tests)."""
    b, hq, d = q.shape
    l, _, s, kvd = k_cache.shape
    hkv = kvd // d
    r = hq // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)
    kc = write_cache_rows(k_cache, k_new, layer, starts)
    vc = write_cache_rows(v_cache, v_new, layer, starts)
    qg = q.reshape(b, hkv, r, d).astype(jnp.float32)
    kf = kc[layer].reshape(b, s, hkv, d).astype(jnp.float32)
    logits = jnp.einsum("bhrd,bshd->bhrs", qg, kf) * scale
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    span = jnp.arange(s)[None, None, None, :]
    st = starts[:, None, None, None]
    mask = span <= st
    if window:
        mask &= span > st - window
    logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    vf = vc[layer].reshape(b, s, hkv, d).astype(jnp.float32)
    out = jnp.einsum("bhrs,bshd->bhrd", w, vf)
    return out.reshape(b, hq, d).astype(q.dtype), kc, vc
