"""Layer-indexed flash-decode attention over the stacked KV cache.

Motivation (v5e profile of the 1B q4 decode step, benchmarks/profile_decode.py):
XLA's layer-scan decode spent ~1.7 ms/step on KV-cache handling — two full
cache copies per step (the scan carry could not be aliased through the
dynamic-update-slice chain) plus per-layer 8 MB cache rewrites (XLA laid the
cache out S-minor for fast attention reads, so a single-token write touched
every tile). This kernel removes it:

- the FULL stacked cache [L, Hkv, B, S, D] is an operand; the layer index is
  a scalar-prefetch value used in the BlockSpec index maps, so the kernel
  DMAs the right layer's blocks straight from HBM — no XLA-level per-layer
  slice or restack;
- the kernel reads only the OLD tokens (span < starts[b]); the new token's
  contribution is folded in analytically in the epilogue (q.k_new, v_new),
  so the caller can scatter the new K/V row into the cache as a tiny XLA
  update ordered anywhere around the kernel — and because the kernel pins
  the cache operand to the default (D-minor) layout, that scatter is a
  contiguous 128-byte write per (b, h) instead of a full-tile rewrite;
- blocks past each row's length are clamped in the index map (consecutive
  equal indices skip the DMA) and skipped in compute, so short sequences in
  a long cache pay only for what they use.

Replaces (with ops.decode_attention / ops.paged_attention) the reference's
three chained attention shaders (AttentionScoreCalculationShader.cs,
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


def _fused_kernel(
    layer_ref,  # scalar-prefetch [1] int32: layer index
    starts_ref,  # scalar-prefetch [B] int32: old length per row
    q_ref,  # [R, D]
    knew_ref,  # [1, D]
    vnew_ref,  # [1, D]
    k_ref,  # [BS, D] cache stream block (layer-indexed)
    v_ref,  # [BS, D]
    o_ref,  # [R, D]
    m_ref,  # VMEM [R, 128] f32 running max
    l_ref,  # VMEM [R, 128] f32 running denominator
    acc_ref,  # VMEM [R, D] f32
    *,
    s_block: int,
    scale: float,
):
    kk = pl.program_id(2)
    start = starts_ref[pl.program_id(0)]

    @pl.when(kk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(kk * s_block < start)
    def _():
        q = q_ref[...].astype(jnp.float32)
        k = k_ref[...].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [R, BS]
        span = kk * s_block + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )
        scores = jnp.where(span < start, scores, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
            l_ref.shape,
        )
        pv = jax.lax.dot_general(
            p,
            v_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        # fold in the new token analytically (it always sees itself)
        q = q_ref[...].astype(jnp.float32)
        kn = knew_ref[...].astype(jnp.float32)  # [1, D]
        s_new = jax.lax.dot_general(
            q, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [R, 1]
        m_prev = m_ref[:, :1]
        m_fin = jnp.maximum(m_prev, s_new)
        corr = jnp.exp(m_prev - m_fin)
        p_new = jnp.exp(s_new - m_fin)  # [R, 1]
        l_fin = l_ref[:, :1] * corr + p_new
        acc = acc_ref[...] * corr + jax.lax.dot_general(
            p_new,
            vnew_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = (acc / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_block", "interpret"))
def layered_decode_attention(
    q: jax.Array,  # [B, Hq, D] post-rope queries for the new token
    k_new: jax.Array,  # [B, Hkv, D] post-rope key for the new token
    v_new: jax.Array,  # [B, Hkv, D]
    k_cache: jax.Array,  # [L, Hkv, B, S, D] stacked cache (old tokens)
    v_cache: jax.Array,  # [L, Hkv, B, S, D]
    layer: jax.Array,  # int32 scalar: which layer's cache to attend over
    starts: jax.Array,  # [B] int32: number of valid old tokens per row
    s_block: int = DEFAULT_S_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Returns attn [B, Hq, D] over cache[layer, ..., :starts[b]] plus the
    new token. The caller is responsible for writing (k_new, v_new) into the
    cache at ``starts[b]`` (see `write_cache_rows`)."""
    b, hq, d = q.shape
    l, hkv, _, s, _ = k_cache.shape
    r = hq // hkv
    s_block = min(s_block, s)
    if s % s_block:
        raise ValueError(f"cache length {s} not divisible by s_block {s_block}")
    qg = q.reshape(b, hkv, r, d)
    kn = k_new.reshape(b, hkv, 1, d)
    vn = v_new.reshape(b, hkv, 1, d)
    scale = 1.0 / (d**0.5)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    def stream_idx(bb, h, kk, lref, sref):
        # clamp past-length blocks to the last valid one: consecutive equal
        # indices skip the DMA re-fetch
        last = jnp.maximum(sref[bb] - 1, 0) // s_block
        return (lref[0], h, bb, jnp.minimum(kk, last), 0)

    grid = (b, hkv, s // s_block)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, s_block=s_block, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, hkv, r, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (None, None, r, d), lambda bb, h, kk, lr, sr: (bb, h, 0, 0)
                ),
                pl.BlockSpec(
                    (None, None, 1, d), lambda bb, h, kk, lr, sr: (bb, h, 0, 0)
                ),
                pl.BlockSpec(
                    (None, None, 1, d), lambda bb, h, kk, lr, sr: (bb, h, 0, 0)
                ),
                pl.BlockSpec((None, None, None, s_block, d), stream_idx),
                pl.BlockSpec((None, None, None, s_block, d), stream_idx),
            ],
            out_specs=pl.BlockSpec(
                (None, None, r, d), lambda bb, h, kk, lr, sr: (bb, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((r, 128), jnp.float32),
                pltpu.VMEM((r, 128), jnp.float32),
                pltpu.VMEM((r, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(layer_arr, starts, qg, kn, vn, k_cache, v_cache)
    return out.reshape(b, hq, d)


def write_cache_rows(
    cache: jax.Array,  # [L, Hkv, B, S, D]
    new: jax.Array,  # [B, Hkv, D]
    layer: jax.Array,  # int32 scalar
    starts: jax.Array,  # [B] int32
) -> jax.Array:
    """Scatter the new token's K or V row into the stacked cache at
    (layer, :, b, starts[b]). With the default (D-minor) layout the kernel
    pins, each update is a contiguous row write."""
    b = new.shape[0]
    # advanced indices (layer, b, starts) with the ':' slice between them ->
    # result dims [B, Hkv, D], matching `new` directly
    return cache.at[layer, :, jnp.arange(b), starts].set(
        new.astype(cache.dtype)
    )


def _write_kernel(starts_ref, rows_ref, c_ref, o_ref, *, s_tile, s):
    bb = pl.program_id(0)
    start = starts_ref[bb]
    idx = jax.lax.rem(start, s_tile)
    rows_blk = rows_ref[...]  # [L, Hkv, 1, D] (unit s-dim added outside:
    # Mosaic cannot shape-cast a unit dim across the sublane axis in-kernel)
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, s_tile, 1), dimension=2
    )
    # drop semantics for start >= s (mirrors jnp .at[...].set OOB behavior)
    mask = (lane == idx) & (start < s)
    o_ref[...] = jnp.where(mask, rows_blk, c_ref[...])


@functools.partial(jax.jit, static_argnames=("s_tile", "interpret"))
def write_all_layers(
    cache: jax.Array,  # [L, Hkv, B, S, D]
    rows: jax.Array,  # [L, B, Hkv, D] new K or V rows, one per layer
    starts: jax.Array,  # [B] int32
    s_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Write every layer's new token row at (l, :, b, starts[b]) in ONE pass
    after the layer scan (the fused attention kernel folds the new token in
    analytically, so nothing reads these rows back within the step).

    Implemented as a Pallas kernel with the cache aliased in/out rather than
    a jnp scatter: the scatter made XLA keep the decode while-loop's cache
    carry in a scatter-friendly layout and convert the full stacked cache to
    the attention kernel's (default) layout every step — two ~full-HBM
    copies per token. One program per batch row rewrites only the 8-row
    sublane tile containing that row across every (layer, head): ~L*Hkv*
    s_tile*D bytes of traffic per sequence instead of a cache-sized copy."""
    l, hkv, b, s, d = cache.shape
    s_tile = min(s_tile, s)
    if s % s_tile:
        raise ValueError(f"cache length {s} not divisible by s_tile {s_tile}")

    def tile_idx(bb, sref):
        return (0, 0, bb, jnp.minimum(sref[bb], s - 1) // s_tile, 0)

    return pl.pallas_call(
        functools.partial(_write_kernel, s_tile=s_tile, s=s),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                # rows ride as [L, B, Hkv, 1, D]: batch squeezed outside the
                # two minor dims, unit s-dim pre-inserted (Mosaic constraints)
                pl.BlockSpec(
                    (l, None, hkv, 1, d), lambda bb, sref: (0, bb, 0, 0, 0)
                ),
                pl.BlockSpec((l, hkv, None, s_tile, d), tile_idx),
            ],
            out_specs=pl.BlockSpec((l, hkv, None, s_tile, d), tile_idx),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        input_output_aliases={2: 0},  # cache in == out (indices incl. prefetch)
        interpret=interpret,
    )(starts, rows[:, :, :, None, :].astype(cache.dtype), cache)


def layered_decode_reference(
    q: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    layer,
    starts: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """jnp reference with identical semantics incl. the row writes (tests)."""
    b, hq, d = q.shape
    l, hkv, _, s, _ = k_cache.shape
    r = hq // hkv
    kc = write_cache_rows(k_cache, k_new, layer, starts)
    vc = write_cache_rows(v_cache, v_new, layer, starts)
    qg = q.reshape(b, hkv, r, d).astype(jnp.float32)
    kf = kc[layer].astype(jnp.float32)  # [Hkv, B, S, D]
    logits = jnp.einsum("bhrd,hbsd->bhrs", qg, kf) / (d**0.5)
    mask = jnp.arange(s)[None, None, None, :] <= starts[:, None, None, None]
    logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhrs,hbsd->bhrd", w, vc[layer].astype(jnp.float32))
    return out.reshape(b, hq, d).astype(q.dtype), kc, vc
