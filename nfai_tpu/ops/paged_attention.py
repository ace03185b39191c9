"""Paged flash-decode attention: the decode kernel indexing KV through a
block table over a shared page pool.

Extends ops.decode_attention (same online-softmax core, GQA grouping, length
masking) with one indirection: instead of a dense per-slot cache
[Hkv, B, S, D], keys/values live in a global pool [Hkv, P, page, D] and each
sequence owns a list of page ids (`block_tables`). The page id for grid step
(b, kk) is fetched from a scalar-prefetch ref inside the BlockSpec index_map —
Pallas prefetches the right page from HBM exactly as it would a dense block.

This replaces the reference's fixed 512-slot in-op cache
(``MatrixMultiplyShader.cs:52-66``) with production paging: page-granular
allocation, prefix sharing across requests (see runtime.paged_cache), and no
per-slot reservation of max_seq.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_PAGE_SIZE = 128


def _paged_kernel(
    tbl_ref,  # scalar-prefetch [B, max_pages] int32 page ids
    len_ref,  # SMEM [B] int32 valid lengths
    win_ref,  # SMEM [1] int32 sliding window (0 = unlimited)
    q_ref,  # [R, D]
    k_ref,  # [page, D] (int8 when quantized)
    v_ref,  # [page, D]
    *rest,  # ([ks_ref, vs_ref] when quantized,) o_ref, m/l/acc scratch
    page_size: int,
    scale: float,
    softcap: float,
    windowed: bool,
    quantized: bool = False,
):
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest
    kk = pl.program_id(2)
    length = len_ref[pl.program_id(0)]
    win = win_ref[0]


    @pl.when(kk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    relevant = kk * page_size < length
    if windowed:
        relevant &= (win == 0) | ((kk + 1) * page_size > length - win)

    @pl.when(relevant)
    def _():
        q = q_ref[...].astype(jnp.float32)
        k = k_ref[...].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [R, page]
        if quantized:
            # per-token scale factors out of the D contraction: one
            # broadcast multiply per score column instead of dequantizing
            # the whole page
            scores = scores * ks_ref[...]  # [1, page] broadcast
        if softcap:
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))
        span = kk * page_size + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )
        visible = span < length
        if windowed:
            # the newest token sits at span == length-1: window covers
            # [length-win, length-1]
            visible &= (win == 0) | (span >= length - win)
        scores = jnp.where(visible, scores, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            # fold the v scale into the softmax weights
            p = p * vs_ref[...]
        pv = jax.lax.dot_general(
            p,
            v_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[...] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "scale", "softcap")
)
def paged_flash_decode_attention(
    q: jax.Array,  # [B, Hq, D]
    k_pages: jax.Array,  # [Hkv, P, page, D]
    v_pages: jax.Array,  # [Hkv, P, page, D]
    block_tables: jax.Array,  # [B, max_pages] int32 page ids
    lengths: jax.Array,  # [B] int32 valid tokens (current one included)
    interpret: bool = False,
    scale: float | None = None,
    softcap: float = 0.0,
    window: jax.Array | int = 0,
    k_scales: jax.Array | None = None,  # [Hkv, P, page] f32 (int8 pool)
    v_scales: jax.Array | None = None,
) -> jax.Array:
    """Returns [B, Hq, D]; positions >= lengths masked; pages beyond the
    sequence's length are never fetched (`pl.when` block skip). With
    `k_scales`/`v_scales` the pool is int8 and per-token scales ride the
    same block tables (applied per score column / softmax weight)."""
    b, hq, d = q.shape
    hkv, _, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    r = hq // hkv
    qg = q.reshape(b, hkv, r, d)
    if scale is None:
        scale = 1.0 / (d**0.5)
    windowed = not (isinstance(window, int) and window == 0)
    win_arr = jnp.asarray(window, jnp.int32).reshape(1)
    quantized = k_scales is not None

    page_spec = pl.BlockSpec(
        (None, None, page_size, d),
        lambda bb, h, kk, tbl: (h, tbl[bb, kk], 0, 0),
    )
    in_specs = [
        pl.BlockSpec(
            (b,), lambda bb, h, kk, tbl: (0,), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (1,), lambda bb, h, kk, tbl: (0,), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (None, None, r, d), lambda bb, h, kk, tbl: (bb, h, 0, 0)
        ),
        # the page indirection: block (h, tbl[b, kk]) of the pool
        page_spec,
        page_spec,
    ]
    args = [block_tables, lengths, win_arr, qg, k_pages, v_pages]
    if quantized:
        sspec = pl.BlockSpec(
            (None, None, 1, page_size),
            lambda bb, h, kk, tbl: (h, tbl[bb, kk], 0, 0),
        )
        in_specs += [sspec, sspec]
        args += [
            k_scales.reshape(hkv, -1, 1, page_size),
            v_scales.reshape(hkv, -1, 1, page_size),
        ]

    grid = (b, hkv, max_pages)
    out = pl.pallas_call(
        functools.partial(
            _paged_kernel, page_size=page_size, scale=scale, softcap=softcap,
            windowed=windowed, quantized=quantized,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, r, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (None, None, r, d), lambda bb, h, kk, tbl: (bb, h, 0, 0)
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
    )(*args)
    return out.reshape(b, hq, d)


def paged_attention_reference(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    block_tables: jax.Array,
    lengths: jax.Array,
) -> jax.Array:
    """jnp reference: gather each sequence's pages densely, then attend."""
    b, hq, d = q.shape
    hkv, _, page, _ = k_pages.shape
    r = hq // hkv
    # [B, max_pages, Hkv, page, D] -> [Hkv, B, S, D]
    kg = jnp.take(k_pages, block_tables, axis=1)  # [Hkv, B, max_pages, page, D]
    vg = jnp.take(v_pages, block_tables, axis=1)
    s = block_tables.shape[1] * page
    kg = kg.reshape(hkv, b, s, d)
    vg = vg.reshape(hkv, b, s, d)
    qg = q.reshape(b, hkv, r, d).astype(jnp.float32)
    logits = jnp.einsum("bhrd,hbsd->bhrs", qg, kg.astype(jnp.float32)) / (d**0.5)
    mask = jnp.arange(s)[None, None, None, :] < lengths[:, None, None, None]
    logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhrs,hbsd->bhrd", w, vg.astype(jnp.float32))
    return out.reshape(b, hq, d).astype(q.dtype)
