"""Flash-decode attention Pallas kernel over the dense head-major KV cache.

Replaces the reference's three chained shaders — scores
(``AttentionScoreCalculationShader.cs:164-206``), 3-pass softmax
(``AttentionSoftmaxShader.cs:139-178``), weighted V sum
(``AttentionWeightedValueSumShader.cs:175-216``) — with one online-softmax
kernel: for each (sequence, kv-head) the grouped query rows attend to the
cache in S-blocks, maintaining running max/denominator/accumulator in VMEM
(never materializing the [S] score row in HBM). GQA mapping
``kvHead = qHead // (qHeads//kvHeads)`` is the R-row grouping.

Layout: q [B, Hkv, R, D]; cache [Hkv, B, S, D] (block (1,1,BS,D) is
contiguous); lengths [B] in SMEM. Blocks whose start is past the sequence
length are skipped entirely (`pl.when`), so short sequences in a long cache
pay only for what they use.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_S_BLOCK = 256


def _decode_kernel(
    len_ref,  # SMEM [B] int32: per-sequence valid lengths
    q_ref,  # [R, D]
    k_ref,  # [BS, D]
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
    length = len_ref[pl.program_id(0)]

    @pl.when(kk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(kk * s_block < length)
    def _():
        q = q_ref[...].astype(jnp.float32)
        k = k_ref[...].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, BS]
        scores = scores * scale
        span = kk * s_block + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )
        scores = jnp.where(span < length, scores, NEG_INF)

        m_prev = m_ref[:, :1]  # [R, 1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        corr = jnp.exp(m_prev - m_new)  # [R, 1]
        p = jnp.exp(scores - m_new)  # [R, BS]
        l_new = l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p,
            v_ref[...].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, D]
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[...] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_block", "interpret"))
def flash_decode_attention(
    q: jax.Array,  # [B, Hq, D]
    k_cache: jax.Array,  # [Hkv, B, S, D]
    v_cache: jax.Array,  # [Hkv, B, S, D]
    lengths: jax.Array,  # [B] int32 valid slots (current token included)
    s_block: int = DEFAULT_S_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, Hq, D] attention output; positions >= lengths are masked."""
    b, hq, d = q.shape
    hkv, _, s, _ = k_cache.shape
    r = hq // hkv
    s_block = min(s_block, s)
    if s % s_block:
        raise ValueError(f"cache length {s} not divisible by s_block {s_block}")
    qg = q.reshape(b, hkv, r, d)
    scale = 1.0 / (d**0.5)

    grid = (b, hkv, s // s_block)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, s_block=s_block, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, hkv, r, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (b,), lambda bb, h, kk: (0,), memory_space=pltpu.SMEM
                ),
                # None block dims are squeezed away inside the kernel
                pl.BlockSpec((None, None, r, d), lambda bb, h, kk: (bb, h, 0, 0)),
                pl.BlockSpec(
                    (None, None, s_block, d), lambda bb, h, kk: (h, bb, kk, 0)
                ),
                pl.BlockSpec(
                    (None, None, s_block, d), lambda bb, h, kk: (h, bb, kk, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (None, None, r, d), lambda bb, h, kk: (bb, h, 0, 0)
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
    )(lengths, qg, k_cache, v_cache)
    return out.reshape(b, hq, d)


def decode_attention_reference(
    q: jax.Array, k_cache: jax.Array, v_cache: jax.Array, lengths: jax.Array
) -> jax.Array:
    """jnp reference (same semantics) for tests."""
    b, hq, d = q.shape
    hkv, _, s, _ = k_cache.shape
    r = hq // hkv
    qg = q.reshape(b, hkv, r, d).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    logits = jnp.einsum("bhrd,hbsd->bhrs", qg, kf) / (d**0.5)
    mask = jnp.arange(s)[None, None, None, :] < lengths[:, None, None, None]
    logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhrs,hbsd->bhrd", w, v_cache.astype(jnp.float32))
    return out.reshape(b, hq, d).astype(q.dtype)
