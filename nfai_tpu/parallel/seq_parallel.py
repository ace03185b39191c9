"""Sequence-parallel decode attention over an S-sharded KV cache.

The production cache layout is merged-lane [.., S, KVD] with the head-major
KVD axis shardable over tp (`kv_cache_sharding`); SURVEY §2.7/§5 requires
that layout to keep the door open to sequence/context parallelism for
contexts that outgrow one chip's HBM. This module walks through that door:
the cache shards over the SEQUENCE axis instead, and the full-context decode
attention is reassembled from per-shard flash partials. Two variants, both
pure jnp inside shard_map (the Pallas decode kernel stays single-shard —
these are the collective patterns, rehearsed for correctness on the
8-virtual-device CPU mesh, tests/test_seq_parallel.py):

- `sp_decode_attention`: each chip runs flash attention over its local
  S-slice producing (unnormalized out, running max, denominator); the
  softmax statistics merge across the axis with the standard log-sum-exp
  combine (one pmax + two psums). Per-step collective traffic is
  B·Hq·(D+2) floats per chip — INDEPENDENT of context length, which makes
  this the right decode-time pattern (the all-gather/Ulysses family).
- `sp_decode_attention_ring`: KV blocks rotate around the axis with
  `ppermute` while the online-softmax state stays chip-local (ring
  attention, the blockwise pattern used at prefill/training scale where
  rotating KV overlaps with per-block compute). After axis_size hops every
  chip has seen the whole context; queries never move.

GQA mapping (q head h reads kv head h // (Hq//Hkv)) matches
ops.fused_decode. No counterpart exists in the reference (single-GPU dense
cache, NFAI.Vulkan/VulkanBufferManager.cs); reference frame: SURVEY §2.7
"SP/CP" row.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _local_flash(q, k, v, lengths, pos_offset, scale):
    """Flash partials over one local S-slice.

    q [B, Hq, D] — current token's post-rope queries
    k, v [B, Sl, Hkv, D] — local cache slice (global positions
        pos_offset .. pos_offset+Sl-1)
    lengths [B] — valid context length per row (global)
    Returns (acc [B, Hq, D] unnormalized f32, m [B, Hq], l [B, Hq]).
    Rows whose slice holds no valid position return (0, NEG_INF, 0) — the
    identity of the log-sum-exp merge.
    """
    b, hq, d = q.shape
    sl, hkv = k.shape[1], k.shape[2]
    r = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, r, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("bhrd,bshd->bhrs", qf, kf) * scale  # [B,Hkv,r,Sl]
    pos = pos_offset + jnp.arange(sl, dtype=jnp.int32)
    valid = pos[None, :] < lengths[:, None]  # [B, Sl]
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    m = jnp.max(scores, axis=-1)  # [B,Hkv,r]
    m_safe = jnp.maximum(m, NEG_INF / 2)  # all-masked rows: exp() -> 0
    p = jnp.exp(scores - m_safe[..., None])
    p = jnp.where(valid[:, None, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)  # [B,Hkv,r]
    acc = jnp.einsum("bhrs,bshd->bhrd", p, vf)  # [B,Hkv,r,D]
    return (
        acc.reshape(b, hq, d),
        m.reshape(b, hq),
        l.reshape(b, hq),
    )


def _merge_normalize(acc, m, l, axis_name):
    """Log-sum-exp merge of per-shard flash partials across `axis_name`."""
    m_g = jax.lax.pmax(m, axis_name)  # [B, Hq]
    corr = jnp.exp(jnp.maximum(m, NEG_INF / 2) - jnp.maximum(m_g, NEG_INF / 2))
    corr = jnp.where(m <= NEG_INF / 2, 0.0, corr)
    l_g = jax.lax.psum(l * corr, axis_name)
    acc_g = jax.lax.psum(acc * corr[..., None], axis_name)
    return acc_g / jnp.maximum(l_g, 1e-30)[..., None]


def sp_decode_attention(
    q: jax.Array,  # [B, Hq, D] post-rope queries (current token)
    k: jax.Array,  # [B, S, Hkv, D] — S sharded over `axis`
    v: jax.Array,  # [B, S, Hkv, D]
    lengths: jax.Array,  # [B] int32 valid context length
    mesh: Mesh,
    axis: str = "tp",
    scale: float | None = None,
) -> jax.Array:
    """Stats-merge sequence-parallel decode attention (see module doc).

    Returns [B, Hq, D] f32 — bit-comparable to dense softmax attention over
    the gathered cache up to f32 reduction order."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    n = mesh.shape[axis]
    sl = k.shape[1] // n

    def local(qc, kc, vc, lengths_c):
        off = jax.lax.axis_index(axis) * sl
        acc, m, l = _local_flash(qc, kc, vc, lengths_c, off, scale)
        return _merge_normalize(acc, m, l, axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None), P(None, axis, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )(q, k, v, lengths)


def sp_decode_attention_ring(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    scale: float | None = None,
) -> jax.Array:
    """Ring-rotation sequence-parallel decode attention (see module doc).
    Same result as `sp_decode_attention`; the collective pattern is
    axis_size-1 ppermute hops of the KV blocks instead of one stats merge."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    n = mesh.shape[axis]
    sl = k.shape[1] // n
    perm = [(i, (i + 1) % n) for i in range(n)]

    def local(qc, kc, vc, lengths_c):
        b, hq, _ = qc.shape
        idx = jax.lax.axis_index(axis)
        m = jnp.full((b, hq), NEG_INF, jnp.float32)
        l = jnp.zeros((b, hq), jnp.float32)
        acc = jnp.zeros((b, hq, d), jnp.float32)
        kb, vb = kc, vc
        # static unroll: n is a mesh constant; each step folds one block
        # into the online-softmax state, then rotates the block clockwise
        for step in range(n):
            owner = (idx - step) % n  # whose slice we currently hold
            a_b, m_b, l_b = _local_flash(
                qc, kb, vb, lengths_c, owner * sl, scale
            )
            m_new = jnp.maximum(m, m_b)
            m_safe = jnp.maximum(m_new, NEG_INF / 2)
            c_old = jnp.where(
                m <= NEG_INF / 2, 0.0, jnp.exp(jnp.maximum(m, NEG_INF / 2) - m_safe)
            )
            c_new = jnp.where(
                m_b <= NEG_INF / 2, 0.0,
                jnp.exp(jnp.maximum(m_b, NEG_INF / 2) - m_safe),
            )
            l = l * c_old + l_b * c_new
            acc = acc * c_old[..., None] + a_b * c_new[..., None]
            m = m_new
            if step != n - 1:
                kb = jax.lax.ppermute(kb, axis, perm)
                vb = jax.lax.ppermute(vb, axis, perm)
        return acc / jnp.maximum(l, 1e-30)[..., None]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None), P(None, axis, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )(q, k, v, lengths)


def sp_decode_attention_merged(
    q: jax.Array,  # [B, Hq, D]
    cache_kv: tuple[jax.Array, jax.Array],  # [B, S, KVD] merged-lane pair
    lengths: jax.Array,
    n_kv_heads: int,
    mesh: Mesh,
    axis: str = "tp",
    scale: float | None = None,
    ring: bool = False,
) -> jax.Array:
    """Adapter from the production merged-lane cache layout [B, S, KVD]
    (KVD = Hkv·D head-major, runtime.engine's dense cache per layer) to the
    sequence-parallel variants — proves the shipped layout needs only a
    reshape (no data movement) to shard over S instead of kv-heads."""
    k, v = cache_kv
    b, s, kvd = k.shape
    d = kvd // n_kv_heads
    k4 = k.reshape(b, s, n_kv_heads, d)
    v4 = v.reshape(b, s, n_kv_heads, d)
    fn = sp_decode_attention_ring if ring else sp_decode_attention
    return fn(q, k4, v4, lengths, mesh, axis=axis, scale=scale)
