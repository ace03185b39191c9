"""Sequence-parallel decode attention rehearsal on the 8-virtual-device CPU
mesh (SURVEY §2.7/§5 long-context: the kv-cache layout keeps the door open to
ring/all-gather sequence parallelism — this proves the door actually opens).

Both collective patterns (stats-merge psum and ppermute ring) must match a
dense single-device softmax-attention reference over the gathered cache,
including ragged per-row lengths (rows whose context lives entirely on a
subset of the shards) and GQA head mapping.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfai_tpu.parallel.mesh import make_mesh
from nfai_tpu.parallel.seq_parallel import (
    sp_decode_attention,
    sp_decode_attention_merged,
    sp_decode_attention_ring,
)


def dense_ref(q, k, v, lengths, scale):
    """[B,Hq,D] x [B,S,Hkv,D] dense GQA attention, f64-free f32 reference."""
    b, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    r = hq // hkv
    out = np.zeros((b, hq, d), np.float32)
    for bi in range(b):
        for h in range(hq):
            kv = h // r
            sc = (k[bi, :, kv] @ q[bi, h]) * scale  # [S]
            sc = np.where(np.arange(s) < lengths[bi], sc, -np.inf)
            sc = sc - sc.max()
            p = np.exp(sc)
            p = p / p.sum()
            out[bi, h] = p @ v[bi, :, kv]
    return out


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"dp": 1, "tp": 8})


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    B, S, HQ, HKV, D = 3, 64, 8, 4, 16
    q = rng.standard_normal((B, HQ, D), np.float32)
    k = rng.standard_normal((B, S, HKV, D), np.float32)
    v = rng.standard_normal((B, S, HKV, D), np.float32)
    # ragged: row 0 spans all shards, row 1 only shard 0, row 2 mid-shard
    lengths = np.array([64, 5, 37], np.int32)
    scale = D ** -0.5
    ref = dense_ref(q, k, v, lengths, scale)
    return q, k, v, lengths, scale, ref


def test_stats_merge_matches_dense(mesh, problem):
    q, k, v, lengths, scale, ref = problem
    out = sp_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), mesh,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_ring_matches_dense(mesh, problem):
    q, k, v, lengths, scale, ref = problem
    out = sp_decode_attention_ring(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), mesh,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_ring_equals_stats_merge_bitwise_shapes(mesh, problem):
    q, k, v, lengths, scale, ref = problem
    a = np.asarray(sp_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), mesh,
    ))
    b = np.asarray(sp_decode_attention_ring(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), mesh,
    ))
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)


def test_merged_lane_adapter(mesh, problem):
    """The production [B, S, KVD] merged-lane cache layout shards over S
    with only a reshape — the door-open claim of parallel/sharding.py."""
    q, k, v, lengths, scale, ref = problem
    b, s, hkv, d = k.shape
    km = jnp.asarray(k.reshape(b, s, hkv * d))
    vm = jnp.asarray(v.reshape(b, s, hkv * d))
    for ring in (False, True):
        out = sp_decode_attention_merged(
            jnp.asarray(q), (km, vm), jnp.asarray(lengths), hkv, mesh,
            ring=ring,
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_under_jit_and_sharded_inputs(mesh, problem):
    """jit + explicitly S-sharded device arrays (the deployment shape:
    cache lives sharded, nothing re-gathers on entry)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v, lengths, scale, ref = problem
    sh = NamedSharding(mesh, P(None, "tp", None, None))
    kd = jax.device_put(jnp.asarray(k), sh)
    vd = jax.device_put(jnp.asarray(v), sh)
    fn = jax.jit(
        lambda q, k, v, ln: sp_decode_attention(q, k, v, ln, mesh)
    )
    out = fn(jnp.asarray(q), kd, vd, jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_single_shard_degenerate(problem):
    """axis size 1: both variants reduce to plain local flash attention."""
    mesh1 = make_mesh({"dp": 8, "tp": 1})
    q, k, v, lengths, scale, ref = problem
    for fn in (sp_decode_attention, sp_decode_attention_ring):
        out = fn(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(lengths), mesh1,
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
