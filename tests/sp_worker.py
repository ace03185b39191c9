"""Worker for tests/test_seq_parallel.py — runs the sequence-parallel
parity checks in a SUBPROCESS (same reason as tests/ep_worker.py: heavy
8-virtual-device shard_map compile sets leave this image's XLA:CPU in a
state where a later, unrelated in-process compile segfaults; bisected r4).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nfai_tpu.parallel.mesh import make_mesh  # noqa: E402
from nfai_tpu.parallel.seq_parallel import (  # noqa: E402
    sp_decode_attention,
    sp_decode_attention_merged,
    sp_decode_attention_ring,
)


def dense_ref(q, k, v, lengths, scale):
    b, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    r = hq // hkv
    out = np.zeros((b, hq, d), np.float32)
    for bi in range(b):
        for h in range(hq):
            kv = h // r
            sc = (k[bi, :, kv] @ q[bi, h]) * scale
            sc = np.where(np.arange(s) < lengths[bi], sc, -np.inf)
            sc = sc - sc.max()
            p = np.exp(sc)
            p = p / p.sum()
            out[bi, h] = p @ v[bi, :, kv]
    return out


def main() -> int:
    rng = np.random.default_rng(7)
    B, S, HQ, HKV, D = 3, 64, 8, 4, 16
    q = rng.standard_normal((B, HQ, D), np.float32)
    k = rng.standard_normal((B, S, HKV, D), np.float32)
    v = rng.standard_normal((B, S, HKV, D), np.float32)
    lengths = np.array([64, 5, 37], np.int32)  # ragged across shards
    scale = D ** -0.5
    ref = dense_ref(q, k, v, lengths, scale)
    qj, kj, vj, lj = map(jnp.asarray, (q, k, v, lengths))

    mesh = make_mesh({"dp": 1, "tp": 8})
    a = np.asarray(sp_decode_attention(qj, kj, vj, lj, mesh))
    np.testing.assert_allclose(a, ref, rtol=2e-5, atol=2e-5)
    print("stats-merge OK")
    b = np.asarray(sp_decode_attention_ring(qj, kj, vj, lj, mesh))
    np.testing.assert_allclose(b, ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)
    print("ring OK")

    # merged-lane adapter (production cache layout shards with a reshape)
    km = jnp.asarray(k.reshape(B, S, HKV * D))
    vm = jnp.asarray(v.reshape(B, S, HKV * D))
    for ring in (False, True):
        out = sp_decode_attention_merged(qj, (km, vm), lj, HKV, mesh,
                                         ring=ring)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                                   atol=2e-5)
    print("merged-lane OK")

    # jit + physically S-sharded inputs (deployment shape)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, "tp", None, None))
    kd = jax.device_put(kj, sh)
    vd = jax.device_put(vj, sh)
    fn = jax.jit(lambda q, k, v, ln: sp_decode_attention(q, k, v, ln, mesh))
    out = fn(qj, kd, vd, lj)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
    print("jit+sharded OK")

    # axis size 1 degenerate
    mesh1 = make_mesh({"dp": 8, "tp": 1})
    for f in (sp_decode_attention, sp_decode_attention_ring):
        out = f(qj, kj, vj, lj, mesh1)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5,
                                   atol=2e-5)
    print("single-shard OK")
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
