"""Sweep layered_decode_attention s_block + measure per-layer cost on TPU.

1B-shape decode config: Hkv=8, r=4, B=8, S=1024, D=64. The per-step profile
(benchmarks/profile_decode.py) shows ~100 us/layer vs ~20 us bandwidth ideal
at full length; this isolates the kernel to find the knee (grid overhead vs
DMA efficiency vs VPU softmax state).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np

from nfai_tpu.ops.fused_decode import layered_decode_attention

L, HKV, R, B, S, D = 16, 8, 4, 8, 1024, 64


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    KVD = HKV * D
    q = jax.random.normal(ks[0], (B, HKV * R, D), jnp.bfloat16)
    kn = jax.random.normal(ks[1], (B, KVD), jnp.bfloat16)
    vn = jax.random.normal(ks[2], (B, KVD), jnp.bfloat16)
    kc = jax.random.normal(ks[3], (L, B, S, KVD), jnp.bfloat16)
    vc = jax.random.normal(ks[4], (L, B, S, KVD), jnp.bfloat16)

    for name, starts in (
        ("full", jnp.full((B,), S - 1, jnp.int32)),
        ("mid", jnp.full((B,), 384, jnp.int32)),
    ):
        for s_block in (256, 512):
            @jax.jit
            def run(q, kn, vn, kc, vc, starts, s_block=s_block):
                def body(i, acc):
                    o = layered_decode_attention(
                        q, kn, vn, kc, vc, i % L, starts, s_block=s_block
                    )
                    return acc + o.astype(jnp.float32)

                return jax.lax.fori_loop(
                    0, L, body, jnp.zeros((B, HKV * R, D), jnp.float32)
                )

            out = run(q, kn, vn, kc, vc, starts)
            sync(out)
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                out = run(q, kn, vn, kc, vc, starts)
            sync(out)
            dt = (time.perf_counter() - t0) / reps / L * 1e6
            print(f"starts={name:4s} s_block={s_block:5d}: {dt:7.1f} us/layer",
                  flush=True)


if __name__ == "__main__":
    main()
