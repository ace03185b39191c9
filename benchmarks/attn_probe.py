"""Standalone decode-attention probe: layered_decode_attention on the 1B
driver-bench shapes at several fill levels, vs the DMA roofline.

Usage: python benchmarks/attn_probe.py [--s-block N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(np.asarray(jnp.sum(jnp.asarray(x, jnp.float32))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s-block", type=int, default=256)
    ap.add_argument("--impl", default="per-row", choices=["per-row", "slab"])
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    from nfai_tpu.ops.fused_decode import (
        layered_decode_attention,
        layered_decode_attention_slab,
    )

    attn = (layered_decode_attention_slab if args.impl == "slab"
            else layered_decode_attention)

    L, B, S, HKV, D, HQ = 16, 8, 1024, 8, 64, 32
    KVD = HKV * D
    key = jax.random.PRNGKey(0)
    kc = jax.random.normal(key, (L, B, S, KVD), jnp.bfloat16)
    vc = jax.random.normal(key, (L, B, S, KVD), jnp.bfloat16)
    q = jax.random.normal(key, (B, HQ, D), jnp.bfloat16)
    kn = jax.random.normal(key, (B, KVD), jnp.bfloat16)
    vn = jax.random.normal(key, (B, KVD), jnp.bfloat16)

    @jax.jit
    def run16(q, kn, vn, kc, vc, starts):
        # 16 sequential calls ~ one decode step's attention column
        out = 0.0
        for layer in range(L):
            out += attn(
                q, kn, vn, kc, vc, jnp.int32(layer), starts,
                s_block=args.s_block,
            ).astype(jnp.float32)
        return out

    for fill in (128, 256, 512, 1024):
        starts = jnp.full((B,), fill - 1, jnp.int32)
        sync(run16(q, kn, vn, kc, vc, starts))
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.iters):
            acc = run16(q, kn, vn, kc, vc, starts)
        sync(acc)
        dt = (time.perf_counter() - t0) / args.iters
        nblocks = -(-fill // args.s_block)
        bytes_ = 2 * L * B * nblocks * args.s_block * KVD * 2
        ideal = bytes_ / 819e9
        print(
            f"fill {fill:5d}: {dt*1e6:8.1f} us per 16-layer column "
            f"({dt*1e6/L:6.2f}/layer) | DMA ideal {ideal*1e6:6.1f} us "
            f"| ratio {dt/ideal:5.2f}"
        )


if __name__ == "__main__":
    main()
