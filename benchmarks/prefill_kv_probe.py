"""Probe: flash prefill attention reading the cache in native merged-lane
[B, S, KVD] layout (BlockSpec lane-slices one head per grid step) vs the
shipped transpose-to-head-major path.

The 2x2048 1B prefill profile shows the per-layer head-major transpose at
~27 ms + ~23 ms of follow-on per-batch slices (vs 27 ms for the attention
kernel itself) — if Mosaic accepts d-wide lane-offset blocks at odd
multiples of 64, the transpose disappears for free.
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

from nfai_tpu.ops.prefill_attention import flash_prefill_attention


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def run(name, b, t, hq, hkv, d, s, iters=16):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(b, s, hkv * d)), jnp.bfloat16)
    vv = jnp.asarray(rng.normal(size=(b, s, hkv * d)), jnp.bfloat16)
    off = jnp.zeros((b,), jnp.int32)

    @jax.jit
    def headmajor(q, kv, vv, off):
        kh = kv.reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
        vh = vv.reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
        return flash_prefill_attention(q, kh, vh, off)

    @jax.jit
    def merged(q, kv, vv, off):
        return flash_prefill_attention(q, kv, vv, off, kv_layout="merged")

    @jax.jit
    def full256(q, kv, vv, off):
        return flash_prefill_attention(q, kv, vv, off, kv_layout="full")

    @jax.jit
    def full128(q, kv, vv, off):
        return flash_prefill_attention(q, kv, vv, off, kv_layout="full",
                                       t_block=128)

    a = headmajor(q, kv, vv, off)
    sync(a)
    aref = np.asarray(a, np.float32)
    ascale = np.abs(aref).max() + 1e-6
    variants = []
    for fn, label in ((headmajor, "headmajor"), (merged, "merged"),
                      (full256, "full256"), (full128, "full128")):
        try:
            out = fn(q, kv, vv, off)
            sync(out)
        except Exception as e:
            print(f"{name} {label}: COMPILE FAIL: {str(e)[:200]}", flush=True)
            continue
        dev = np.abs(np.asarray(out, np.float32) - aref).max() / ascale
        print(f"{name} {label}: rel dev {dev:.5f} "
              f"{'OK' if dev < 2e-2 else 'FAIL'}", flush=True)
        variants.append((fn, label))
    for fn, label in variants:
        out = fn(q, kv, vv, off)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(q, kv, vv, off)
        sync(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name} {label}: {dt:.3f} ms", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    # 1B shape: d=64 -> odd 64-lane offsets for odd heads
    run("1b 2x2048/s4096", b=2, t=2048, hq=32, hkv=8, d=64, s=4096)
    # 8B shape: d=128 -> aligned
    run("8b 2x2048/s4096", b=2, t=2048, hq=32, hkv=8, d=128, s=4096)


if __name__ == "__main__":
    main()
