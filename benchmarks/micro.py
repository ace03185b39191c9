"""Microbenchmarks for the decode hot path on the real chip.

Times each candidate implementation standalone (amortized over many inner
iterations via lax.scan so the ~26 ms tunnel dispatch latency vanishes).
Usage: python benchmarks/micro.py [attn|qmm|rope|step] ...
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import numpy as np

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

B, HQ, HKV, D, S, L = 8, 32, 8, 64, 1024, 16
H = 2048


def sync(x):
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def _timed(fn, args, rep):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(rep):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def scan_n(fn, n=64):
    """Wrap fn (state -> state) in a jitted scan of n steps."""

    @jax.jit
    def run(state):
        def body(c, _):
            return fn(c), ()

        c, _ = jax.lax.scan(body, state, length=n)
        return c

    return run, n


def bench_slope(name, step_fn, state, n=64, rep=3):
    """Per-iteration cost via two-point measurement (n and 2n scan lengths):
    the ~26 ms fixed dispatch latency of this tunnel cancels in the slope."""
    r1, _ = scan_n(step_fn, n)
    r2, _ = scan_n(step_fn, 2 * n)
    t1 = _timed(r1, (state,), rep)
    t2 = _timed(r2, (state,), rep)
    per = (t2 - t1) / n
    print(f"{name}: {per*1e6:.1f} us/iter  (t{n}={t1*1e3:.1f}ms t{2*n}={t2*1e3:.1f}ms)", flush=True)
    return per


def attn_benches():
    from nfai_tpu.ops.fused_decode import layered_decode_attention

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    KVD = HKV * D
    q = jax.random.normal(k1, (B, HQ, D), jnp.bfloat16)
    kn = jax.random.normal(k1, (B, KVD), jnp.bfloat16)
    vn = jax.random.normal(k1, (B, KVD), jnp.bfloat16)
    kc = jax.random.normal(k2, (L, B, S, KVD), jnp.bfloat16)
    vc = jax.random.normal(k3, (L, B, S, KVD), jnp.bfloat16)
    starts = jnp.full((B,), S - 1, jnp.int32)
    positions = jnp.full((B, 1), S - 1, jnp.int32)

    ideal = 2 * B * S * KVD * 2 / 819e9 * L
    print(f"[attn] per-{L}-layer-step ideal (full-S read): {ideal*1e3:.3f} ms")

    def mk_einsum():
        from nfai_tpu.models.llama import _cached_attention

        def step(c):
            q, kc, vc = c
            o = _cached_attention(q[:, None], kc[0], vc[0], positions)
            return (q + o[:, 0] * 1e-6, kc, vc)

        return step

    def mk_kernel(s_block):
        def step(c):
            q, kc, vc = c
            o = layered_decode_attention(
                q, kn, vn, kc, vc, jnp.int32(0), starts, s_block=s_block
            )
            return (q + o * 1e-6, kc, vc)

        return step

    t = bench_slope("einsum xla attention", mk_einsum(), (q, kc, vc))
    print(f"  = {t*L*1e3:.3f} ms per step of {L} layers")
    for sb in (256, 512, 1024):
        t = bench_slope(f"layered kernel s_block={sb}", mk_kernel(sb), (q, kc, vc))
        print(f"  = {t*L*1e3:.3f} ms per step of {L} layers")


def qmm_benches():
    from nfai_tpu.ops.qmatmul import qmatmul
    from nfai_tpu.ops.qtensor import QTensor

    key = jax.random.PRNGKey(1)
    shapes = [(H, 3072), (H, H), (H, 2 * 8192), (8192, H), (H, 128256)]
    reps = [L, L, L, L, 1]
    total_ideal = 0.0
    total_meas = 0.0
    for (k, n), rep in zip(shapes, reps):
        kk = jax.random.split(key, 4)
        x = jax.random.normal(kk[0], (B, k), jnp.bfloat16)
        qs = jax.random.randint(kk[1], (k // 2, n), -128, 128, jnp.int32).astype(jnp.int8)
        scales = jax.random.uniform(kk[2], (k // 32, n), jnp.float32) * 0.004
        mins = scales * 8.0
        qt = QTensor(qs, scales, mins, "q4", k, n)
        wbytes = qs.size + scales.size * 4 + mins.size * 4
        ideal = wbytes / 819e9

        # the carry must FEED the matmul or XLA hoists it out of the scan as
        # loop-invariant (measured: slope collapses to 0)
        def step(c, qt=qt):
            x = c
            y = qmatmul(x, qt)
            return x * (1.0 + 1e-9 * jnp.mean(y).astype(x.dtype))

        t = bench_slope(f"q4 matmul {k}x{n}", step, x, n=128)
        print(f"  ideal {ideal*1e6:.1f} us, eff {ideal/t:.2f}")
        total_ideal += ideal * rep
        total_meas += t * rep

        # dense bf16 comparison
        w = jax.random.normal(kk[3], (k, n), jnp.bfloat16)

        def dstep(c, w=w):
            x = c
            y = x @ w
            return x * (1.0 + 1e-9 * jnp.mean(y).astype(x.dtype))

        td = bench_slope(f"dense bf16 {k}x{n}", dstep, x, n=128)
        print(f"  ideal {k*n*2/819e9*1e6:.1f} us, eff {k*n*2/819e9/td:.2f}")
    print(f"[qmm] full-model matmul bytes-time: measured {total_meas*1e3:.3f} ms vs ideal {total_ideal*1e3:.3f} ms")


def rope_norm_benches():
    from nfai_tpu.ops import apply_rope, rms_norm
    from nfai_tpu.ops.rope import compute_inv_freq

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, 1, HQ, D), jnp.bfloat16)
    h = jax.random.normal(key, (B, 1, H), jnp.bfloat16)
    g = jnp.ones((H,), jnp.float32)
    inv = jnp.asarray(compute_inv_freq(D, 500000.0))
    pos = jnp.full((B, 1), 511, jnp.int32)

    def rope_step(c):
        x, pos = c
        return (apply_rope(x, pos, inv), pos)

    def rope_neox_step(c):
        x, pos = c
        return (apply_rope(x, pos, inv, neox=True), pos)

    bench_slope("rope NORM q [8,1,32,64]", rope_step, (x, pos), n=512)
    bench_slope("rope NEOX q [8,1,32,64]", rope_neox_step, (x, pos), n=512)
    bench_slope("rmsnorm [8,1,2048]", lambda c: (rms_norm(c[0], g),), (h,), n=512)


def sampling_bench():
    from nfai_tpu.ops.sampling import sample_logits

    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (B, 128256), jnp.float32)

    def step(c):
        lg, k = c
        k, sub = jax.random.split(k)
        t = sample_logits(lg, sub, 0.7, 40, 0.95)
        return (lg + t[:, None] * 1e-9, k)

    bench_slope("sampling [8,128256]", step, (logits, key))


def cache_write_bench():
    from nfai_tpu.models.llama import _write_cache

    key = jax.random.PRNGKey(4)
    kc = jax.random.normal(key, (HKV, B, S, D), jnp.bfloat16)
    new = jax.random.normal(key, (B, 1, HKV, D), jnp.bfloat16)
    starts = jnp.full((B,), 600, jnp.int32)

    bench_slope(
        "cache write nonuniform",
        lambda kc: _write_cache(kc, new, starts, False),
        kc, n=512,
    )
    bench_slope(
        "cache write uniform",
        lambda kc: _write_cache(kc, new, starts, True),
        kc, n=512,
    )


if __name__ == "__main__":
    which = sys.argv[1:] or ["attn", "qmm", "rope", "sample", "cache"]
    dev = jax.devices()[0]
    print("device:", dev)
    if "attn" in which:
        attn_benches()
    if "qmm" in which:
        qmm_benches()
    if "rope" in which:
        rope_norm_benches()
    if "sample" in which:
        sampling_bench()
    if "cache" in which:
        cache_write_bench()
