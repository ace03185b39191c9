"""Standalone timing of the layer-indexed q4 matmul at each 1B model shape.

Compares against the in-model per-call times from profile_decode (v5e, 1B q4
b8 S1024: wqkv 18us, wo 13us, gate_up 92us, w_down 43us, lm_head 658us) to
separate kernel inefficiency from in-graph contention (the XLA memory-space
copies seen in the decode HLO).

Usage: python benchmarks/qmm_layered_sweep.py
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np

from nfai_tpu.ops import qmatmul as qm
from nfai_tpu.ops.qtensor import QTensor

B, L = 8, 16
SHAPES = {  # name: (K, N, layered, in-model us/call from profile_decode)
    "wqkv": (2048, 3072, True, 17.9),
    "wo": (2048, 2048, True, 12.9),
    "gate_up": (2048, 16384, True, 92.3),
    "w_down": (8192, 2048, True, 42.8),
    "lm_head": (2048, 128256, False, 658.2),
}


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("n", "layered"))
def run_chain(x, qs, scales, mins, n, layered):
    k = x.shape[1]
    nn = qs.shape[-1]
    qt = QTensor(qs, scales, mins, "q4", k, nn)

    l = qs.shape[0] if layered else 1

    def body(c, i):
        if layered:
            y = qm.qmatmul_layered(c, qt, i % l)
        else:
            y = qm.qmatmul(c, qt)
        # full-sum feedback keeps every output element live (no DCE) and
        # each call data-dependent on the previous
        bump = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(c.dtype)
        return c + bump, ()

    c, _ = jax.lax.scan(body, x, jnp.arange(n, dtype=jnp.int32))
    return c


def bench(name, x, qs, scales, mins, layered, ideal_us, prof_us, n=64, rep=5):
    def timed(m):
        t0 = time.perf_counter()
        sync(run_chain(x, qs, scales, mins, m, layered))
        return time.perf_counter() - t0

    timed(n), timed(2 * n)  # compile both
    t1 = min(timed(n) for _ in range(rep))
    t2 = min(timed(2 * n) for _ in range(rep))
    per = (t2 - t1) / n * 1e6
    print(
        f"{name:>10}: {per:8.1f} us/call  ideal {ideal_us:7.1f}  "
        f"({per/ideal_us:4.2f}x)   in-model {prof_us:6.1f} us",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    args = ap.parse_args()
    print("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)

    for name, (k, n, layered, prof_us) in SHAPES.items():
        kk = iter(jax.random.split(jax.random.fold_in(key, 7), 8))
        lead = (L,) if layered else ()
        qs = jax.random.randint(
            next(kk), (*lead, k // 2, n), -128, 128, jnp.int32
        ).astype(jnp.int8)
        scales = (
            jax.random.uniform(next(kk), (*lead, k // 32, n), jnp.float32) * 0.004
        )
        mins = scales * 8.0
        x = jax.random.normal(next(kk), (B, k), jnp.bfloat16)
        per_layer_bytes = (qs.size + scales.size * 8) // (L if layered else 1)
        ideal = per_layer_bytes / (args.hbm_gbps * 1e3)  # us
        bench(name, x, qs, scales, mins, layered, ideal, prof_us)


if __name__ == "__main__":
    main()
