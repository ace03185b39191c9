"""Dump the optimized HLO of the 1B q4 decode chunk and summarize copies.

Usage: python benchmarks/dump_hlo.py [--grep copy-start] [--out /tmp/decode.hlo]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from benchmarks.profile_decode import build_state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1b")
    ap.add_argument("--quant", default="q4")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--out", default="/tmp/decode.hlo")
    args = ap.parse_args()

    from nfai_tpu.models.llama import decode_loop

    cfg, params, cache, vocab = build_state(
        args.size, args.quant, args.batch, args.seq, 128
    )
    B = args.batch
    first = jnp.zeros((B,), jnp.int32)
    start = jnp.full((B,), 128, jnp.int32)
    rng = jax.random.PRNGKey(1)

    lowered = decode_loop.lower(
        params, cfg, first, start, cache, rng, args.chunk, temperature=0.7
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")
    n = 0
    for line in txt.splitlines():
        if "copy-start" in line:
            n += 1
            if n <= 40:
                print(line.strip()[:400])
    print(f"total copy-start lines: {n}")


if __name__ == "__main__":
    main()
