"""Capture a jax profiler trace of the 1B q4 decode step and print a
per-op time breakdown (parsed from the XLA xplane protobuf via tensorflow).

Usage: python benchmarks/profile_decode.py [--size 1b] [--quant q4]
Writes the raw trace under /tmp/nfai_trace for tensorboard, and prints the
top ops by total self-time within one decode chunk.
"""
import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np


def build_state(size, quant, batch, seq, prompt):
    """Synthetic-model construction shared with bench.py — host-side numpy
    packing + one device_put, so the profile measures the SHIPPED container
    layout (v3/q8v3/fused-MLP, bf16 scales default) and 8B-class builds
    don't round-trip GBs through the TPU tunnel."""
    import bench as benchmod

    from nfai_tpu.models import KVCache

    cfg, params = benchmod.build_synthetic_params(
        size, quant=quant, context_length=max(seq, 2048)
    )
    cache = KVCache.zeros(cfg, batch, seq, jnp.bfloat16)
    return cfg, params, cache, cfg.vocab_size


def parse_xplane(logdir):
    """Sum per-op self times from the device xplane."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    tallies = collections.Counter()
    counts = collections.Counter()
    for plane in xspace.planes:
        name = plane.name.lower()
        if "tpu" not in name and "device" not in name and "axon" not in name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            lname = line.name.lower()
            # xla op lines hold per-op events; skip host threads
            if "step" in lname or "host" in lname:
                continue
            for ev in line.events:
                nm = ev_names.get(ev.metadata_id, "?")
                dur_us = ev.duration_ps / 1e6
                tallies[nm] += dur_us
                counts[nm] += 1
    return tallies, counts, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1b")
    ap.add_argument("--quant", default="q4")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--prefill", action="store_true",
                    help="trace one prefill_step call instead of a decode "
                         "chunk (use --prompt/--batch for the shape)")
    ap.add_argument("--prompt", type=int, default=128)
    args = ap.parse_args()

    from nfai_tpu.models.llama import decode_loop, prefill_step

    cfg, params, cache, vocab = build_state(args.size, args.quant, args.batch, args.seq, 128)
    B = args.batch

    if args.prefill:
        from nfai_tpu.models import KVCache

        T = args.prompt
        tokens = jnp.zeros((B, T), jnp.int32)
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        last = jnp.full((B,), T - 1, jnp.int32)

        def sync(x):
            return np.asarray(jnp.sum(x.astype(jnp.float32)))

        print("prefill warmup/compile...", flush=True)
        logits, cache = prefill_step(params, cfg, tokens, positions, last, cache)
        sync(logits)
        import time

        cache = KVCache.zeros(cfg, B, args.seq, jnp.bfloat16)
        t0 = time.perf_counter()
        logits, cache = prefill_step(params, cfg, tokens, positions, last, cache)
        sync(logits)
        print(f"warm prefill({B}x{T}): {(time.perf_counter()-t0)*1e3:.1f} ms",
              flush=True)
        logdir = "/tmp/nfai_trace_prefill"
        os.makedirs(logdir, exist_ok=True)
        cache = KVCache.zeros(cfg, B, args.seq, jnp.bfloat16)
        print("tracing one prefill...", flush=True)
        with jax.profiler.trace(logdir):
            logits, cache = prefill_step(params, cfg, tokens, positions, last, cache)
            sync(logits)
        parsed = parse_xplane(logdir)
        if parsed is None:
            print("no xplane captured")
            return
        tallies, counts, path = parsed
        total = sum(tallies.values())
        print(f"trace: {path}")
        print(f"device total: {total/1e3:.2f} ms (one prefill call)")
        print(f"{'us':>9}  {'count':>6}  op")
        for nm, us in tallies.most_common(args.top):
            print(f"{us:9.1f}  {counts[nm]:6d}  {nm[:110]}")
        return

    first = jnp.zeros((B,), jnp.int32)
    start = jnp.full((B,), 128, jnp.int32)
    rng = jax.random.PRNGKey(1)

    def chunk(cache, first, start, rng):
        toks, nxt, cache, rng = decode_loop(
            params, cfg, first, start, cache, rng, args.chunk, temperature=0.7
        )
        return toks, nxt, cache, rng

    def sync(x):
        return np.asarray(jnp.sum(x.astype(jnp.float32)))

    print("warmup/compile...", flush=True)
    toks, first, cache, rng = chunk(cache, first, start, rng)
    sync(toks)
    start = start + args.chunk
    import time

    t0 = time.perf_counter()
    toks, first, cache, rng = chunk(cache, first, start, rng)
    sync(toks)
    per_step = (time.perf_counter() - t0) / args.chunk
    print(f"warm chunk: {per_step*1e3:.2f} ms/step", flush=True)
    start = start + args.chunk

    logdir = "/tmp/nfai_trace"
    os.makedirs(logdir, exist_ok=True)
    print("tracing one chunk...", flush=True)
    with jax.profiler.trace(logdir):
        toks, first, cache, rng = chunk(cache, first, start, rng)
        sync(toks)

    parsed = parse_xplane(logdir)
    if parsed is None:
        print("no xplane captured (axon profiler unsupported?)")
        return
    tallies, counts, path = parsed
    total = sum(tallies.values())
    print(f"trace: {path}")
    print(f"device total: {total/1e3:.2f} ms over {args.chunk} steps "
          f"({total/args.chunk:.1f} us/step)")
    print(f"{'us/step':>9}  {'count':>6}  op")
    for nm, us in tallies.most_common(args.top):
        print(f"{us/args.chunk:9.1f}  {counts[nm]:6d}  {nm[:110]}")


if __name__ == "__main__":
    main()
