#!/usr/bin/env python
"""Serving benchmark: continuous-batching throughput + TTFT percentiles.

Measures the BASELINE "p50 TTFT" metric end-to-end through the real stack
(GGUF file → engine → BatchEngine scheduler): N concurrent chat-sized
requests are submitted together and generate in continuous batches.

    python benchmarks/serve_bench.py [--requests 16] [--max-batch 8] ...

Prints one JSON line with p50/p90 TTFT and aggregate decode throughput.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--prompt-tokens", type=int, default=64)
    p.add_argument("--max-new", type=int, default=64)
    p.add_argument("--decode-chunk", type=int, default=16)
    p.add_argument("--max-seq", type=int, default=256)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--quant", default="q8_0", choices=["f16", "q8_0", "q4_k"])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--stagger-ms", type=float, default=0.0,
                   help="inter-arrival gap: requests arrive over time while "
                        "earlier ones decode (exercises chunked-prefill "
                        "overlap instead of submit-all-at-once)")
    p.add_argument("--poisson", type=float, default=0.0,
                   help="bursty arrivals: Poisson request rate (req/s, "
                        "seeded exponential inter-arrival gaps); overrides "
                        "--stagger-ms")
    p.add_argument("--prefill-ticks", type=int, default=1,
                   help="prefill chunks per scheduler step "
                        "(BatchEngine.prefill_ticks_per_step): higher "
                        "drains arrival bursts faster at some decode cost")
    p.add_argument("--dense", action="store_true",
                   help="dense per-slot KV instead of the paged pool")
    args = p.parse_args()

    from nfai_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from nfai_tpu.config import EngineConfig, SamplingParams
    from nfai_tpu.gguf import GGMLType
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.runtime.engine import InferenceEngine
    from nfai_tpu.runtime.scheduler import BatchEngine

    quant = {
        "f16": GGMLType.F16,
        "q8_0": GGMLType.Q8_0,
        "q4_k": GGMLType.Q4_K,
    }[args.quant]
    import tempfile

    path = (
        Path(tempfile.gettempdir())
        / f"serve_bench_{args.hidden}_{args.layers}_{args.quant}.gguf"
    )
    if not path.exists():
        t0 = time.perf_counter()
        make_tiny_llama_gguf(
            path,
            vocab_size=32768,
            hidden=args.hidden,
            n_layers=args.layers,
            n_heads=args.hidden // 128,
            n_kv_heads=max(args.hidden // 512, 1),
            ffn_dim=args.hidden * 4,
            context_length=4096,
            quant=quant,
            seed=7,
        )
        print(f"wrote fixture in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    engine = InferenceEngine(
        path,
        EngineConfig(
            max_seq_len=args.max_seq, dtype=args.dtype, prefill_chunk=64
        ),
    )
    print(f"engine load: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    be = BatchEngine(
        engine, max_batch=args.max_batch, decode_chunk=args.decode_chunk,
        paged=not args.dense, prefill_ticks_per_step=args.prefill_ticks,
    )

    rng = np.random.default_rng(0)
    sampling = SamplingParams(temperature=0.7, max_new_tokens=args.max_new, seed=1)
    # warmup (compile prefill/decode variants)
    w = be.submit([int(x) for x in rng.integers(5, 30000, 8)], sampling)
    while be.step():
        pass
    _ = w

    prompts = [
        [int(x) for x in rng.integers(5, 30000, args.prompt_tokens)]
        for _ in range(args.requests)
    ]
    reqs = []
    gaps = None
    if args.poisson > 0:
        arr_rng = np.random.default_rng(11)
        gaps = arr_rng.exponential(1.0 / args.poisson, args.requests)
        gaps[0] = 0.0
    t0 = time.perf_counter()
    if gaps is not None:
        # Poisson arrivals: bursty TTFT behaviour under load
        be.start()
        target = t0
        for prompt, gap in zip(prompts, gaps):
            target += gap
            delay = target - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            reqs.append(be.submit(prompt, sampling))
        for r in reqs:
            for _ in r.stream(timeout=600):
                pass
        be.close()
    elif args.stagger_ms > 0:
        # staggered arrivals: the scheduler thread decodes while each new
        # request prefills chunk-by-chunk between decode chunks
        be.start()
        for i, prompt in enumerate(prompts):
            target = t0 + i * args.stagger_ms / 1e3
            delay = target - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            reqs.append(be.submit(prompt, sampling))
        for r in reqs:
            for _ in r.stream(timeout=600):
                pass
        be.close()
    else:
        reqs = [be.submit(prompt, sampling) for prompt in prompts]
        for r in reqs:  # reset arrival stamps to the benchmark start
            r.submitted_at = t0
        while be.step():
            pass
    wall = time.perf_counter() - t0

    ttfts = sorted(r.ttft_s for r in reqs if r.ttft_s is not None)
    total_new = sum(len(r.output_ids) for r in reqs)
    p50 = ttfts[len(ttfts) // 2]
    p90 = ttfts[int(len(ttfts) * 0.9)]
    print(
        f"{args.requests} reqs x {args.prompt_tokens} prompt/{args.max_new} new | "
        f"wall {wall:.2f}s | {total_new/wall:.1f} tok/s | "
        f"TTFT p50 {p50*1e3:.0f} ms p90 {p90*1e3:.0f} ms",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"serve_p50_ttft_ms_{args.quant}_b{args.max_batch}",
                "value": round(p50 * 1e3, 1),
                "unit": "ms",
                "vs_baseline": 0.0,
                "extra": {
                    "p90_ttft_ms": round(p90 * 1e3, 1),
                    "p99_ttft_ms": round(
                        ttfts[min(len(ttfts) - 1, int(len(ttfts) * 0.99))]
                        * 1e3, 1,
                    ),
                    "decode_tok_s": round(total_new / wall, 1),
                    "arrivals": (
                        f"poisson_{args.poisson}rps" if args.poisson > 0
                        else (f"stagger_{args.stagger_ms}ms"
                              if args.stagger_ms > 0 else "burst_all")
                    ),
                    "prefill_ticks": args.prefill_ticks,
                    "spec_accept_rate": (
                        round(be.spec_accepted / be.spec_drafted, 3)
                        if be.spec_drafted else None
                    ),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
