"""Perplexity evaluation (teacher-forced), llama.cpp-style sliding windows.

BASELINE.md's quality metric is "perplexity Δ vs FP16": quantized weights
(Q8_0/Q4_K fused kernels) must match the dense-dequantized forward within
llama.cpp's published deltas. The reference has no evaluation tooling at all
(SURVEY.md §4).

Usage:
    python -m nfai_tpu.eval --gguf model.gguf --text corpus.txt [--quantized/--dense]
"""
from __future__ import annotations

import argparse
import math
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("cfg",))
def _window_nll(params, cfg, tokens, positions, cache):
    """Sum of -log p(token[t+1] | tokens[..t]) over one window, plus count."""
    from .models.llama import forward, logits_for

    h, _ = forward(params, cfg, tokens, positions, cache)
    logits = logits_for(params, h)[:, :-1, :]  # predict tokens[1:]
    targets = tokens[:, 1:]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), targets.size


def perplexity(
    params,
    cfg,
    token_ids: np.ndarray,
    window: int = 512,
    dtype=jnp.float32,
    kv_quant: bool = False,
) -> float:
    """Perplexity over non-overlapping windows (llama.cpp `perplexity` style).

    `kv_quant` scores with the int8 KV cache (EngineConfig.kv_dtype="int8")
    so its accuracy cost is measurable against the full-precision cache."""
    from .models.llama import KVCache

    token_ids = np.asarray(token_ids, np.int32)
    n_windows = len(token_ids) // window
    if n_windows == 0:
        raise ValueError(
            f"need at least {window} tokens, got {len(token_ids)}"
        )
    total_nll, total_count = 0.0, 0
    positions = jnp.arange(window, dtype=jnp.int32)[None, :]
    for w in range(n_windows):
        chunk = token_ids[w * window : (w + 1) * window]
        cache = KVCache.zeros(cfg, 1, window, dtype, quantized=kv_quant)
        nll, count = _window_nll(
            params, cfg, jnp.asarray(chunk[None, :]), positions, cache
        )
        total_nll += float(nll)
        total_count += int(count)
    return math.exp(total_nll / total_count)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nfai_tpu.eval")
    p.add_argument("--gguf", required=True)
    p.add_argument("--text", required=True, help="UTF-8 text file to score")
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--max-tokens", type=int, default=0, help="0 = whole file")
    p.add_argument("--dense", action="store_true",
                   help="dequantize weights to dtype instead of fused kernels")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--compare", action="store_true",
                   help="evaluate both quantized and dense, report the delta")
    p.add_argument("--kv", default="auto", choices=["auto", "int8"],
                   help="KV cache storage during scoring (int8 adds a "
                        "'kv-int8' result row for the accuracy delta)")
    args = p.parse_args(argv)

    from .gguf import GGUFFile
    from .models import LlamaConfig, load_params
    from .tokenizer import tokenizer_from_gguf
    from .utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    text = open(args.text, encoding="utf-8").read()
    with GGUFFile.open(args.gguf) as g:
        cfg = LlamaConfig.from_gguf(g)
        # dispatches BPE vs SPM by tokenizer.ggml.model (SPM checkpoints fed
        # through the BPE path would fall back to <0xXX> byte tokens and
        # silently skew the perplexity)
        tok = tokenizer_from_gguf(g.metadata)
        ids = np.asarray(tok.encode(text), np.int32)
        if args.max_tokens:
            ids = ids[: args.max_tokens]
        print(f"{len(ids)} tokens, window {args.window}", file=sys.stderr)
        dtype = jnp.dtype(args.dtype)

        results = {}
        modes = ["quantized", "dense"] if args.compare else (
            ["dense"] if args.dense else ["quantized"]
        )
        for mode in modes:
            params = load_params(
                g, cfg, dtype=dtype, quantized="auto" if mode == "quantized" else False
            )
            results[mode] = perplexity(params, cfg, ids, args.window, dtype)
            print(f"ppl[{mode}] = {results[mode]:.4f}", file=sys.stderr)
            if args.kv == "int8":
                results[f"{mode}-kv-int8"] = perplexity(
                    params, cfg, ids, args.window, dtype, kv_quant=True
                )
                print(
                    f"ppl[{mode}-kv-int8] = {results[mode + '-kv-int8']:.4f}",
                    file=sys.stderr,
                )
            del params

    out = {f"ppl_{k}": round(v, 4) for k, v in results.items()}
    if "quantized" in results and "dense" in results:
        out["ppl_delta"] = round(results["quantized"] - results["dense"], 4)
    for mode in ("quantized", "dense"):
        if mode in results and f"{mode}-kv-int8" in results:
            out[f"ppl_kv_delta_{mode}"] = round(
                results[f"{mode}-kv-int8"] - results[mode], 4
            )
    import json

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
