#!/usr/bin/env python
"""Decode-throughput benchmark. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so `vs_baseline` reports
efficiency against the HBM-bandwidth roofline for the same model/batch/seq on
this chip (decode is bandwidth-bound: every step must stream all weights plus
the KV cache). 1.0 == speed of light.

Default config mirrors BASELINE config 2: Llama-3.2-1B shapes, bf16, batched
sampling with KV cache on one chip. Weights are synthetic (no model files ship
with the image; the compute path is identical).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

SIZES = {
    # name: (hidden, layers, heads, kv_heads, ffn, vocab)
    "tiny": (256, 4, 8, 4, 512, 512),
    "small": (1024, 4, 8, 4, 2048, 8192),  # CPU-mesh scaling rehearsals
    "1b": (2048, 16, 32, 8, 8192, 128256),
    "3b": (3072, 28, 24, 8, 8192, 128256),
    "8b": (4096, 32, 32, 8, 14336, 128256),
    # per-chip SHARD shapes of the tensor-parallel configs: each TP chip
    # executes exactly this local workload inside the whole-scan shard_map
    # decode (heads/kv/ffn/vocab divided by tp; hidden unchanged, head_dim
    # pinned with a 7th element), so the single-chip rate on these shapes
    # bounds TP per-chip throughput from above (collectives come on top).
    # BASELINE config 5 evidence on one real chip.
    "1b-tp4shard": (2048, 16, 8, 2, 2048, 32064, 64),
    "8b-tp4shard": (4096, 32, 8, 2, 3584, 32064, 128),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_synthetic_params(
    size: str,
    quant: str = "q4",
    dtype_name: str = "bfloat16",
    vocab_override: int = 0,
    experts: int = 0,
    experts_used: int = 8,
    moe_ffn: int = 768,
    no_mins: bool = False,
    mins_bf16: bool = False,
    scales_bf16: bool = False,
    no_v3: bool = False,
    seed: int = 0,
    context_length: int = 2048,
):
    """Synthetic Llama-3.2-shaped weights, built HOST-side (numpy) and
    packed into the same containers `models.llama.load_params` produces
    (v3 / q8v3 / fused-MLP), then device_put ONCE. Shared by bench.py and
    benchmarks/profile_decode.py so profiles measure the shipped layout.
    Returns (cfg, params_on_device)."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from nfai_tpu.models.llama import LlamaConfig
    from nfai_tpu.ops.qtensor import QTensor
    from nfai_tpu.ops.rope import compute_inv_freq

    spec = SIZES[size]
    hidden, layers, heads, kv_heads, ffn, vocab = spec[:6]
    if vocab_override:
        vocab = vocab_override
    head_dim = spec[6] if len(spec) > 6 else hidden // heads
    moe = experts > 0
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, n_layers=layers, n_heads=heads,
        n_kv_heads=kv_heads, head_dim=head_dim, ffn_dim=ffn,
        rope_base=500000.0, context_length=context_length,
        n_experts=experts if moe else 0,
        n_experts_used=experts_used if moe else 0,
        moe_ffn_dim=moe_ffn if moe else 0,
    )
    dtype = jnp.dtype(dtype_name)
    nrng = _np.random.default_rng(seed)

    def rand(*shape):
        return jnp.asarray(
            (nrng.standard_normal(shape, _np.float32) * 0.02), dtype
        )

    def weight(*shape, pad_n_to=1):
        """(..., K, N) weight — dense or synthetic-quantized per `quant`.
        `pad_n_to` N-pads the quantized container (logical n preserved) the
        way load_params pads the LM head for wide-lane kernel tiles."""
        if quant == "none":
            return rand(*shape)
        lead, k, n = shape[:-2], shape[-2], shape[-1]
        np_ = n + (-n) % pad_n_to
        scales = nrng.random((*lead, k // 32, np_), _np.float32) * 0.004
        if quant == "q8_0":
            qs = nrng.integers(-127, 128, (*lead, k, np_), dtype=_np.int8)
            return QTensor(qs, scales, None, "q8", k, n)
        qs = nrng.integers(-128, 128, (*lead, k // 2, np_), dtype=_np.int8)
        mins = None if no_mins else scales * 8.0
        if mins is not None and mins_bf16:
            mins = mins.astype(jnp.bfloat16)
        if scales_bf16:
            scales = scales.astype(jnp.bfloat16)
            mins = mins.astype(jnp.bfloat16) if mins is not None else None
        return QTensor(qs, scales, mins, "q4", k, n)

    qd, kvd = heads * head_dim, kv_heads * head_dim
    layer_weights = {
        "attn_norm": jnp.ones((layers, hidden), jnp.float32),
        # fused projections (one kernel launch each, as load_params builds)
        "wqkv": weight(layers, hidden, qd + 2 * kvd),
        "wo": weight(layers, qd, hidden),
        "ffn_norm": jnp.ones((layers, hidden), jnp.float32),
    }
    if moe:
        # quantized expert stacks (grouped kernels); down promotes to q8
        # when its K fails the 4-bit tile constraint, mirroring load_params
        e, fm = experts, moe_ffn
        layer_weights["router"] = jnp.asarray(
            nrng.standard_normal((layers, hidden, e), _np.float32) * 0.02
        )
        layer_weights["w_gate_exps"] = weight(layers, e, hidden, fm)
        layer_weights["w_up_exps"] = weight(layers, e, hidden, fm)
        from nfai_tpu.ops.qmatmul import grouped_supported
        from nfai_tpu.ops.qtensor import QTensor as _QTm

        down_meta = _QTm(None, None, None, "q4", fm, hidden)
        if quant == "q4" and not grouped_supported(down_meta):
            # small-K down experts take the q8 container (load_params
            # promotes; synthetic builds it directly — a promote here would
            # round-trip GBs through the host tunnel)
            sc = (
                (nrng.random((layers, e, fm // 32, hidden), _np.float32)
                 * 0.004)
                .astype(jnp.bfloat16).astype(_np.float32)
            )
            qs8 = nrng.integers(
                -127, 128, (layers, e, fm, hidden), dtype=_np.int8
            )
            layer_weights["w_down_exps"] = QTensor(
                qs8, sc, sc * 8.0, "q8", fm, hidden
            )
        else:
            layer_weights["w_down_exps"] = weight(layers, e, fm, hidden)
    else:
        layer_weights["w_gate_up"] = weight(layers, hidden, 2 * ffn)
        layer_weights["w_down"] = weight(layers, ffn, hidden)
    params = {
        "embed": rand(vocab, hidden),
        "layers": layer_weights,
        "final_norm": jnp.ones(hidden, jnp.float32),
        "lm_head": weight(hidden, vocab, pad_n_to=512),
        "inv_freq": jnp.asarray(compute_inv_freq(head_dim, cfg.rope_base)),
    }
    if quant == "q4" and not scales_bf16 and not no_v3:
        # mirror load_params: all eligible 4-bit weights repack to the
        # cast-free v3 bit-decode container (ops.qtensor)
        from nfai_tpu.ops.qtensor import (
            QTensor as _QT, to_v3, to_v3_mlp_stacked, to_v3_stacked,
        )

        params["lm_head"] = to_v3(params["lm_head"])
        if not moe and os.environ.get("NFAI_FUSED_MLP", "1") != "0":
            params["layers"]["w_gate_up"], params["layers"]["w_down"] = (
                to_v3_mlp_stacked(
                    params["layers"]["w_gate_up"], params["layers"]["w_down"]
                )
            )
        params["layers"] = {
            k: to_v3_stacked(v) if isinstance(v, _QT) else v
            for k, v in params["layers"].items()
        }
    if quant == "q8_0" and not no_v3 and os.environ.get(
        "NFAI_Q8V3", "0"
    ) != "0":
        # mirror load_params: q8v3 is OFF by default (lost its r4 A/B,
        # see models.llama.load_params.repack); NFAI_Q8V3=1 repacks
        # eligible 8-bit weights to the cast-free bit-decode container
        from nfai_tpu.ops.qtensor import QTensor as _QT8, to_q8v3_stacked

        params["lm_head"] = to_q8v3_stacked(params["lm_head"])
        params["layers"] = {
            k: to_q8v3_stacked(v) if isinstance(v, _QT8) else v
            for k, v in params["layers"].items()
        }
    # one push of the fully-packed tree (host numpy leaves → HBM)
    return cfg, jax.device_put(params)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1b", choices=SIZES)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=1024, help="KV cache length")
    p.add_argument("--prompt", type=int, default=128)
    p.add_argument("--decode-tokens", type=int, default=256)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quant", default="q4", choices=["none", "q8_0", "q4"],
                   help="weights quantized in HBM (fused dequant kernels); "
                        "the BASELINE headline config is Llama-3.2 Q4_K")
    p.add_argument("--kv", default="auto", choices=["auto", "int8"],
                   help="KV cache storage (int8 = quantized cache, halves attention HBM reads)")
    p.add_argument("--no-v3", action="store_true",
                   help="A/B: keep the LM head in the v2 nibble container")
    p.add_argument("--scales-bf16", action="store_true",
                   help="A/B: store scales AND mins in bf16 (halves the "
                   "scale-array HBM bytes; default f32 for Q8_0 accuracy)")
    p.add_argument("--mins-bf16", action="store_true",
                   help="store the mins arrays bf16 (diagnostic: halves the "
                        "array XLA stages into alternate memory per layer)")
    p.add_argument("--v3-scales-f32", action="store_true",
                   help="A/B: store v3-container scales/mins f32 (the old "
                        "default; bf16 is now standard — the kernels multiply "
                        "scales in bf16 regardless, see qtensor._v3_scale_dtype)")
    p.add_argument("--no-mins", action="store_true",
                   help="synthetic q4 without the affine mins arrays "
                        "(Q4_0-style symmetric; isolates the mins-term cost)")
    p.add_argument("--vocab", type=int, default=0, help="override vocab size")
    p.add_argument("--experts", type=int, default=0,
                   help="MoE: replace the dense MLP with this many experts "
                        "(quantized grouped kernels; qwen3moe semantics)")
    p.add_argument("--experts-used", type=int, default=8)
    p.add_argument("--moe-ffn", type=int, default=768,
                   help="per-expert ffn dim (qwen3-30B-A3B: 768)")
    p.add_argument("--hbm-gbps", type=float, default=819.0,
                   help="chip HBM bandwidth for the roofline (v5e: 819)")
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="chip bf16 matmul peak for the prefill MFU (v5e: 197)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--fill-pos", type=int, default=0,
                   help="start decode at this cache position (implies "
                        "--decode-only semantics for the fill; measures "
                        "long-context decode where attention reads the "
                        "whole cache instead of block-skipping)")
    p.add_argument("--decode-only", action="store_true",
                   help="skip prefill (zeros cache at position --prompt); "
                        "much faster iteration when prefill is compile-cold")
    args = p.parse_args()

    if args.v3_scales_f32:
        os.environ["NFAI_V3_SCALE_DTYPE"] = "f32"

    from nfai_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nfai_tpu.models import KVCache
    from nfai_tpu.models.llama import LlamaConfig, decode_loop, prefill_step
    from nfai_tpu.ops.rope import compute_inv_freq

    # synthetic weights generated HOST-side (numpy): the v3/fused-MLP/q8v3
    # container packing is host numpy, so device-generated weights would be
    # pulled back through the TPU tunnel (~80 s per 270 MB array on axon).
    # The win is avoiding device->host pulls; dense leaves device-put
    # individually via jnp.asarray, packed QTensor leaves ride the final
    # device_put of the tree. (Builder shared with benchmarks/profile_decode.)
    import numpy as _np

    from nfai_tpu.ops.qtensor import QTensor

    cfg, params = build_synthetic_params(
        args.size, quant=args.quant, dtype_name=args.dtype,
        vocab_override=args.vocab, experts=args.experts,
        experts_used=args.experts_used, moe_ffn=args.moe_ffn,
        no_mins=args.no_mins, mins_bf16=args.mins_bf16,
        scales_bf16=args.scales_bf16, no_v3=args.no_v3,
        context_length=max(args.seq, 2048),
    )
    hidden, layers, heads, kv_heads, ffn = (
        cfg.hidden_size, cfg.n_layers, cfg.n_heads, cfg.n_kv_heads,
        cfg.ffn_dim,
    )
    vocab, head_dim, moe = cfg.vocab_size, cfg.head_dim, args.experts > 0
    dtype = jnp.dtype(args.dtype)
    nrng = _np.random.default_rng(1234)  # token draws only
    dev = jax.devices()[0]
    log(f"device: {dev}, model={args.size}, batch={args.batch}, seq={args.seq}")

    def tree_bytes(tree, fixed_scale_bytes=None):
        """Total HBM weight bytes. With `fixed_scale_bytes`, QTensor
        scales/mins count at that many bytes/element regardless of stored
        dtype — the FIXED byte basis (default f32 container), so the
        efficiency metric rewards byte-shrinking storage wins (bf16 scales)
        instead of penalizing them by raising the roofline."""
        total = 0
        leaves = jax.tree.leaves(
            tree, is_leaf=lambda x: isinstance(x, QTensor)
        )
        for leaf in leaves:
            if isinstance(leaf, QTensor):
                total += leaf.qs.size * leaf.qs.dtype.itemsize
                for a in (leaf.scales, leaf.mins):
                    if a is None:
                        continue
                    isz = fixed_scale_bytes or a.dtype.itemsize
                    total += a.size * isz
            else:
                total += leaf.size * leaf.dtype.itemsize
        return total

    weight_bytes = tree_bytes(params)
    weight_bytes_fixed = tree_bytes(params, fixed_scale_bytes=4)
    total_hbm = weight_bytes
    if moe:
        # decode reads only the experts HIT this step: expected distinct
        # experts per layer = E*(1-(1-1/E)^(B*used)) for uniform routing
        exp_tree = {
            k: params["layers"][k]
            for k in ("w_gate_exps", "w_up_exps", "w_down_exps")
        }
        exp_actual = tree_bytes(exp_tree)
        exp_fixed = tree_bytes(exp_tree, fixed_scale_bytes=4)
        hit = 1.0 - (1.0 - 1.0 / args.experts) ** (args.batch * args.experts_used)
        weight_bytes = weight_bytes - exp_actual + exp_actual * hit
        weight_bytes_fixed = (
            weight_bytes_fixed - exp_fixed + exp_fixed * hit
        )
        log(f"MoE: {args.experts} experts x {args.moe_ffn} ffn, top-"
            f"{args.experts_used}; expected hit fraction/layer {hit:.2f}")
    log(f"params: ~{total_hbm/1e9:.2f} GB in HBM (quant={args.quant}, "
        f"roofline bytes/step {weight_bytes/1e9:.2f} GB, "
        f"fixed f32-scale basis {weight_bytes_fixed/1e9:.2f} GB)")

    kvq = args.kv == "int8"
    cache = KVCache.zeros(cfg, args.batch, args.seq, dtype, quantized=kvq)
    B, T = args.batch, args.prompt
    tokens = jnp.asarray(nrng.integers(0, vocab, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    last = jnp.full((B,), T - 1, jnp.int32)

    def sync(x):
        # block_until_ready does not reliably block on the experimental
        # axon platform; a host transfer is an honest barrier
        return np.asarray(jnp.sum(x.astype(jnp.float32)))

    # -- prefill / TTFT ----------------------------------------------------
    if args.decode_only:
        logits = jnp.zeros((B, vocab), jnp.float32)
        ttft = prefill_mfu = None
        log("prefill skipped (--decode-only)")
    else:
        t0 = time.perf_counter()
        logits, cache = prefill_step(params, cfg, tokens, positions, last, cache)
        sync(logits)
        compile_ttft = time.perf_counter() - t0
        # warm TTFT: fresh cache, compiled path
        cache2 = KVCache.zeros(cfg, B, args.seq, dtype, quantized=kvq)
        sync(cache2.k)
        t0 = time.perf_counter()
        logits, cache2 = prefill_step(params, cfg, tokens, positions, last, cache2)
        sync(logits)
        ttft = time.perf_counter() - t0
        cache = cache2
        # device prefill throughput: amortize the per-call dispatch cost
        # (the axon tunnel adds ~25-30 ms per round trip that a local
        # runtime would not pay) over pipelined back-to-back calls; ttft
        # above stays the honest single-call latency
        reps = 3
        caches = [
            KVCache.zeros(cfg, B, args.seq, dtype, quantized=kvq)
            for _ in range(reps)
        ]
        for c in caches:
            sync(c.k)
        t0 = time.perf_counter()
        outs = [
            prefill_step(params, cfg, tokens, positions, last, c)[0]
            for c in caches
        ]
        sync(outs[-1])
        prefill_step_s = (time.perf_counter() - t0) / reps
        # prefill MFU: prefill is compute-bound, so the honest denominator
        # is the chip's bf16 matmul peak. FLOPs = 2·tokens·active-params for
        # every matmul (dequant decode work is not counted — it is overhead
        # the metric should punish) + the causal attention score/value dots.
        qd_, kvd_ = heads * head_dim, kv_heads * head_dim
        mm_per_tok = 2 * (
            layers * (hidden * (qd_ + 2 * kvd_) + qd_ * hidden
                      + (hidden * 2 * ffn + ffn * hidden
                         if not moe else
                         hidden * cfg.n_experts  # router
                         + args.experts_used * 3 * hidden * args.moe_ffn))
            + hidden * vocab
        )
        attn_flops = layers * 2 * 2 * B * (T * (T + 1) / 2) * qd_
        prefill_flops = mm_per_tok * B * T + attn_flops
        prefill_mfu = prefill_flops / prefill_step_s / (args.peak_tflops * 1e12)
        log(f"prefill({B}x{T}): first {compile_ttft:.2f}s (compile), "
            f"warm TTFT {ttft*1e3:.1f} ms (single call incl. dispatch), "
            f"amortized {prefill_step_s*1e3:.1f} ms -> MFU {prefill_mfu:.3f} "
            f"({prefill_flops/1e9:.1f} GFLOP @ peak {args.peak_tflops} TF)")

    # -- decode ------------------------------------------------------------
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    start_pos = max(args.fill_pos, T)
    if args.fill_pos:
        avail = args.seq - start_pos
        if avail < args.decode_tokens + args.chunk:
            raise SystemExit("--fill-pos leaves too little cache room")
        log(f"long-context mode: decode starts at position {start_pos}")
    start = jnp.full((B,), start_pos, jnp.int32)
    rng = jax.random.PRNGKey(1)

    def run(n_tokens, cache, first, start, rng):
        done = 0
        while done < n_tokens:
            n = min(args.chunk, n_tokens - done)
            toks, first, cache, rng = decode_loop(
                params, cfg, first, start, cache, rng, n,
                temperature=0.7, top_k=40, top_p=0.95,
            )
            start = start + n
            done += n
        sync(first)  # depends on the full chain of chunks
        return cache, first, start, rng

    # warmup (compile)
    t0 = time.perf_counter()
    cache, first, start, rng = run(args.chunk, cache, first, start, rng)
    log(f"decode compile+warmup: {time.perf_counter()-t0:.2f}s")
    # timed
    t0 = time.perf_counter()
    cache, first, start, rng = run(args.decode_tokens, cache, first, start, rng)
    dt = time.perf_counter() - t0
    tok_s = args.batch * args.decode_tokens / dt

    # -- roofline ----------------------------------------------------------
    # vs_baseline: efficiency against the FIXED-byte-basis roofline (scales
    # and mins counted f32 regardless of storage), so storage-shrinking wins
    # (bf16 scales) raise the ratio like any other speedup instead of raising
    # the roofline against themselves. eff_actual_bytes is the honest
    # "fraction of achievable bandwidth" number for the bytes really moved.
    # mean context length actually read by decode attention: long-context
    # runs (--fill-pos) start deep in the cache, so the KV term must use the
    # true start position — with the old T-based denominator a 4k-context
    # run was graded against a 128-token cache read, hiding any attention
    # inefficiency at long S (VERDICT r3 weak-5).
    mean_ctx = start_pos + args.chunk + args.decode_tokens / 2
    kv_bytes_step = layers * 2 * mean_ctx * kv_heads * head_dim * dtype.itemsize * B
    if args.kv == "int8":
        kv_bytes_step = kv_bytes_step // dtype.itemsize  # int8 payload
        kv_bytes_step += layers * 2 * mean_ctx * kv_heads * 4 * B  # f32 scales
    roofline_tok_s = args.hbm_gbps * 1e9 / (weight_bytes_fixed + kv_bytes_step) * B
    roofline_actual = args.hbm_gbps * 1e9 / (weight_bytes + kv_bytes_step) * B
    kv_frac = kv_bytes_step / (weight_bytes + kv_bytes_step)
    log(
        f"decode: {tok_s:.1f} tok/s total ({tok_s/args.batch:.1f}/seq) | "
        f"roofline(fixed) {roofline_tok_s:.0f} tok/s | eff {tok_s/roofline_tok_s:.2f} "
        f"(actual-bytes {tok_s/roofline_actual:.2f}, "
        f"kv reads {kv_frac:.0%} of step bytes @ mean ctx {mean_ctx:.0f})"
    )

    tag = args.dtype if args.quant == "none" else args.quant
    if moe:
        tag += f"_moe{args.experts}x{args.moe_ffn}t{args.experts_used}"
    out = {
        "metric": f"decode_tokens_per_sec_chip_llama32_{args.size}_{tag}_b{args.batch}",
        "value": round(tok_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / roofline_tok_s, 4),
        "eff_actual_bytes": round(tok_s / roofline_actual, 4),
    }
    if ttft is not None:
        out["ttft_ms"] = round(ttft * 1e3, 1)
        out["prefill_mfu"] = round(prefill_mfu, 4)
    if args.fill_pos:
        out["mean_ctx"] = int(mean_ctx)
        out["kv_read_fraction"] = round(kv_frac, 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
