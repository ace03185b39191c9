"""Multi-chip / multi-host scaling-efficiency benchmark.

Measures decode throughput of the sharded engine on the current mesh and
reports efficiency vs the single-chip rate (BASELINE north star: >=0.9 on a
2-host v5e slice). Runs anywhere:

  single host, n chips:  python benchmarks/scaling_bench.py --dp 1 --tp 4
  2 hosts (run on each): NFAI_COORD=host0:8476 NFAI_NUM_PROCS=2 \
      NFAI_PROC_ID=<0|1> python benchmarks/scaling_bench.py --dp 2 --tp 4 \
      --baseline-tps <single-chip tok/s from bench.py>
  CPU rehearsal:         python benchmarks/scaling_bench.py --cpu --dp 2 \
      --tp 4 --size tiny --force-fused

With tp > 1 the weights are built in the PRODUCTION tensor-parallel layout
(synthetic, same construction as models.llama.load_params with tp: col-marked
per-projection v2 containers -> per-shard interleaved fused wqkv, per-shard
fused-MLP containers, per-section row packing) so decode routes through the
whole-layer-scan shard_map fused path (_decode_forward_fused_tp) — the same
kernels-per-shard + 2 psums/layer program a real multi-chip run executes.
Prints one JSON line with tok/s and scaling efficiency.

Because only one real TPU chip is reachable in this environment, the honest
hardware evidence for TP per-chip efficiency is bench.py's `--size
1b-tp4shard` / `8b-tp4shard` configs (the exact per-chip local workload on
the real chip); this script proves the multi-chip program compiles and runs
and measures RELATIVE scaling on virtual CPU meshes.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()


def build_state_tp(size, batch, seq, prompt, tp):
    """Synthetic params in the production TP layout (mirrors load_params
    with tp>1): per-projection v2 QTensors with Megatron marks and
    per-section row packing, fused per shard via _fuse_projections_tp,
    then the per-shard fused-MLP / v3 conversions."""
    import bench as benchmod
    import jax.numpy as jnp
    import numpy as np

    from nfai_tpu.models import KVCache
    from nfai_tpu.models.llama import (
        LlamaConfig, _fuse_projections_tp,
    )
    from nfai_tpu.ops.qtensor import (
        QTensor, to_v3_mlp_stacked_tp, to_v3_stacked,
    )
    from nfai_tpu.ops.rope import compute_inv_freq

    spec = benchmod.SIZES[size]
    hidden, layers, heads, kv_heads, ffn, vocab = spec[:6]
    head_dim = spec[6] if len(spec) > 6 else hidden // heads
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, n_layers=layers, n_heads=heads,
        n_kv_heads=kv_heads, head_dim=head_dim, ffn_dim=ffn,
        rope_base=500000.0, context_length=max(seq, 2048),
    )
    rng = np.random.default_rng(0)

    def qweight(k, n, role):
        """One layer's synthetic q4 v2 container with the TP role/packing."""
        sections = tp if role == "row" and (k // tp) % 64 == 0 else 1
        qs = rng.integers(-128, 128, (k // 2, n), dtype=np.int64).astype(np.int8)
        scales = (rng.random((k // 32, n)) * 0.004).astype(np.float32)
        mins = scales * 8.0
        markable = (
            (role == "col" and (n // tp) % 128 == 0)
            or (role == "row" and sections == tp)
        )
        return QTensor(
            qs, scales, mins, "q4", k, n, sections=sections,
            tp_mode=role if markable else None,
        )

    qd, kvd = heads * head_dim, kv_heads * head_dim
    per_layer = {
        "attn_norm": [np.ones(hidden, np.float32)] * layers,
        "ffn_norm": [np.ones(hidden, np.float32)] * layers,
        "wq": [qweight(hidden, qd, "col") for _ in range(layers)],
        "wk": [qweight(hidden, kvd, "col") for _ in range(layers)],
        "wv": [qweight(hidden, kvd, "col") for _ in range(layers)],
        "wo": [qweight(qd, hidden, "row") for _ in range(layers)],
        "w_gate": [qweight(hidden, ffn, "col") for _ in range(layers)],
        "w_up": [qweight(hidden, ffn, "col") for _ in range(layers)],
        "w_down": [qweight(ffn, hidden, "row") for _ in range(layers)],
    }
    if tp > 1:
        _fuse_projections_tp(per_layer, cfg, tp)

    def stack_q(items):
        if isinstance(items[0], QTensor):
            f = items[0]
            return QTensor(
                np.stack([np.asarray(i.qs) for i in items]),
                np.stack([np.asarray(i.scales) for i in items]),
                np.stack([np.asarray(i.mins) for i in items])
                if f.mins is not None else None,
                f.kind, f.k, f.n, f.group, f.sections, f.tp_mode,
                tfb=f.tfb, tpi=f.tpi,
            )
        return np.stack(items)

    stacked = {k: stack_q(v) for k, v in per_layer.items()}
    if tp > 1 and "w_gate_up" in stacked:
        stacked["w_gate_up"], stacked["w_down"] = to_v3_mlp_stacked_tp(
            stacked["w_gate_up"], stacked["w_down"], tp
        )
    stacked = {
        k: to_v3_stacked(v) if isinstance(v, QTensor) else v
        for k, v in stacked.items()
    }
    params = {
        "embed": jnp.asarray(
            rng.standard_normal((vocab, hidden)) * 0.02, jnp.bfloat16
        ),
        "layers": stacked,
        "final_norm": np.ones(hidden, np.float32),
        "lm_head": jnp.asarray(
            rng.standard_normal((hidden, vocab)) * 0.02, jnp.bfloat16
        ),
        "inv_freq": np.asarray(compute_inv_freq(head_dim, cfg.rope_base)),
    }
    cache = KVCache.zeros(cfg, batch, seq, jnp.bfloat16)
    return cfg, params, cache, vocab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1b")
    ap.add_argument("--quant", default="q4", choices=["none", "q8_0", "q4"])
    ap.add_argument("--batch", type=int, default=8, help="per-dp-group batch")
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=-1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--force-fused", action="store_true",
                    help="force the fused decode paths on CPU (interpret "
                         "kernels) so the compiled program matches TPU")
    ap.add_argument("--baseline-tps", type=float, default=0.0,
                    help="single-chip tok/s (bench.py) for the efficiency "
                         "denominator; 0 = report raw only")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if jax.device_count() < 2:
            print("hint: XLA_FLAGS=--xla_force_host_platform_device_count=8",
                  file=sys.stderr)
    from nfai_tpu.parallel import init_distributed

    init_distributed()  # no-op unless NFAI_COORD is set

    import jax.numpy as jnp
    import numpy as np

    from nfai_tpu.models import llama as llama_mod
    from nfai_tpu.models.llama import decode_loop
    from nfai_tpu.ops import qmatmul
    from nfai_tpu.parallel import (
        kv_cache_sharding,
        llama_param_shardings,
        make_mesh,
    )

    mesh = make_mesh({"dp": args.dp, "tp": args.tp})
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    batch = args.batch * dp
    if tp > 1:
        cfg, params, cache, vocab = build_state_tp(
            args.size, batch, args.seq, 128, tp
        )
    else:
        from benchmarks.profile_decode import build_state

        cfg, params, cache, vocab = build_state(
            args.size, args.quant, batch, args.seq, 128
        )
    shardings = llama_param_shardings(mesh, params)
    params = jax.tree.map(
        lambda a, s: jax.device_put(a, s), params, shardings,
        is_leaf=lambda x: x is None,
    )
    cache = jax.tree.map(
        lambda a: jax.device_put(a, kv_cache_sharding(mesh)), cache
    )
    qmatmul.TP_MESH = mesh if tp > 1 else None
    if args.force_fused:
        llama_mod.FUSED_DECODE_IMPL = "fused"
    if tp > 1 and not llama_mod._fused_tp_eligible(params, cfg, cache):
        print("warning: TP fused decode path NOT eligible — measuring the "
              "generic path", file=sys.stderr)

    B = batch
    first = jnp.zeros((B,), jnp.int32)
    start = jnp.full((B,), 128, jnp.int32)
    rng = jax.random.PRNGKey(1)

    def chunk(cache, first, start, rng):
        return decode_loop(
            params, cfg, first, start, cache, rng, args.chunk, temperature=0.7
        )

    def sync(x):
        return np.asarray(jnp.sum(x.astype(jnp.float32)))

    with jax.sharding.set_mesh(mesh):
        t0 = time.perf_counter()
        toks, first, cache, rng = chunk(cache, first, start, rng)
        sync(toks)
        print(f"compile+warmup: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        start = start + args.chunk
        n_chunks = max(1, args.steps // args.chunk)
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            toks, first, cache, rng = chunk(cache, first, start, rng)
            start = start + args.chunk
        sync(toks)
        dt = time.perf_counter() - t0

    total_tokens = n_chunks * args.chunk * B
    tps = total_tokens / dt
    n_chips = dp * tp
    eff = (tps / (args.baseline_tps * n_chips)) if args.baseline_tps else None
    if jax.process_index() == 0:
        print(json.dumps({
            "metric": f"decode_tokens_per_sec_mesh_dp{dp}_tp{tp}_"
                      f"{args.size}_{args.quant}",
            "value": round(tps, 1),
            "unit": "tokens/s",
            "vs_baseline": round(eff, 4) if eff is not None else None,
            "n_chips": n_chips,
            "n_processes": jax.process_count(),
            "tp_fused_path": bool(tp > 1),
        }))
    qmatmul.TP_MESH = None


if __name__ == "__main__":
    main()
