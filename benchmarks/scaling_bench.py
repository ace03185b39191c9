"""Multi-chip / multi-host scaling-efficiency benchmark.

Measures decode throughput of the sharded engine on the current mesh and
reports efficiency vs the single-chip rate (BASELINE north star: >=0.9 on a
2-host v5e slice). Runs anywhere:

  single host, n chips:  python benchmarks/scaling_bench.py --dp 1 --tp 4
  2 hosts (run on each): NFAI_COORD=host0:8476 NFAI_NUM_PROCS=2 \
      NFAI_PROC_ID=<0|1> python benchmarks/scaling_bench.py --dp 2 --tp 4 \
      --baseline-tps <single-chip tok/s from bench.py>
  CPU rehearsal:         python benchmarks/scaling_bench.py --cpu --dp 2 --tp 4

Weights are synthetic (same construction as bench.py); the compute path is
the production one: quantized weights sharded per llama_param_shardings,
Pallas kernels under shard_map, KV cache sharded (tp on kv-heads, dp on
batch). Prints one JSON line with tok/s and scaling efficiency.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()


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

    from benchmarks.profile_decode import build_state
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
    qmatmul.TP_MESH = mesh

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
        }))
    qmatmul.TP_MESH = None


if __name__ == "__main__":
    main()
