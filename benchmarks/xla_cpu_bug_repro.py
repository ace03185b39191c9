"""Minimal repro for the XLA:CPU in-process compile-corruption bug
(VERDICT r4 item 7; first bisected r4, mitigated by running three test
groups in subprocess workers: tests/sp_worker.py, ep_worker.py,
specsample_worker.py).

Symptom: certain shard_map programs on the virtual multi-device CPU
backend (the EP one-hot-mix einsum + psum + scatter-add family) compile
and run CORRECTLY, but leave the in-process compiler in a state where a
LATER, unrelated fresh jit compile (a vmapped top-k/sort sampling program)
crashes inside backend_compile_and_load (SIGSEGV — not a Python
exception). Each half runs clean in a process of its own.

Usage:
    python benchmarks/xla_cpu_bug_repro.py            # run both phases
    python benchmarks/xla_cpu_bug_repro.py --victim   # victim only (clean)

Exit code 0 + "REPRO-CLEAN" printed = did not reproduce; a segfault
before "REPRO-CLEAN" = the bug.

MEASURED OUTCOME (r5, jax/jaxlib 0.9.0 on this image): this DISTILLED
script prints REPRO-CLEAN — three trigger compiles + three victim
compiles are not enough. The r4 bisect only crashed under the FULL test
suite's accumulated in-process compile load (hundreds of distinct
programs) with the EP/SP shard_map programs included, and was
deterministic there (5/5 at tests/test_spec_sampling.py's first fresh
vmap compile; removing the shard_map programs un-crashed it). So the
minimal repro is load-dependent: `python -m pytest tests/` with the
three worker files' checks inlined in-process reproduces; this script
alone does not. The mitigation in-tree remains process isolation
(tests/sp_worker.py, ep_worker.py, specsample_worker.py,
engine_parallel_worker.py, test_mesh_workers.py); a jaxlib upgrade cannot
be attempted on this image (no package installs). When a newer jaxlib
lands, re-run the inlined-suite experiment before folding the workers
back in.

SECOND FAILURE MODE (r5): with the r5 mesh-heavy engine tests
(scheduler-under-TP, pipeline stage split) compiled in-process, the full
suite's later fresh pjit compile (test_spec_fused's ngram path) HANGS
inside _cached_compilation instead of segfaulting — reproducibly at the
same ~90% mark, twice, while every involved file passes in isolation and
in pairs. Same accumulated-load dependence, new symptom; those tests now
also run in a subprocess (tests/test_mesh_workers.py).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# the r4 bisect ran without the persistent AOT cache (tests disable it);
# keep the repro cache-free so results are state-independent
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")


def trigger(mesh, e, used, h, f, n_tokens, seed):
    """The EP shard_map family: one-hot mix einsum + psum + masked
    scatter-accumulate over the expert axis (distilled from
    nfai_tpu.parallel.expert_parallel.moe_ffn_ep)."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n_tokens, h)), jnp.float32)
    router = jnp.asarray(rng.standard_normal((h, e)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((e, h, f)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((e, f, h)) * 0.1, jnp.float32)

    def local(xc, rc, wgc, wdc):
        n_local = wgc.shape[0]
        idx = jax.lax.axis_index("tp")
        logits = xc @ rc
        top_vals, top_idx = jax.lax.top_k(jax.nn.softmax(logits), used)
        local_id = top_idx - idx * n_local
        mine = (local_id >= 0) & (local_id < n_local)
        local_id = jnp.where(mine, local_id, 0)
        mix = jnp.sum(
            jax.nn.one_hot(local_id, n_local) * jnp.where(mine, top_vals, 0.0)[..., None],
            axis=-2,
        )
        gate = jnp.einsum("nh,ehf->nef", xc, wgc)
        down = jnp.einsum("nef,efh->neh", jax.nn.silu(gate), wdc)
        out = jnp.einsum("neh,ne->nh", down, mix)
        return jax.lax.psum(out, "tp")

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P("tp", None, None), P("tp", None, None)),
            out_specs=P(),
            check_vma=False,
        )
    )
    return np.asarray(fn(x, router, wg, wd)).sum()


def victim(seed):
    """Fresh vmapped sort/top-k sampling compile (distilled from
    nfai_tpu.ops.sampling via tests/specsample_worker.py)."""
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.standard_normal((4, 512 + seed * 32)), jnp.float32)

    def row(lr, key):
        srt = jnp.sort(lr)[::-1]
        kth = srt[40]
        masked = jnp.where(lr < kth, -1e30, lr)
        p = jax.nn.softmax(masked / 0.7)
        cum = jnp.cumsum(jnp.sort(p)[::-1])
        return jax.random.categorical(key, jnp.log(p + 1e-20)) + cum[-1].astype(jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    fn = jax.jit(jax.vmap(row))
    return np.asarray(fn(logits, keys)).sum()


def main():
    print("jax", jax.__version__, "jaxlib", jax.lib.__version__, flush=True)
    devs = np.asarray(jax.devices()).reshape(1, 8)
    mesh = Mesh(devs, ("dp", "tp"))
    if "--victim" not in sys.argv:
        for i, (e, used, h, f, n) in enumerate(
            [(16, 4, 32, 64, 8), (8, 2, 64, 32, 16), (16, 2, 48, 48, 12)]
        ):
            s = trigger(mesh, e, used, h, f, n, i)
            print(f"trigger {i} ok (sum {s:.3f})", flush=True)
    for i in range(3):
        s = victim(i)
        print(f"victim {i} ok (sum {s})", flush=True)
    print("REPRO-CLEAN", flush=True)


if __name__ == "__main__":
    main()
