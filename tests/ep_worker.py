"""Worker for tests/test_expert_parallel.py — runs the expert-parallel
parity checks in a SUBPROCESS.

Why a subprocess: the EP shard_map programs (one-hot mix einsum + psum +
scatter-add over an 8-virtual-device CPU mesh) trigger a latent XLA:CPU
compiler bug on this image — they compile and run CORRECTLY here, but leave
the in-process compiler in a state where a later, unrelated jit compile
segfaults (reproduced deterministically at tests/test_spec_sampling.py's
next fresh compile; bisected r4). Isolating the EP programs in their own
process keeps `pytest tests/` green while still running every check.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nfai_tpu.models.llama import (  # noqa: E402
    LlamaConfig, _moe_ffn_dense, _moe_ffn_grouped_q,
)
from nfai_tpu.ops.qtensor import QTensor  # noqa: E402
from nfai_tpu.parallel.expert_parallel import (  # noqa: E402
    expert_shardings, moe_ffn_ep,
)
from nfai_tpu.parallel.mesh import make_mesh  # noqa: E402

E, USED, H, F = 16, 4, 32, 64


def main() -> int:
    rng = np.random.default_rng(0)
    mesh = make_mesh({"dp": 1, "tp": 8})
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=H, n_layers=1, n_heads=2, n_kv_heads=2,
        head_dim=16, ffn_dim=F, rope_base=10000.0, context_length=64,
        n_experts=E, n_experts_used=USED, moe_ffn_dim=F,
        norm_topk_prob=True,
    )

    # 1. dense stacks vs single-device oracle
    lp = {
        "router": jnp.asarray(rng.standard_normal((H, E), np.float32)),
        "w_gate_exps": jnp.asarray(
            rng.standard_normal((E, H, F), np.float32) * 0.1
        ),
        "w_up_exps": jnp.asarray(
            rng.standard_normal((E, H, F), np.float32) * 0.1
        ),
        "w_down_exps": jnp.asarray(
            rng.standard_normal((E, F, H), np.float32) * 0.1
        ),
    }
    x = jnp.asarray(rng.standard_normal((12, H), np.float32))
    ref = _moe_ffn_dense(x[None], lp, cfg, jax.nn.silu)[0]
    out = moe_ffn_ep(x, lp, cfg, jax.nn.silu, mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    print("dense OK")

    # 2. physically E-sharded placement (the deployment layout)
    sh = expert_shardings(mesh)
    for k in ("w_gate_exps", "w_up_exps", "w_down_exps"):
        lp[k] = jax.device_put(lp[k], sh)
        assert lp[k].addressable_shards[0].data.shape[0] == E // 8
    out = moe_ffn_ep(x, lp, cfg, jax.nn.silu, mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    print("sharded device_put OK")

    # 3. quantized stacks through the unchanged grouped-kernel contract
    def q8_stack(e, k, n):
        qs = rng.integers(-127, 128, (e, k, n), dtype=np.int8)
        sc = rng.random((e, k // 32, n), dtype=np.float32) * 0.01
        return QTensor(jnp.asarray(qs), jnp.asarray(sc), None, "q8", k, n)

    lpq = {
        "router": jnp.asarray(rng.standard_normal((H, E), np.float32)),
        "w_gate_exps": q8_stack(E, H, F),
        "w_up_exps": q8_stack(E, H, F),
        "w_down_exps": q8_stack(E, F, H),
    }
    xq = jnp.asarray(rng.standard_normal((8, H), np.float32))
    refq = _moe_ffn_grouped_q(xq[None], lpq, cfg, jax.nn.silu)[0]
    outq = moe_ffn_ep(xq, lpq, cfg, jax.nn.silu, mesh)
    np.testing.assert_allclose(
        np.asarray(outq, np.float32), np.asarray(refq, np.float32),
        rtol=3e-2, atol=3e-2,
    )
    print("quantized OK")
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
