"""Expert-parallel MoE seam rehearsal on the 8-virtual-device CPU mesh:
E-axis shards of the expert stacks are standalone containers feeding the
UNCHANGED local grouped compute; one psum mixes. Must match the
single-device MoE oracles exactly (up to f32 reduction order)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfai_tpu.models.llama import LlamaConfig, _moe_ffn_dense, _moe_ffn_grouped_q
from nfai_tpu.ops.qtensor import QTensor
from nfai_tpu.parallel.expert_parallel import expert_shardings, moe_ffn_ep
from nfai_tpu.parallel.mesh import make_mesh

E, USED, H, F = 16, 4, 32, 64


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"dp": 1, "tp": 8})


@pytest.fixture(scope="module")
def cfg():
    return LlamaConfig(
        vocab_size=128, hidden_size=H, n_layers=1, n_heads=2, n_kv_heads=2,
        head_dim=16, ffn_dim=F, rope_base=10000.0, context_length=64,
        n_experts=E, n_experts_used=USED, moe_ffn_dim=F,
        norm_topk_prob=True,
    )


def _dense_lp(rng):
    return {
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


def _q8_stack(rng, e, k, n):
    qs = rng.integers(-127, 128, (e, k, n), dtype=np.int8)
    sc = rng.random((e, k // 32, n), dtype=np.float32) * 0.01
    return QTensor(jnp.asarray(qs), jnp.asarray(sc), None, "q8", k, n)


def test_ep_dense_matches_oracle(mesh, cfg, rng):
    lp = _dense_lp(rng)
    x = jnp.asarray(rng.standard_normal((12, H), np.float32))
    ref = _moe_ffn_dense(x[None], lp, cfg, jax.nn.silu)[0]
    out = moe_ffn_ep(x, lp, cfg, jax.nn.silu, mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_ep_quantized_matches_oracle(mesh, cfg, rng):
    lp = {
        "router": jnp.asarray(rng.standard_normal((H, E), np.float32)),
        "w_gate_exps": _q8_stack(rng, E, H, F),
        "w_up_exps": _q8_stack(rng, E, H, F),
        "w_down_exps": _q8_stack(rng, E, F, H),
    }
    x = jnp.asarray(rng.standard_normal((8, H), np.float32))
    ref = _moe_ffn_grouped_q(x[None], lp, cfg, jax.nn.silu)[0]
    out = moe_ffn_ep(x, lp, cfg, jax.nn.silu, mesh)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,  # bf16 grouped path
    )


def test_ep_sharded_device_put(mesh, cfg, rng):
    """Stacks physically placed with expert_shardings — the deployment
    layout — still match, and each shard holds E/n experts."""
    lp = _dense_lp(rng)
    sh = expert_shardings(mesh)
    for k in ("w_gate_exps", "w_up_exps", "w_down_exps"):
        lp[k] = jax.device_put(lp[k], sh)
        shard = lp[k].addressable_shards[0]
        assert shard.data.shape[0] == E // 8
    x = jnp.asarray(rng.standard_normal((12, H), np.float32))
    ref = _moe_ffn_dense(x[None], lp, cfg, jax.nn.silu)[0]
    out = moe_ffn_ep(x, lp, cfg, jax.nn.silu, mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
