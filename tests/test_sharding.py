"""Tensor/data-parallel sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4 "Distributed without a cluster"): mesh construction, sharded
engine generation parity with unsharded, and collective-inserting jit."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nfai_tpu.config import EngineConfig, SamplingParams
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.parallel import (
    DP_AXIS,
    TP_AXIS,
    kv_cache_sharding,
    llama_param_shardings,
    make_mesh,
    validate_tp,
)
from nfai_tpu.runtime.engine import InferenceEngine

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh({"dp": 2, "tp": 4})
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh = make_mesh({"dp": 2, "tp": -1})
    assert mesh.shape["tp"] == 4
    with pytest.raises(ValueError):
        make_mesh({"dp": 3, "tp": 4})


def test_validate_tp_messages(tmp_path):
    path = make_tiny_llama_gguf(tmp_path / "v.gguf", n_heads=4, n_kv_heads=2)
    from nfai_tpu.gguf import GGUFFile
    from nfai_tpu.models import LlamaConfig

    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
    with pytest.raises(ValueError, match="n_kv_heads"):
        validate_tp(cfg, 4)


def test_sharded_engine_matches_unsharded(tmp_path):
    # tp=4 over kv_heads=4, dp=2; greedy decode must match the single-device
    # engine exactly (GSPMD collectives are numerically transparent here)
    path = make_tiny_llama_gguf(
        tmp_path / "s.gguf",
        hidden=128,
        n_layers=2,
        n_heads=8,
        n_kv_heads=4,
        ffn_dim=256,
        context_length=256,
        seed=42,
    )
    base_cfg = dict(max_seq_len=96, dtype="float32", prefill_chunk=32)
    plain = InferenceEngine(path, EngineConfig(**base_cfg))
    sharded = InferenceEngine(
        path, EngineConfig(**base_cfg, mesh_shape={"dp": 2, "tp": 4})
    )
    assert sharded.mesh is not None

    # param shardings actually applied
    wq = sharded.params["layers"]["wq"]
    assert len(wq.sharding.device_set) == 8

    ids = [int(x) for x in np.random.default_rng(0).integers(5, 200, 11)]
    s = SamplingParams(temperature=0.0, max_new_tokens=8)
    with jax.sharding.set_mesh(sharded.mesh):
        got = list(sharded.generate(ids, s))
    expected = list(plain.generate(ids, s))
    assert got == expected
    plain.gguf.close()
    sharded.gguf.close()


def test_cache_sharding_layout(tmp_path):
    path = make_tiny_llama_gguf(
        tmp_path / "c.gguf", n_heads=8, n_kv_heads=4, hidden=128, ffn_dim=256
    )
    eng = InferenceEngine(
        path,
        EngineConfig(
            max_seq_len=64, dtype="float32", mesh_shape={"dp": 2, "tp": 4}
        ),
    )
    cache = eng.new_cache(batch=2)
    spec = cache.k.sharding.spec  # [L, B, S, KVD]
    assert spec[3] == TP_AXIS and spec[1] == DP_AXIS
    eng.gguf.close()


def test_sharded_quantized_engine_matches_unsharded(tmp_path):
    # quantized weights + (dp=2, tp=4) mesh: QTensor leaves get structure-
    # matched shardings and matmuls take the GSPMD-sharded XLA dequant path
    from nfai_tpu.gguf import GGMLType
    from nfai_tpu.ops import qmatmul
    from nfai_tpu.ops.qtensor import QTensor

    path = make_tiny_llama_gguf(
        tmp_path / "sq.gguf",
        vocab_size=256,
        hidden=128,
        n_layers=2,
        n_heads=8,
        n_kv_heads=4,
        ffn_dim=256,
        context_length=256,
        quant=GGMLType.Q8_0,
        seed=43,
    )
    base_cfg = dict(max_seq_len=96, dtype="float32", prefill_chunk=32)
    plain = InferenceEngine(path, EngineConfig(**base_cfg))
    prev = qmatmul.KERNEL_ENABLED
    try:
        sharded = InferenceEngine(
            path, EngineConfig(**base_cfg, mesh_shape={"dp": 2, "tp": 4})
        )
        assert isinstance(sharded.params["layers"]["wq"], QTensor)
        assert len(sharded.params["layers"]["wq"].qs.sharding.device_set) == 8

        ids = [int(x) for x in np.random.default_rng(1).integers(5, 200, 9)]
        s = SamplingParams(temperature=0.0, max_new_tokens=6)
        with jax.sharding.set_mesh(sharded.mesh):
            got = list(sharded.generate(ids, s))
        expected = list(plain.generate(ids, s))
        assert got == expected
    finally:
        qmatmul.KERNEL_ENABLED = prev
        plain.gguf.close()


def test_sharded_prefused_phi3_layout(tmp_path):
    """phi3-style pre-fused wqkv / w_gate_up checkpoints must load under TP
    (ADVICE round 1: sharding tree lacked these keys and device_put crashed)."""
    path = make_tiny_llama_gguf(
        tmp_path / "f.gguf",
        arch="phi3",
        hidden=128,
        n_layers=2,
        n_heads=8,
        n_kv_heads=8,
        ffn_dim=256,
        fused_tensors=True,
        seed=7,
    )
    base_cfg = dict(max_seq_len=96, dtype="float32", prefill_chunk=32)
    plain = InferenceEngine(path, EngineConfig(**base_cfg))
    sharded = InferenceEngine(
        path, EngineConfig(**base_cfg, mesh_shape={"dp": 2, "tp": 4})
    )
    assert "wqkv" in sharded.params["layers"]
    ids = [int(x) for x in np.random.default_rng(3).integers(5, 200, 9)]
    s = SamplingParams(temperature=0.0, max_new_tokens=6)
    with jax.sharding.set_mesh(sharded.mesh):
        got = list(sharded.generate(ids, s))
    expected = list(plain.generate(ids, s))
    assert got == expected
    plain.gguf.close()
    sharded.gguf.close()


def test_sharded_moe_layout(tmp_path):
    """qwen3moe expert tensors shard the ffn dim under TP."""
    path = make_tiny_llama_gguf(
        tmp_path / "moe.gguf",
        arch="qwen3moe",
        hidden=128,
        n_layers=2,
        n_heads=8,
        n_kv_heads=4,
        ffn_dim=64,
        n_experts=4,
        n_experts_used=2,
        qk_norm=True,
        seed=11,
    )
    base_cfg = dict(max_seq_len=96, dtype="float32", prefill_chunk=32)
    plain = InferenceEngine(path, EngineConfig(**base_cfg))
    sharded = InferenceEngine(
        path, EngineConfig(**base_cfg, mesh_shape={"dp": 2, "tp": 4})
    )
    assert "w_gate_exps" in sharded.params["layers"]
    ids = [int(x) for x in np.random.default_rng(5).integers(5, 200, 9)]
    s = SamplingParams(temperature=0.0, max_new_tokens=6)
    with jax.sharding.set_mesh(sharded.mesh):
        got = list(sharded.generate(ids, s))
    expected = list(plain.generate(ids, s))
    assert got == expected
    plain.gguf.close()
    sharded.gguf.close()


def test_quantized_tp_kernel_path(tmp_path):
    """Quantized TP through the Pallas kernels (VERDICT round-1 #3): with
    kernel-eligible shapes the engine marks QTensor.tp_mode, qmatmul routes
    through shard_map, and generation matches the single-device kernel path
    exactly. The q4 kernel itself must trace (counter), not the fallback."""
    from nfai_tpu.gguf import GGMLType
    from nfai_tpu.ops import qmatmul

    path = make_tiny_llama_gguf(
        tmp_path / "tpq.gguf",
        vocab_size=256,
        hidden=512,
        n_layers=2,
        n_heads=8,
        n_kv_heads=4,
        ffn_dim=1024,
        context_length=256,
        quant=GGMLType.Q4_K,
        seed=17,
    )
    base_cfg = dict(max_seq_len=96, dtype="bfloat16", prefill_chunk=32)
    plain = InferenceEngine(path, EngineConfig(**base_cfg))

    calls = {"q4": 0}
    orig_q4 = qmatmul._q4_matmul

    def counting_q4(*a, **kw):
        calls["q4"] += 1
        return orig_q4(*a, **kw)

    qmatmul._q4_matmul = counting_q4
    try:
        sharded = InferenceEngine(
            path, EngineConfig(**base_cfg, mesh_shape={"dp": 4, "tp": 2})
        )
        layers = sharded.params["layers"]
        # tp=2 over this fixture marks every projection; load fuses them
        # into per-shard INTERLEAVED containers (tpi == tp)
        assert layers["wqkv"].tp_mode == "col" and layers["wqkv"].tpi == 2
        assert layers["w_down"].tp_mode == "row"
        # hidden=512 < 1024: the per-shard fused-MLP conversion declines
        # (local K too small), leaving the v2 per-section containers
        assert layers["w_down"].kind == "q4"
        assert layers["w_down"].sections == 2  # per-shard split-half packing
        assert qmatmul.TP_MESH is sharded.mesh

        ids = [int(x) for x in np.random.default_rng(9).integers(5, 200, 40)]
        s = SamplingParams(temperature=0.0, max_new_tokens=6)
        calls["q4"] = 0
        with jax.sharding.set_mesh(sharded.mesh):
            got = list(sharded.generate(ids, s))
        assert calls["q4"] > 0, "Pallas q4 kernel never traced under the mesh"
        expected = list(plain.generate(ids, s))
        # the sharded path psums partial products (different f32 reduction
        # order than single-device) — compare LOGITS within a tight bound
        # instead of exact greedy tokens: a mis-packed shard container
        # shows up as O(1) relative error, reduction-order noise as a few percent
        from nfai_tpu.models import KVCache, forward, logits_for

        toks = jnp.asarray([ids[:8]], jnp.int32)
        pos = jnp.asarray([list(range(8))], jnp.int32)

        def logits(e, mesh=None):
            cache = KVCache.zeros(e.model_cfg, 1, 32, jnp.bfloat16)
            h, _ = forward(e.params, e.model_cfg, toks, pos, cache)
            return np.asarray(logits_for(e.params, h[:, -1]), np.float32)

        a = logits(plain)
        with jax.sharding.set_mesh(sharded.mesh):
            b = logits(sharded)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 8e-2, rel
        assert a.argmax() == b.argmax()
        assert got[0] == expected[0]
    finally:
        qmatmul._q4_matmul = orig_q4
        qmatmul.TP_MESH = None
        plain.gguf.close()


def test_tp_fused_decode_path(tmp_path):
    """The whole-layer-scan shard_map fused decode (VERDICT r2 #6): under a
    mesh with kernel-eligible quantized weights, decode routes through
    _decode_forward_fused_tp (layered kernels per shard, two psums/layer)
    and matches the single-device engine exactly."""
    from nfai_tpu.gguf import GGMLType
    from nfai_tpu.models import llama as llama_mod
    from nfai_tpu.ops import qmatmul

    path = make_tiny_llama_gguf(
        tmp_path / "tpf.gguf",
        vocab_size=256,
        hidden=512,
        n_layers=2,
        n_heads=8,
        n_kv_heads=4,
        ffn_dim=2048,  # w_down local K must stay kernel-eligible at tp=4
        context_length=256,
        quant=GGMLType.Q4_K,
        seed=31,
    )
    base_cfg = dict(max_seq_len=128, dtype="bfloat16", prefill_chunk=32)
    plain = InferenceEngine(path, EngineConfig(**base_cfg))
    ids = [int(x) for x in np.random.default_rng(3).integers(5, 200, 11)]
    s = SamplingParams(temperature=0.0, max_new_tokens=8)
    expected = list(plain.generate(ids, s))
    plain.gguf.close()

    calls = {"tp_fused": 0}
    orig = llama_mod._decode_forward_fused_tp

    def counting(*a, **kw):
        calls["tp_fused"] += 1
        return orig(*a, **kw)

    old_impl = llama_mod.FUSED_DECODE_IMPL
    llama_mod.FUSED_DECODE_IMPL = "fused"  # CPU backend: force the kernels
    llama_mod._decode_forward_fused_tp = counting
    try:
        for mesh_shape in ({"dp": 2, "tp": 4}, {"dp": 4, "tp": 2}):
            sharded = InferenceEngine(
                path, EngineConfig(**base_cfg, mesh_shape=mesh_shape)
            )
            assert llama_mod._fused_tp_eligible(
                sharded.params, sharded.model_cfg, sharded.new_cache(1)
            )
            calls["tp_fused"] = 0
            with jax.sharding.set_mesh(sharded.mesh):
                got = list(sharded.generate(ids, s))
            assert calls["tp_fused"] > 0, mesh_shape
            assert got == expected, mesh_shape
            sharded.gguf.close()
    finally:
        llama_mod.FUSED_DECODE_IMPL = old_impl
        llama_mod._decode_forward_fused_tp = orig


def test_tp_fused_decode_batch_and_int8(tmp_path):
    """TP fused decode with a batched engine (dp-sharded batch) and the
    int8 KV cache: outputs match the unsharded batch engine."""
    from nfai_tpu.gguf import GGMLType
    from nfai_tpu.models import llama as llama_mod
    from nfai_tpu.runtime.scheduler import BatchEngine

    path = make_tiny_llama_gguf(
        tmp_path / "tpb.gguf",
        vocab_size=256,
        hidden=512,
        n_layers=2,
        n_heads=8,
        n_kv_heads=4,
        ffn_dim=1024,
        context_length=256,
        quant=GGMLType.Q4_K,
        seed=37,
    )
    base_cfg = dict(max_seq_len=128, dtype="bfloat16", prefill_chunk=32,
                    kv_dtype="int8", paged_kv=False)
    rng = np.random.default_rng(5)
    prompts = [[int(x) for x in rng.integers(5, 200, n)] for n in (7, 12)]
    s = SamplingParams(temperature=0.0, max_new_tokens=6)

    def run(mesh_shape):
        eng = InferenceEngine(
            path, EngineConfig(**base_cfg, mesh_shape=mesh_shape)
        )
        ctx = (
            jax.sharding.set_mesh(eng.mesh) if eng.mesh is not None
            else _nullcontext()
        )
        with ctx:
            be = BatchEngine(eng, max_batch=2, decode_chunk=4, paged=False)
            reqs = [be.submit(p, s) for p in prompts]
            for _ in range(100):
                if be.step() == 0:
                    break
        out = [r.output_ids for r in reqs]
        eng.gguf.close()
        return out

    old_impl = llama_mod.FUSED_DECODE_IMPL
    llama_mod.FUSED_DECODE_IMPL = "fused"
    try:
        assert run({"dp": 2, "tp": 4}) == run(None)
    finally:
        llama_mod.FUSED_DECODE_IMPL = old_impl


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def test_tp_pershard_fused_mlp(tmp_path):
    """Per-shard fused projections under TP (VERDICT r2 #6 stage 2): with
    kernel-eligible local shapes, load builds TP-interleaved wqkv and
    per-shard fused-MLP containers (q4mlpg/q4mlpd, tpi=tp); decode through
    the whole-scan shard_map path AND prefill through mlp_tp both match the
    single-device engine exactly."""
    from nfai_tpu.gguf import GGMLType
    from nfai_tpu.models import llama as llama_mod

    path = make_tiny_llama_gguf(
        tmp_path / "psm.gguf",
        vocab_size=256,
        hidden=1024,
        n_layers=2,
        n_heads=8,
        n_kv_heads=4,
        ffn_dim=2048,
        context_length=256,
        quant=GGMLType.Q4_K,
        seed=41,
    )
    from nfai_tpu.models.llama import KVCache, decode_step, prefill_step

    base_cfg = dict(max_seq_len=128, dtype="bfloat16", prefill_chunk=32)
    ids = [int(x) for x in np.random.default_rng(7).integers(5, 200, 13)]
    toks = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
    last = jnp.asarray([len(ids) - 1], jnp.int32)

    def logits_pair(eng):
        cache = eng.new_cache(1)
        lg, cache = prefill_step(
            eng.params, eng.model_cfg, toks, pos, last, cache
        )
        t1 = jnp.asarray([int(np.argmax(lg))], jnp.int32)
        l2, _ = decode_step(
            eng.params, eng.model_cfg, t1,
            jnp.asarray([len(ids)], jnp.int32), cache,
        )
        return np.asarray(lg, np.float32), np.asarray(l2, np.float32)

    plain = InferenceEngine(path, EngineConfig(**base_cfg))
    want = logits_pair(plain)
    plain.gguf.close()

    old_impl = llama_mod.FUSED_DECODE_IMPL
    llama_mod.FUSED_DECODE_IMPL = "fused"
    try:
        for tp in (2, 4):
            sharded = InferenceEngine(
                path, EngineConfig(**base_cfg, mesh_shape={"dp": 8 // tp,
                                                           "tp": tp})
            )
            layers = sharded.params["layers"]
            assert layers["wqkv"].tpi == tp, tp
            assert layers["w_gate_up"].kind == "q4mlpg", tp
            assert layers["w_gate_up"].tpi == tp
            assert layers["w_down"].kind == "q4mlpd", tp
            assert llama_mod._fused_tp_eligible(
                sharded.params, sharded.model_cfg, sharded.new_cache(1)
            ), tp
            with jax.sharding.set_mesh(sharded.mesh):
                got = logits_pair(sharded)
            # bf16 kernel-variant rounding: the TP split reorders f32
            # accumulation; measured diffs (~0.06-0.13 on ~4.3-scale
            # logits) are BELOW the single-chip fused-vs-twokernel kernel
            # choice (~0.17). A layout bug would give O(scale) garbage.
            for g, w in zip(got, want):
                scale = np.abs(w).max()
                assert np.abs(g - w).max() < 0.08 * scale, tp
            sharded.gguf.close()
    finally:
        llama_mod.FUSED_DECODE_IMPL = old_impl
