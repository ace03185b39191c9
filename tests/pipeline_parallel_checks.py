"""Pipeline-parallel stage-split rehearsal (VERDICT r4 item 6): the
layer-stacked [L, ...] parameter layout splits into contiguous stage
sub-stacks by pure L-axis slicing — dense AND quantized containers — and
the unchanged forward, entered through the h0 / final_norm seams, chains
across stages (on distinct devices) to logits identical to the
single-stage forward. Prefill + decode, 2 and 4 stages."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfai_tpu.gguf import GGMLType, GGUFFile
from nfai_tpu.models import KVCache
from nfai_tpu.models import llama as L
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.parallel.pipeline_parallel import (
    pp_forward,
    split_cache,
    split_stages,
)


def _load(tmp_path, quant=None):
    kw = {"quant": quant} if quant is not None else {}
    path = make_tiny_llama_gguf(
        tmp_path / "m.gguf", hidden=256, n_layers=4, n_heads=4, n_kv_heads=2,
        ffn_dim=512, context_length=512, **kw,
    )
    with GGUFFile.open(path) as g:
        cfg = L.LlamaConfig.from_gguf(g)
        params = L.load_params(
            g, cfg, dtype=jnp.float32,
            quantized="auto" if quant is not None else False,
        )
    return cfg, params


@pytest.mark.parametrize("n_stages", [2, 4])
@pytest.mark.parametrize("quant", [None, GGMLType.Q4_K])
def test_pp_matches_single_stage(tmp_path, n_stages, quant):
    cfg, params = _load(tmp_path, quant)
    T = 24
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(5, 200, (1, T)), jnp.int32)
    positions = jnp.arange(T, dtype=jnp.int32)[None]

    cache = KVCache.zeros(cfg, 1, 128, jnp.float32)
    want_h, want_cache = L.forward(params, cfg, tokens, positions, cache)
    want = L.logits_for(params, want_h[:, -1:])

    stages = split_stages(params, n_stages, cfg)
    caches = split_cache(KVCache.zeros(cfg, 1, 128, jnp.float32), n_stages)
    # distinct devices per stage when available: the h transfer between
    # them is the pipeline boundary
    devs = jax.devices()
    devices = [devs[i % len(devs)] for i in range(n_stages)]
    got_h, new_caches = pp_forward(stages, tokens, positions, caches, devices)
    got = L.logits_for(stages[-1][0], got_h[:, -1:])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )
    # stage caches hold exactly the full run's layer slices
    per = cfg.n_layers // n_stages
    for i, nc in enumerate(new_caches):
        np.testing.assert_allclose(
            np.asarray(nc.k), np.asarray(want_cache.k[i * per:(i + 1) * per]),
            atol=1e-5,
        )

    # one decode token through the pipeline
    tok = jnp.argmax(want, axis=-1).astype(jnp.int32)
    pos1 = jnp.full((1, 1), T, jnp.int32)
    want_h1, _ = L.forward(params, cfg, tok, pos1, want_cache)
    want1 = L.logits_for(params, want_h1)
    got_h1, _ = pp_forward(stages, tok, pos1, new_caches, devices)
    got1 = L.logits_for(stages[-1][0], got_h1)
    np.testing.assert_allclose(
        np.asarray(got1), np.asarray(want1), atol=2e-4, rtol=2e-4
    )
