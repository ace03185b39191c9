"""Perplexity tool tests: finite ppl, quantized-vs-dense delta small on the
same file (the quantization error lives in the checkpoint, not the kernels)."""
import numpy as np

import jax.numpy as jnp

from nfai_tpu.eval import perplexity
from nfai_tpu.gguf import GGMLType, GGUFFile
from nfai_tpu.models import LlamaConfig, load_params
from nfai_tpu.models.testing import make_tiny_llama_gguf


def test_perplexity_finite_and_kernel_parity(tmp_path, rng):
    path = make_tiny_llama_gguf(
        tmp_path / "q.gguf",
        vocab_size=256,
        hidden=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=4,
        ffn_dim=256,
        quant=GGMLType.Q8_0,
        seed=9,
    )
    ids = rng.integers(0, 250, size=64).astype(np.int32)
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        dense = load_params(g, cfg, dtype=jnp.float32, quantized=False)
        quant = load_params(g, cfg, dtype=jnp.float32, quantized="auto")
    p_dense = perplexity(dense, cfg, ids, window=32)
    p_quant = perplexity(quant, cfg, ids, window=32)
    assert np.isfinite(p_dense) and p_dense > 1
    # same checkpoint bits either path; only matmul rounding differs
    assert abs(p_quant - p_dense) / p_dense < 0.02


def test_perplexity_requires_enough_tokens(tmp_path, rng):
    path = make_tiny_llama_gguf(tmp_path / "t.gguf")
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        params = load_params(g, cfg, dtype=jnp.float32)
    try:
        perplexity(params, cfg, np.arange(10), window=32)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
