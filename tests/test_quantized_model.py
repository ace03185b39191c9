"""Quantized end-to-end model tests: a Q8_0/Q4-quantized GGUF loaded with
fused kernels must produce (near-)identical logits to the same file loaded
dense-dequantized — the quantization error is in the file, not the kernels."""
import numpy as np
import pytest

import jax.numpy as jnp

from nfai_tpu.gguf import GGMLType, GGUFFile
from nfai_tpu.models import KVCache, LlamaConfig, forward, load_params, logits_for
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.ops.qtensor import QTensor


def _logits(params, cfg, toks):
    cache = KVCache.zeros(cfg, 1, 32, jnp.float32)
    h, _ = forward(
        params,
        cfg,
        jnp.asarray(toks),
        jnp.arange(toks.shape[1], dtype=jnp.int32)[None, :],
        cache,
        activation_dtype=jnp.float32,
    )
    return np.asarray(logits_for(params, h)[0], np.float32)


@pytest.mark.parametrize("quant", [GGMLType.Q8_0, GGMLType.Q4_0])
def test_quantized_matches_dense_dequant(tmp_path, quant):
    # hidden/ffn/kv sized so the layer mats hit the kernel layout constraints
    path = make_tiny_llama_gguf(
        tmp_path / f"q_{quant.name}.gguf",
        hidden=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=4,
        ffn_dim=256,
        quant=quant,
        seed=3,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        dense = load_params(g, cfg, dtype=jnp.float32, quantized=False)
        qparams = load_params(g, cfg, dtype=jnp.float32, quantized="auto")

    # the layer matmuls must actually be quantized (and fused)
    assert isinstance(qparams["layers"]["wqkv"], QTensor)
    assert isinstance(qparams["layers"]["w_gate_up"], QTensor)
    assert isinstance(qparams["layers"]["w_down"], QTensor)
    # embed (vocab=264, not %128) falls back dense
    assert qparams["embed"] is not None

    toks = np.array([[5, 17, 100, 42, 7]], dtype=np.int32)
    l_dense = _logits(dense, cfg, toks)
    l_quant = _logits(qparams, cfg, toks)
    # same quantized file either way; only bf16-matmul noise differs
    scale = np.abs(l_dense).max() + 1e-6
    assert np.abs(l_dense - l_quant).max() / scale < 0.03


def test_quantized_tied_head_gather(tmp_path):
    # vocab 256 (%128==0) -> tied embed stays quantized; embed is gathered
    path = make_tiny_llama_gguf(
        tmp_path / "q_tied.gguf",
        vocab_size=256,
        hidden=128,
        n_layers=1,
        n_heads=4,
        n_kv_heads=4,
        ffn_dim=256,
        quant=GGMLType.Q8_0,
        seed=4,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        dense = load_params(g, cfg, dtype=jnp.float32, quantized=False)
        qparams = load_params(g, cfg, dtype=jnp.float32, quantized="auto")
    assert qparams["embed"] is None
    assert isinstance(qparams["lm_head"], QTensor)

    toks = np.array([[3, 9, 250]], dtype=np.int32)
    l_dense = _logits(dense, cfg, toks)
    l_quant = _logits(qparams, cfg, toks)
    scale = np.abs(l_dense).max() + 1e-6
    assert np.abs(l_dense - l_quant).max() / scale < 0.03
