"""Real-TPU numerics check for the fused decode + flash prefill kernels.

Runs a tiny synthetic model on the actual chip (no interpret mode) and
compares the fused/kernels path against the XLA reference path. Catches
Mosaic lowering bugs that interpret-mode tests cannot (layout, DMA, MXU
rounding). Prints PARITY-OK or the max deviation.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np

from nfai_tpu.gguf import GGMLType, GGUFFile
from nfai_tpu.models import KVCache, LlamaConfig, forward, load_params, logits_for
from nfai_tpu.models import llama as llama_mod
from nfai_tpu.models.testing import make_tiny_llama_gguf


def main():
    print("device:", jax.devices()[0])
    path = "/tmp/nfai_parity_tiny.gguf"
    make_tiny_llama_gguf(
        path, hidden=256, n_layers=2, n_heads=4, n_kv_heads=2, ffn_dim=512,
        context_length=512, quant=GGMLType.Q4_K, seed=13,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        params = load_params(g, cfg, dtype=jnp.bfloat16, quantized="auto")
    b, s, t = 4, 256, 128  # prompt >= _FLASH_PREFILL_MIN_T (and %64) to hit the kernel
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(4, 200, (b, t)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))

    def run(fused_impl, prefill_impl):
        llama_mod.FUSED_DECODE_IMPL = fused_impl
        llama_mod.PREFILL_ATTN_IMPL = prefill_impl
        cache = KVCache.zeros(cfg, b, s, jnp.bfloat16)
        h, cache = forward(params, cfg, toks, pos, cache)
        outs = [np.asarray(logits_for(params, h[:, -1:]), np.float32)]
        # fresh stream per run: both impls must see IDENTICAL tokens
        nt = jnp.asarray(
            np.random.default_rng(7).integers(4, 200, (b, 1)), jnp.int32
        )
        for i in range(3):
            h, cache = forward(
                params, cfg, nt, jnp.full((b, 1), t + i, jnp.int32), cache
            )
            outs.append(np.asarray(logits_for(params, h), np.float32))
        return outs

    ref = run("xla", "xla")
    got = run("auto", "auto")
    llama_mod.FUSED_DECODE_IMPL = "auto"
    ok = True
    for i, (a, b_) in enumerate(zip(ref, got)):
        scale = np.abs(a).max() + 1e-6
        dev = np.abs(a - b_).max() / scale
        print(f"step {i}: rel dev {dev:.4f}")
        ok &= dev < 0.05  # bf16 path, different reduction orders
    print("PARITY-OK" if ok else "PARITY-FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
