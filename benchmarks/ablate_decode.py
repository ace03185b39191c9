"""Ablate the 1B decode step: which part eats the time?"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys, numpy as np, jax, jax.numpy as jnp
from functools import partial
from nfai_tpu.utils.jax_setup import enable_persistent_cache
enable_persistent_cache()
from nfai_tpu.ops import rms_norm, apply_rope
from nfai_tpu.models.llama import _cached_attention, _write_cache

def sync(x): return np.asarray(jnp.sum(x.astype(jnp.float32)))
key = jax.random.PRNGKey(0)
H, L, HQ, HKV, D, F, V, B, S = 2048, 16, 32, 8, 64, 8192, 128256, 8, 1024
kit = iter(jax.random.split(key, 32))
def rand(*s): return (jax.random.normal(next(kit), s, jnp.float32)*0.02).astype(jnp.bfloat16)
lp = {"attn_norm": jnp.ones((L, H), jnp.float32), "wq": rand(L, H, 2048),
      "wk": rand(L, H, 512), "wv": rand(L, H, 512), "wo": rand(L, 2048, H),
      "ffn_norm": jnp.ones((L, H), jnp.float32), "w_gate": rand(L, H, F),
      "w_up": rand(L, H, F), "w_down": rand(L, F, H)}
embed = rand(V, H); lm_head = rand(H, V)
inv_freq = jnp.asarray(1.0/(500000.0**(np.arange(0,D,2)/D)), jnp.float32)
kc = jnp.zeros((L, HKV, B, S, D), jnp.bfloat16); vc = jnp.zeros_like(kc)
REP = 64

def make_step(with_attn, with_head, with_norm_rope, with_cache_write):
    def step(tok, pos, kc, vc, key):
        h = jnp.take(embed, tok[:, None], axis=0).astype(jnp.bfloat16)
        positions = pos[:, None]
        starts = positions[:, 0]
        def layer(h, xs):
            p, kcl, vcl = xs
            x = rms_norm(h, p["attn_norm"], 1e-5) if with_norm_rope else h
            q = (x @ p["wq"]).reshape(B, 1, HQ, D)
            k = (x @ p["wk"]).reshape(B, 1, HKV, D)
            v = (x @ p["wv"]).reshape(B, 1, HKV, D)
            if with_norm_rope:
                q = apply_rope(q, positions, inv_freq)
                k = apply_rope(k, positions, inv_freq)
            if with_cache_write:
                kcl = _write_cache(kcl, k, starts, True)
                vcl = _write_cache(vcl, v, starts, True)
            if with_attn:
                attn = _cached_attention(q, kcl, vcl, positions)
            else:
                attn = q
            h = (h + attn.reshape(B, 1, 2048) @ p["wo"]).astype(jnp.bfloat16)
            x = rms_norm(h, p["ffn_norm"], 1e-5) if with_norm_rope else h
            g = jax.nn.silu(x @ p["w_gate"]) * (x @ p["w_up"])
            h = (h + g @ p["w_down"]).astype(jnp.bfloat16)
            return h, (kcl, vcl)
        h, (kc2, vc2) = jax.lax.scan(layer, h, (lp, kc, vc))
        if with_head:
            logits = (h[:, 0] @ lm_head).astype(jnp.float32)
            from nfai_tpu.ops.sampling import sample_logits
            key, sub = jax.random.split(key)
            tok = sample_logits(logits, sub, 0.7, 40, 0.95).astype(jnp.int32)
        else:
            tok = tok + 1
        return tok, kc2, vc2, key
    @jax.jit
    def loop(tok, pos, kc, vc, key):
        def body(c, _):
            tok, pos, kc, vc, key = c
            tok, kc, vc, key = step(tok, pos, kc, vc, key)
            return (tok, pos + 1, kc, vc, key), ()
        c, _ = jax.lax.scan(body, (tok, pos, kc, vc, key), length=REP)
        return c[0]
    return loop

tok0 = jnp.zeros(B, jnp.int32); pos0 = jnp.full(B, 128, jnp.int32)
variants = [
    ("full step        ", (True, True, True, True)),
    ("no attention     ", (False, True, True, True)),
    ("no lm_head+sample", (True, False, True, True)),
    ("no norm/rope     ", (True, True, False, True)),
    ("no cache write   ", (True, True, True, False)),
    ("matmuls only     ", (False, False, False, False)),
]
which = sys.argv[1:] or [str(i) for i in range(len(variants))]
for i in map(int, which):
    name, flags = variants[i]
    fn = make_step(*flags)
    r = fn(tok0, pos0, kc, vc, key); sync(r)
    t0 = time.perf_counter(); sync(fn(tok0, pos0, kc, vc, key))
    per = (time.perf_counter() - t0 - 0.026) / REP
    print(f"{name}: {per*1e3:.2f} ms/step", flush=True)
