"""Compare layer-stack structures for the decode step: how the KV cache is
threaded determines whether its 268 MB (1B, b8, S1024) is rewritten per step.

  A) scan with cache as xs/ys (round-1 design): scan materializes a fresh
     stacked cache every step — full rewrite.
  B) scan with the full stacked cache as *carry*, updated in place by one
     dynamic_update_slice per layer at index l.
  C) Python-unrolled layers, same in-place updates, static layer indices.

All three run the same dense-bf16 1B-shaped math (matmuls + rope + einsum
attention); per-step time measured by the two-point slope (fixed dispatch
latency cancels).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from nfai_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp

from nfai_tpu.ops import rms_norm
from nfai_tpu.ops.rope import apply_rope_cs, rope_cos_sin

B, HQ, HKV, D, S, L, H, F, V = 8, 32, 8, 64, 1024, 16, 2048, 8192, 128256
QD, KVD = HQ * D, HKV * D


def sync(x):
    return np.asarray(jnp.sum(jax.tree.leaves(x)[0][0].astype(jnp.float32)))


key = jax.random.PRNGKey(0)
kit = iter(jax.random.split(key, 32))


def rand(*s):
    return (jax.random.normal(next(kit), s, jnp.float32) * 0.02).astype(jnp.bfloat16)


lp = {
    "attn_norm": jnp.ones((L, H), jnp.float32),
    "wqkv": rand(L, H, QD + 2 * KVD),
    "wo": rand(L, QD, H),
    "ffn_norm": jnp.ones((L, H), jnp.float32),
    "w_gate_up": rand(L, H, 2 * F),
    "w_down": rand(L, F, H),
}
embed = rand(V, H)
lm_head = rand(H, V)
inv_freq = jnp.asarray(
    1.0 / (500000.0 ** (np.arange(0, D, 2) / D)), jnp.float32
)
kc0 = jnp.zeros((L, HKV, B, S, D), jnp.bfloat16)
vc0 = jnp.zeros_like(kc0)

NEG_INF = -1e30


def attn_dense(q, kcl, vcl, positions):
    b, t, hq, d = q.shape
    hkv, _, s, _ = kcl.shape
    nr = hq // hkv
    qg = q.reshape(b, t, hkv, nr, d)
    logits = jnp.einsum(
        "bthrd,hbsd->bhrts", qg, kcl, preferred_element_type=jnp.float32
    ) * (1.0 / d**0.5)
    mask = jnp.arange(s)[None, None, :] <= positions[:, :, None]
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(vcl.dtype)
    return jnp.einsum("bhrts,hbsd->bthrd", w, vcl).reshape(b, t, hq, d)


def layer_math(h, p, cos, sin, positions, kcl, vcl, start):
    """Returns (h_out, new_k [HKV,B,1,D], new_v, attn-input k/v built by the
    caller). kcl/vcl must already contain the new token."""
    x = rms_norm(h, p["attn_norm"], 1e-5)
    qkv = x @ p["wqkv"]
    q = qkv[..., :QD].reshape(B, 1, HQ, D)
    k = qkv[..., QD : QD + KVD].reshape(B, 1, HKV, D)
    v = qkv[..., QD + KVD :].reshape(B, 1, HKV, D)
    q = apply_rope_cs(q, cos, sin, neox=True)
    k = apply_rope_cs(k, cos, sin, neox=True)
    return x, q, k, v


def ffn(h, p):
    x = rms_norm(h, p["ffn_norm"], 1e-5)
    gu = x @ p["w_gate_up"]
    return (jax.nn.silu(gu[..., :F]) * gu[..., F:]) @ p["w_down"]


def head_and_advance(h, tok):
    logits = (rms_norm(h, jnp.ones((H,), jnp.float32), 1e-5)[:, 0] @ lm_head).astype(jnp.float32)
    return jnp.argmax(logits, -1).astype(jnp.int32)


def make_A():
    """cache as scan xs/ys (round-1 design)."""

    def step(tok, pos, kc, vc):
        h = jnp.take(embed, tok[:, None], axis=0).astype(jnp.bfloat16)
        positions = pos[:, None]
        cos, sin = rope_cos_sin(positions, inv_freq)
        start = pos[0]

        def body(h, xs):
            p, kcl, vcl = xs
            x, q, k, v = layer_math(h, p, cos, sin, positions, kcl, vcl, start)
            kn = jnp.moveaxis(k.astype(kcl.dtype), 2, 0)
            vn = jnp.moveaxis(v.astype(vcl.dtype), 2, 0)
            kcl = jax.lax.dynamic_update_slice(kcl, kn, (0, 0, start, 0))
            vcl = jax.lax.dynamic_update_slice(vcl, vn, (0, 0, start, 0))
            attn = attn_dense(q, kcl, vcl, positions).reshape(B, 1, QD)
            h = (h + attn @ p["wo"]).astype(jnp.bfloat16)
            h = (h + ffn(h, p)).astype(jnp.bfloat16)
            return h, (kcl, vcl)

        h, (kc, vc) = jax.lax.scan(body, h, (lp, kc, vc))
        return head_and_advance(h, tok), pos + 1, kc, vc

    return step


def make_B():
    """full stacked cache as scan carry, in-place DUS at layer l."""

    def step(tok, pos, kc, vc):
        h = jnp.take(embed, tok[:, None], axis=0).astype(jnp.bfloat16)
        positions = pos[:, None]
        cos, sin = rope_cos_sin(positions, inv_freq)
        start = pos[0]

        def body(carry, p):
            h, kc, vc, l = carry
            x, q, k, v = layer_math(h, p, cos, sin, positions, None, None, start)
            kn = jnp.moveaxis(k.astype(kc.dtype), 2, 0)[None]  # [1,HKV,B,1,D]
            vn = jnp.moveaxis(v.astype(vc.dtype), 2, 0)[None]
            kc = jax.lax.dynamic_update_slice(kc, kn, (l, 0, 0, start, 0))
            vc = jax.lax.dynamic_update_slice(vc, vn, (l, 0, 0, start, 0))
            kcl = jax.lax.dynamic_slice(kc, (l, 0, 0, 0, 0), (1, HKV, B, S, D))[0]
            vcl = jax.lax.dynamic_slice(vc, (l, 0, 0, 0, 0), (1, HKV, B, S, D))[0]
            attn = attn_dense(q, kcl, vcl, positions).reshape(B, 1, QD)
            h = (h + attn @ p["wo"]).astype(jnp.bfloat16)
            h = (h + ffn(h, p)).astype(jnp.bfloat16)
            return (h, kc, vc, l + 1), ()

        (h, kc, vc, _), _ = jax.lax.scan(body, (h, kc, vc, jnp.int32(0)), lp)
        return head_and_advance(h, tok), pos + 1, kc, vc

    return step


def make_C():
    """unrolled layers, static indices."""

    def step(tok, pos, kc, vc):
        h = jnp.take(embed, tok[:, None], axis=0).astype(jnp.bfloat16)
        positions = pos[:, None]
        cos, sin = rope_cos_sin(positions, inv_freq)
        start = pos[0]
        for l in range(L):
            p = jax.tree.map(lambda a: a[l], lp)
            x, q, k, v = layer_math(h, p, cos, sin, positions, None, None, start)
            kn = jnp.moveaxis(k.astype(kc.dtype), 2, 0)[None]
            vn = jnp.moveaxis(v.astype(vc.dtype), 2, 0)[None]
            kc = jax.lax.dynamic_update_slice(kc, kn, (l, 0, 0, start, 0))
            vc = jax.lax.dynamic_update_slice(vc, vn, (l, 0, 0, start, 0))
            attn = attn_dense(q, kc[l], vc[l], positions).reshape(B, 1, QD)
            h = (h + attn @ p["wo"]).astype(jnp.bfloat16)
            h = (h + ffn(h, p)).astype(jnp.bfloat16)
        return head_and_advance(h, tok), pos + 1, kc, vc

    return step


def bench(name, step, n):
    @jax.jit
    def run(tok, pos, kc, vc):
        def body(c, _):
            tok, pos, kc, vc = c
            return step(tok, pos, kc, vc), ()

        c, _ = jax.lax.scan(body, (tok, pos, kc, vc), length=n)
        return c

    tok = jnp.zeros(B, jnp.int32)
    pos = jnp.full(B, 128, jnp.int32)
    out = run(tok, pos, kc0, vc0)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(tok, pos, kc0, vc0)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


which = sys.argv[1:] or ["A", "B", "C"]
makers = {"A": make_A, "B": make_B, "C": make_C}
for w in which:
    step = makers[w]()
    t32 = bench(w, step, 32)
    t64 = bench(w, step, 64)
    per = (t64 - t32) / 32
    print(f"variant {w}: {per*1e3:.3f} ms/step  (t32={t32*1e3:.1f} t64={t64*1e3:.1f})",
          flush=True)
