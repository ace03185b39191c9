"""Paged KV cache: block-table kernel parity, allocator/prefix-cache
semantics, and paged forward == dense forward on the real model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nfai_tpu.runtime.paged_cache import (
    OutOfPages,
    PageAllocator,
    PagedKVCache,
    write_paged,
)


def test_paged_kernel_matches_reference():
    from nfai_tpu.ops.paged_attention import (
        paged_attention_reference,
        paged_flash_decode_attention,
    )

    b, hq, hkv, d, ps, npages = 4, 8, 2, 64, 128, 16
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (b, hq, d), jnp.float32)
    k_pages = jax.random.normal(k2, (hkv, npages, ps, d), jnp.float32)
    v_pages = jax.random.normal(k3, (hkv, npages, ps, d), jnp.float32)
    # each row gets a random page permutation; varying lengths incl. edges
    tables = jnp.asarray(
        np.stack([np.random.RandomState(i).permutation(npages)[:4] for i in range(b)]),
        jnp.int32,
    )
    lengths = jnp.asarray([1, 130, 256, 512], jnp.int32)
    got = paged_flash_decode_attention(
        q, k_pages, v_pages, tables, lengths, interpret=True
    )
    want = paged_attention_reference(q, k_pages, v_pages, tables, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-3)


def test_write_paged_scatter():
    hkv, p, ps, d, b, t = 2, 8, 16, 8, 3, 4
    pages = jnp.zeros((hkv, p, ps, d), jnp.float32)
    new = jnp.arange(b * t * hkv * d, dtype=jnp.float32).reshape(b, t, hkv, d)
    tables = jnp.asarray([[1, 2], [3, 4], [5, 6]], jnp.int32)
    # rows starting at position 14 span a page boundary (14,15 -> page0; 16,17 -> page1)
    positions = jnp.asarray([[14, 15, 16, 17]] * b, jnp.int32)
    out = write_paged(pages, new, tables, positions)
    out = np.asarray(out)
    want = np.asarray(new)
    for bi in range(b):
        for ti in range(t):
            pos = 14 + ti
            page = np.asarray(tables)[bi, pos // ps]
            assert (out[:, page, pos % ps, :] == want[bi, ti]).all()
    # untouched pages stay zero
    assert (out[:, 0] == 0).all() and (out[:, 7] == 0).all()


def test_allocator_refcounts_and_oom():
    a = PageAllocator(n_pages=6, page_size=16)  # page 0 reserved
    p1 = a.alloc(3)
    p2 = a.alloc(2)
    assert len(set(p1) | set(p2)) == 5 and 0 not in p1 + p2
    with pytest.raises(OutOfPages):
        a.alloc(1)
    a.release(p2)
    p3 = a.alloc(2)
    assert set(p3) == set(p2)
    a.retain(p1)
    a.release(p1)
    with pytest.raises(OutOfPages):
        a.alloc(3)  # p1 still referenced once
    a.release(p1)
    assert a.alloc(3) is not None


def test_prefix_cache_share_and_evict():
    ps = 4
    a = PageAllocator(n_pages=8, page_size=ps)
    ids = list(range(1, 13))  # 12 tokens = 3 full pages
    pages = a.alloc(3)
    a.publish_prefix(ids, pages)
    # same prompt: all full pages shared except the final token's page rule
    shared, n = a.lookup_prefix(ids)
    # 12 tokens: usable = (12-1)//4 = 2 pages (final token always recomputed)
    assert n == 8 and shared == pages[:2]
    assert all(a.refs[p] == 2 for p in shared)
    # longer prompt with same prefix: all 3 pages shared
    shared2, n2 = a.lookup_prefix(ids + [99, 100])
    assert n2 == 12 and shared2 == pages
    # divergent prompt: nothing shared
    shared3, n3 = a.lookup_prefix([5, 6, 7, 8, 9, 10, 11, 12])
    assert n3 == 0 and shared3 == []
    a.release(shared)
    a.release(shared2)
    a.release(pages)
    # all refs 0 but pages stay cached; allocating everything evicts them LRU
    got = a.alloc(7)
    assert len(got) == 7
    shared4, n4 = a.lookup_prefix(ids)
    assert n4 == 0  # cache fully evicted


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from nfai_tpu.gguf import GGUFFile
    from nfai_tpu.models.llama import LlamaConfig, load_params
    from nfai_tpu.models.testing import make_tiny_llama_gguf

    d = tmp_path_factory.mktemp("paged")
    path = make_tiny_llama_gguf(
        d / "m.gguf", hidden=128, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=256, context_length=512,
    )
    with GGUFFile.open(path) as g:
        cfg = LlamaConfig.from_gguf(g)
        params = load_params(g, cfg, dtype=jnp.float32)
    return cfg, params


def test_paged_forward_matches_dense(tiny_model):
    """Prefill a prompt + decode greedily through both cache layouts; logits
    and sampled tokens must match exactly (same math, different plumbing)."""
    from nfai_tpu.models import KVCache
    from nfai_tpu.models.llama import (
        decode_loop,
        paged_decode_loop,
        paged_prefill_step,
        prefill_step,
    )

    cfg, params = tiny_model
    ps = 16
    rng = np.random.default_rng(0)
    prompt = rng.integers(5, 200, 21).astype(np.int32)
    T = 32  # padded chunk
    tokens = np.zeros((1, T), np.int32)
    tokens[0, : prompt.size] = prompt
    positions = np.arange(T, dtype=np.int32)[None]
    last = np.asarray([prompt.size - 1], np.int32)

    # dense
    dcache = KVCache.zeros(cfg, 1, 64, jnp.float32)
    dlogits, dcache = prefill_step(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions),
        jnp.asarray(last), dcache,
    )

    # paged: 4-page table for this slot (positions 0..63)
    pool = PagedKVCache.zeros(cfg, n_pages=9, page_size=ps, dtype=jnp.float32)
    tables = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    plogits, pool = paged_prefill_step(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions),
        jnp.asarray(last), pool, tables,
    )
    np.testing.assert_allclose(
        np.asarray(dlogits), np.asarray(plogits), atol=1e-4, rtol=1e-4
    )

    # greedy decode 8 tokens through both paths
    first = jnp.argmax(dlogits, -1).astype(jnp.int32)
    start = jnp.asarray([prompt.size], jnp.int32)
    key = jax.random.PRNGKey(0)
    dtoks, dnext, _, _ = decode_loop(
        params, cfg, first, start, dcache, key, 8, temperature=0.0,
        uniform_start=False,
    )
    ptoks, pnext, _, _ = paged_decode_loop(
        params, cfg, first, start, pool, tables, key, 8, temperature=0.0,
    )
    assert np.asarray(dtoks).tolist() == np.asarray(ptoks).tolist()
    assert int(dnext[0]) == int(pnext[0])
