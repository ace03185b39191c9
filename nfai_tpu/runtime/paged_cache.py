"""Paged KV cache: global page pool + per-slot block tables + host allocator
with refcounts and prompt-prefix sharing.

Replaces the dense per-slot cache (models.llama.KVCache, batch x max_seq
reserved up front) for continuous batching: HBM holds one pool of
`n_pages` pages per layer and each request maps its positions onto pages
through a block table. Pages are refcounted so requests sharing a prompt
prefix share the underlying KV pages (the partial tail page is never shared).

Reference framing: the reference reserved a fixed 512-slot cache inside its
K/V matmul op per layer (``MatrixMultiplyShader.cs:52-66``) and overflowed
silently past it; here capacity is pooled, page-granular, and enforced.

Device-side layout (pytree `PagedKVCache`):
- k_pages/v_pages: [L, Hkv, P, page_size, D] — same head-major convention as
  the dense cache, so tensor-parallel sharding (kv-head axis) carries over;
- the block tables and lengths live host-side in the scheduler and are
  passed into the jitted step as [B, max_pages] / [B] arrays per chunk.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logging import get_logger

log = get_logger(__name__)

PAGE_SIZE = 128


class PagedKVCache(NamedTuple):
    """Device pool. k/v: [L, Hkv, P, page_size, D].

    Quantized pool (EngineConfig.kv_dtype="int8"): k/v are int8 and ks/vs
    hold the per-(token, kv-head) f32 scales as [L, Hkv, P, page_size] —
    the page token axis sits on lanes (time-minor, same lesson as the
    dense cache's [L,B,Hkv,S] layout). Scale pages share the block tables
    with their KV pages, so prefix sharing carries over unchanged."""

    k: jax.Array
    v: jax.Array
    ks: jax.Array | None = None  # [L, Hkv, P, page_size] f32 (int8 only)
    vs: jax.Array | None = None

    @classmethod
    def zeros(
        cls, cfg, n_pages: int, page_size: int = PAGE_SIZE, dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "PagedKVCache":
        shape = (cfg.n_layers, cfg.n_kv_heads, n_pages, page_size, cfg.head_dim)
        if quantized:
            sshape = shape[:-1]
            return cls(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32),
            )
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.ks is not None

    @property
    def n_pages(self) -> int:
        return self.k.shape[2]

    @property
    def page_size(self) -> int:
        return self.k.shape[3]


class OutOfPages(RuntimeError):
    """Pool exhausted: caller should retry after requests finish."""


def _hash_ids(ids: Sequence[int]) -> bytes:
    return hashlib.blake2b(
        np.asarray(ids, np.int32).tobytes(), digest_size=16
    ).digest()


@dataclass
class PageAllocator:
    """Host-side page bookkeeping: free list, refcounts, prefix cache.

    Prefix sharing: after a prompt is prefilled, every *full* page of prompt
    KV is published under the hash of the token prefix it covers. A later
    request whose prompt starts with the same tokens adopts those pages
    (refcount bump) and prefills only the remainder — the classic
    automatic-prefix-caching design, page-granular.

    Published pages are kept alive by the cache even at refcount 0 (LRU
    evicted only when the pool runs dry), so popular system prompts stay
    warm between requests.
    """

    n_pages: int
    page_size: int = PAGE_SIZE
    refs: np.ndarray = field(init=False)
    _free: list[int] = field(init=False)
    # prefix-hash -> page id (one entry covers ONE page, keyed by the hash of
    # all tokens from 0 to its end); insertion order doubles as LRU
    _prefix: dict[bytes, int] = field(init=False, default_factory=dict)
    _prefix_by_page: dict[int, bytes] = field(init=False, default_factory=dict)
    hits: int = field(init=False, default=0)
    misses: int = field(init=False, default=0)

    SINK_PAGE = 0  # reserved: inactive batch lanes write here (never allocated)

    def __post_init__(self):
        self.refs = np.zeros(self.n_pages, np.int32)
        self.refs[self.SINK_PAGE] = 1
        self._free = list(range(self.n_pages - 1, 0, -1))

    # -- raw alloc/free ------------------------------------------------------
    @property
    def free_pages(self) -> int:
        return len(self._free) + sum(
            1 for p in self._prefix.values() if self.refs[p] == 0
        )

    def _pop_free(self) -> int:
        if self._free:
            return self._free.pop()
        # evict the least-recently published refcount-0 cached page
        for h, p in list(self._prefix.items()):
            if self.refs[p] == 0:
                del self._prefix[h]
                del self._prefix_by_page[p]
                return p
        raise OutOfPages(f"all {self.n_pages} KV pages in use")

    def alloc(self, n: int) -> list[int]:
        if n > self.free_pages:
            raise OutOfPages(
                f"need {n} pages, only {self.free_pages} free of {self.n_pages}"
            )
        pages = [self._pop_free() for _ in range(n)]
        for p in pages:
            self.refs[p] = 1
        return pages

    def retain(self, pages: Sequence[int]) -> None:
        for p in pages:
            self.refs[p] += 1

    def release(self, pages: Sequence[int]) -> None:
        for p in pages:
            self.refs[p] -= 1
            assert self.refs[p] >= 0, f"double free of page {p}"
            if self.refs[p] == 0 and p not in self._prefix_by_page:
                self._free.append(p)
        # refcount-0 pages still in the prefix cache stay resident (warm)

    # -- prefix sharing ------------------------------------------------------
    def lookup_prefix(self, prompt_ids: Sequence[int]) -> tuple[list[int], int]:
        """Longest shared prefix: returns (pages, n_cached_tokens). The pages
        are retained for the caller; n_cached_tokens is a multiple of
        page_size and strictly less than len(prompt_ids) (the final token
        must always be recomputed so the caller gets logits)."""
        ps = self.page_size
        usable = (max(len(prompt_ids) - 1, 0)) // ps  # full pages, last token excluded
        pages: list[int] = []
        for i in range(usable):
            h = _hash_ids(prompt_ids[: (i + 1) * ps])
            p = self._prefix.get(h)
            if p is None:
                break
            pages.append(p)
        for p in pages:
            self.refs[p] += 1
        if pages:
            self.hits += 1
        elif usable:
            self.misses += 1
        return pages, len(pages) * ps

    def publish_prefix(self, prompt_ids: Sequence[int], pages: Sequence[int]) -> None:
        """Publish the full pages covering `prompt_ids` for future sharing.
        `pages[i]` must hold KV for tokens [i*ps, (i+1)*ps)."""
        ps = self.page_size
        for i in range(len(prompt_ids) // ps):
            h = _hash_ids(prompt_ids[: (i + 1) * ps])
            if h not in self._prefix:
                p = pages[i]
                prev = self._prefix_by_page.get(p)
                if prev is not None and prev != h:
                    continue  # page already published under another prefix
                self._prefix[h] = p
                self._prefix_by_page[p] = h


def write_paged(
    pages: jax.Array,  # [Hkv, P, ps, D] one layer's pool
    new: jax.Array,  # [B, T, Hkv, D]
    slot_pages: jax.Array,  # [B, max_pages] int32 block tables
    positions: jax.Array,  # [B, T] absolute positions
) -> jax.Array:
    """Scatter new KV rows into the pool through the block tables.

    One XLA scatter over the flattened (P*ps) axis; with the pool donated the
    update is in place.
    """
    hkv, p, ps, d = pages.shape
    page_idx = jnp.take_along_axis(slot_pages, positions // ps, axis=1)  # [B,T]
    flat_idx = (page_idx * ps + positions % ps).reshape(-1)  # [B*T]
    rows = jnp.moveaxis(new.astype(pages.dtype), 2, 0).reshape(hkv, -1, d)
    flat = pages.reshape(hkv, p * ps, d)
    flat = flat.at[:, flat_idx].set(rows)
    return flat.reshape(hkv, p, ps, d)


def write_paged_scales(
    spool: jax.Array,  # [Hkv, P, ps] one layer's scale pool
    new: jax.Array,  # [B, T, Hkv] per-token scales (quantize_kv output)
    slot_pages: jax.Array,  # [B, max_pages]
    positions: jax.Array,  # [B, T]
) -> jax.Array:
    """`write_paged` for the int8 pool's scale pages (same indexing)."""
    hkv, p, ps = spool.shape
    page_idx = jnp.take_along_axis(slot_pages, positions // ps, axis=1)
    flat_idx = (page_idx * ps + positions % ps).reshape(-1)  # [B*T]
    rows = jnp.moveaxis(new.astype(spool.dtype), 2, 0).reshape(hkv, -1)
    flat = spool.reshape(hkv, p * ps)
    return flat.at[:, flat_idx].set(rows).reshape(hkv, p, ps)
