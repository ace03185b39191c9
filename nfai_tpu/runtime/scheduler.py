"""Continuous batching: slot-based scheduler admitting/evicting requests
between fused decode chunks.

The reference serves exactly one request at a time with batch size 1
(SURVEY.md §2.7 "none — batch size 1 everywhere"); this scheduler runs up to
`max_batch` requests in lockstep decode, prefilling new arrivals into freed
slots between chunks. Decode uses per-slot positions (the non-uniform cache
write path) and per-slot sampling parameters; finished slots are masked
`active=False` so their lanes neither advance nor corrupt the cache.
"""
from __future__ import annotations

import itertools
import os
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from enum import Enum
from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SamplingParams
from ..models.llama import (
    decode_loop,
    paged_decode_loop,
    paged_prefill_step,
    prefill_slot_step,
)
from ..utils.logging import get_logger

log = get_logger(__name__)

_END = object()  # stream sentinel


class RequestState(Enum):
    QUEUED = "queued"
    RUNNING = "running"
    FINISHED = "finished"
    FAILED = "failed"
    CANCELLED = "cancelled"


@dataclass
class Request:
    """One generation request; tokens stream into `out`."""

    id: int
    prompt_ids: list[int]
    sampling: SamplingParams
    state: RequestState = RequestState.QUEUED
    output_ids: list[int] = field(default_factory=list)
    # SamplingParams.logprobs: one dict per emitted token —
    # {"id", "logprob", "top": [(token_id, logprob), ...]}
    logprob_data: list[dict] = field(default_factory=list)
    out: queue.Queue = field(default_factory=queue.Queue)
    submitted_at: float = field(default_factory=time.perf_counter)
    first_token_at: float | None = None
    finished_at: float | None = None
    _cancel: threading.Event = field(default_factory=threading.Event)

    def cancel(self) -> None:
        """Stop generating for this request (client disconnected / abort).
        Safe from any thread; the scheduler frees the slot between chunks —
        the reference had no way to stop a running generation at all."""
        self._cancel.set()

    @property
    def cancelled(self) -> bool:
        return self._cancel.is_set()

    def stream(self, timeout: float | None = None) -> Iterator[int]:
        """Yield generated token ids as they arrive (blocking iterator)."""
        while True:
            item = self.out.get(timeout=timeout)
            if item is _END:
                return
            yield item

    @property
    def ttft_s(self) -> float | None:
        if self.first_token_at is None:
            return None
        return self.first_token_at - self.submitted_at


@dataclass
class _Slot:
    request: Request | None = None
    pos: int = 0  # tokens with KV written
    budget: int = 0  # max tokens this request may still emit
    next_token: int = 0  # token sampled but not yet fed through the model
    pages: list[int] = field(default_factory=list)  # paged mode: block table
    # incremental prefill: remaining ids to push through the model; None once
    # the slot is decoding
    prefill_ids: np.ndarray | None = None
    prefill_next: int = 0  # next absolute position to prefill
    # grammar-constrained requests: the host automaton producing per-step
    # vocab masks (None for unconstrained slots). Constrained slots decode
    # inside the SAME fused batch step as everyone else (chunk forced to 1
    # while any constrained slot is active) — no serialization.
    machine: object | None = None

    @property
    def prefilling(self) -> bool:
        return self.prefill_ids is not None


class BatchEngine:
    """Continuous-batching executor over an `InferenceEngine`'s model.

    Drive it synchronously with `step()` (tests, embedding) or start the
    background thread with `start()` (server). Thread-safety: `submit` may be
    called from any thread; `step` must run on one thread only.

    With `paged=True` (default) KV lives in a shared page pool with per-slot
    block tables: page-granular allocation (no per-slot max_seq reservation),
    prompt-prefix sharing across requests (a request whose prompt starts with
    a previously-served prefix skips prefilling those pages entirely), and
    recompute-preemption when the pool runs dry mid-generation.
    """

    def __init__(
        self,
        engine,
        max_batch: int = 8,
        decode_chunk: int = 8,
        paged: bool | None = None,
        pool_tokens: int | None = None,
        queue_cap: int = 256,
        prefill_ticks_per_step: int = 1,
    ):
        self.engine = engine
        self.max_batch = max_batch
        self.decode_chunk = decode_chunk
        # arrivals prefill one chunk per scheduler step (between decode
        # chunks) instead of stalling every running slot for whole prompts;
        # raise for prefill-heavy workloads, 0 is invalid
        self.prefill_ticks_per_step = max(1, prefill_ticks_per_step)
        self.slots = [_Slot() for _ in range(max_batch)]
        self.queue: queue.Queue[Request] = queue.Queue(maxsize=queue_cap)
        self._parked: deque[Request] = deque()  # requeued (preempted) heads
        self._ids = itertools.count()
        self._key = jax.random.PRNGKey(0)
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        # the sampling kernel's sort width is static (one compiled variant);
        # per-request top_k is applied exactly by masking ranks within this
        # window (sample_logits top_k_rows). Requests asking for MORE than
        # the window are clamped to it — logged once per engine.
        self.top_k = 64
        self._warned_topk_clamp = False
        # sampling extensions: fixed-width per-slot logit-bias table and
        # output-token counts for presence/frequency penalties (lazy: only
        # materialized/passed when an active request uses them)
        self.bias_width = 16
        self._counts = None  # jnp [B, V] int32
        self._warned_bias_clamp = False
        # batched speculative decoding counters (see _spec_step)
        self.spec_drafted = 0
        self.spec_accepted = 0

        cfg = engine.config
        self.paged = cfg.paged_kv if paged is None else paged
        if self.paged:
            from .paged_cache import PagedKVCache, PageAllocator

            ps = cfg.page_size
            tokens = pool_tokens or cfg.kv_pool_tokens or (
                max_batch * engine.max_seq_len
            )
            n_pages = -(-tokens // ps) + 1  # + reserved sink page
            self.page_size = ps
            self.max_pages = -(-engine.max_seq_len // ps)
            self.alloc = PageAllocator(n_pages, ps)
            self.cache = PagedKVCache.zeros(
                engine.model_cfg, n_pages, ps, engine.cache_dtype,
                quantized=cfg.kv_dtype == "int8",
            )
            if getattr(engine, "mesh", None) is not None:
                # production TP layout for the shared pool: whole kv heads
                # per shard ([L, Hkv, P, ps, D] -> Hkv over tp, same axis
                # the dense cache shards its head-major KVD on); page axis
                # replicated so every shard sees every block table row
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel import TP_AXIS

                mesh = engine.mesh
                kvspec = NamedSharding(
                    mesh, P(None, TP_AXIS, None, None, None)
                )
                scspec = NamedSharding(mesh, P(None, TP_AXIS, None, None))
                self.cache = type(self.cache)(
                    jax.device_put(self.cache.k, kvspec),
                    jax.device_put(self.cache.v, kvspec),
                    None if self.cache.ks is None
                    else jax.device_put(self.cache.ks, scspec),
                    None if self.cache.vs is None
                    else jax.device_put(self.cache.vs, scspec),
                )
            log.info(
                "paged KV pool: %d pages x %d tokens (%.1f MB%s)",
                n_pages, ps,
                sum(a.nbytes for a in self.cache if a is not None) / 1e6,
                ", int8" if self.cache.quantized else "",
            )
        else:
            self.cache = engine.new_cache(max_batch)

    # -- client API --------------------------------------------------------
    def submit(
        self, prompt_ids: Sequence[int], sampling: SamplingParams | None = None
    ) -> Request:
        req = Request(
            id=next(self._ids),
            prompt_ids=list(prompt_ids),
            sampling=sampling or SamplingParams(),
        )
        max_prompt = self.engine.max_seq_len - 1
        if len(req.prompt_ids) > max_prompt:
            req.state = RequestState.FAILED
            req.out.put(_END)
            raise ValueError(
                f"prompt of {len(req.prompt_ids)} tokens exceeds capacity "
                f"{max_prompt}"
            )
        try:
            self.queue.put_nowait(req)
        except queue.Full:
            req.state = RequestState.FAILED
            req.out.put(_END)
            raise RuntimeError(
                f"request queue full ({self.queue.maxsize}); retry later"
            ) from None
        return req

    # -- scheduler ---------------------------------------------------------
    def _next_queued(self) -> Request | None:
        while True:
            if self._parked:
                req = self._parked.popleft()
            else:
                try:
                    req = self.queue.get_nowait()
                except queue.Empty:
                    return None
            if req.cancelled:
                req.state = RequestState.CANCELLED
                req.out.put(_END)
                continue
            return req

    def _admit(self) -> None:
        for i, slot in enumerate(self.slots):
            if slot.request is not None:
                continue
            req = self._next_queued()
            if req is None:
                return
            if not self._begin_prefill(i, req):
                # pool exhausted: park the request and stop admitting until
                # capacity frees up
                self._requeue_front(req)
                return

    def _requeue_front(self, req: Request) -> None:
        req.state = RequestState.QUEUED
        self._parked.appendleft(req)

    def _begin_prefill(self, slot_idx: int, req: Request) -> bool:
        """Assign a request to a slot and reserve its KV pages; the prompt is
        prefilled incrementally by `_prefill_tick` (one chunk per scheduler
        step) so running slots never stall for a whole prompt. Returns False
        when the paged pool cannot hold it (caller requeues). A preempted
        request's already-emitted tokens are part of the sequence to rebuild.
        """
        eng = self.engine
        full_ids = list(req.prompt_ids) + list(req.output_ids)
        ids = np.asarray(full_ids, np.int32)
        chunk_cap = eng.config.prefill_chunk

        slot = self.slots[slot_idx]
        start = 0
        if self.paged:
            from .paged_cache import OutOfPages

            shared, start = self.alloc.lookup_prefix(full_ids)
            ps = self.page_size
            # page coverage must include padded chunk tails (their writes
            # land in-slot past the prompt; masked by position later)
            pos, max_end = start, start
            while pos < ids.size:
                take = min(chunk_cap, ids.size - pos)
                bucket = min(_next_bucket(take, chunk_cap), eng.max_seq_len - pos)
                max_end = max(max_end, pos + bucket)
                pos += take
            need = -(-max_end // ps) - len(shared)
            try:
                new_pages = self.alloc.alloc(need) if need > 0 else []
            except OutOfPages:
                self.alloc.release(shared)
                return False
            slot.pages = list(shared) + list(new_pages)
            if start:
                log.debug(
                    "req %d: prefix cache hit, %d/%d tokens shared",
                    req.id, start, ids.size,
                )
        slot.request = req
        slot.prefill_ids = ids
        slot.prefill_next = start
        slot.machine = (
            self._build_machine(req) if req.sampling.constrained else None
        )
        req.state = RequestState.RUNNING
        if self._counts is not None:
            self._counts = self._counts.at[slot_idx].set(0)
        return True

    # -- grammar-constrained decoding ----------------------------------------
    @property
    def _cons(self):
        """Vocab-wide TokenConstraint shared with the engine (built once)."""
        return self.engine.json_constraint

    def _build_machine(self, req: Request):
        """Constraint automaton for a request; replays already-emitted
        tokens so preempted requests resume with consistent machine state."""
        from ..constrained import JsonMachine
        from ..grammar import machine_for

        m = machine_for(req.sampling)
        if m is None:
            m = JsonMachine(require_object=True)
        tb = self._cons.token_bytes
        for t in req.output_ids:
            if not m.advance_bytes(tb[t]):  # pragma: no cover - defensive
                log.error("req %d: constraint replay failed on token %d",
                          req.id, t)
                break
        return m

    def _mask_row(self, slot: _Slot, budget: int) -> np.ndarray:
        """bool[V] of legal next tokens for a constrained slot. Near the
        token budget the mask switches to 'closing' tokens so the output
        terminates as a complete match instead of truncating mid-structure
        (same policy as engine._generate_constrained)."""
        m = slot.machine
        closing = len(m.closing_string()) + 4 >= budget
        mask = (
            self._cons.closing_allowed(m) if closing else self._cons.allowed(m)
        )
        out = np.zeros(self.engine.model_cfg.vocab_size, bool)
        out[: mask.shape[0]] = mask
        return out

    def _advance_machine(self, slot_idx: int, tokens: list[int]) -> bool:
        """Feed emitted tokens through the slot's automaton (EOS stops it).
        Returns False when the machine rejected a token (mask bug — the
        request is failed rather than streaming malformed output)."""
        slot = self.slots[slot_idx]
        tb = self._cons.token_bytes
        for t in tokens:
            if self.engine.tokenizer.is_eos(t) or slot.machine.complete:
                break
            if not slot.machine.advance_bytes(tb[t]):
                log.error(
                    "req %d: constrained sampler emitted illegal token %d",
                    slot.request.id, t,
                )
                self._finish(slot_idx, RequestState.FAILED)
                return False
        return True

    def _prefill_tick(self, slot_idx: int) -> None:
        """Run ONE prefill chunk for the slot; on prompt completion, sample
        the first token and switch the slot to decoding."""
        eng = self.engine
        slot = self.slots[slot_idx]
        req = slot.request
        ids = slot.prefill_ids
        chunk_cap = eng.config.prefill_chunk
        pos = slot.prefill_next
        take = min(chunk_cap, ids.size - pos)
        bucket = min(_next_bucket(take, chunk_cap), eng.max_seq_len - pos)
        chunk = np.zeros(bucket, np.int32)
        chunk[:take] = ids[pos : pos + take]
        positions = np.arange(pos, pos + bucket, dtype=np.int32)
        if self.paged:
            logits, self.cache = paged_prefill_step(
                eng.params,
                eng.model_cfg,
                jnp.asarray(chunk[None, :]),
                jnp.asarray(positions[None, :]),
                jnp.asarray([take - 1], jnp.int32),
                self.cache,
                jnp.asarray(self._table_row(slot_idx)[None, :]),
            )
        else:
            logits, self.cache = prefill_slot_step(
                eng.params,
                eng.model_cfg,
                jnp.asarray(chunk[None, :]),
                jnp.asarray(positions[None, :]),
                jnp.asarray([take - 1], jnp.int32),
                self.cache,
                jnp.int32(slot_idx),
            )
        slot.prefill_next = pos + take
        if slot.prefill_next < ids.size:
            return  # more chunks to go; decode proceeds meanwhile
        # prompt complete: sample the first token
        if self.paged:
            self.alloc.publish_prefix([int(t) for t in ids], slot.pages)
        self._key, sub = jax.random.split(self._key)
        from ..ops.sampling import apply_logit_bias, sample_logits

        s = req.sampling
        if s.logit_bias:
            ids_b, vals_b = self._bias_row(s)
            logits = apply_logit_bias(
                logits, jnp.asarray(ids_b[None]), jnp.asarray(vals_b[None])
            )
        if slot.machine is not None:
            mrow = self._mask_row(
                slot, s.max_new_tokens - len(req.output_ids)
            )
            logits = jnp.where(jnp.asarray(mrow)[None, :], logits, -jnp.inf)
        tok = int(
            sample_logits(
                logits, sub, s.temperature, self.top_k, s.top_p,
                top_k_rows=jnp.asarray([self._effective_top_k(s.top_k)]),
                min_p=s.min_p,
            )[0]
        )
        if s.has_penalties:
            if self._counts is None:
                self._counts = jnp.zeros(
                    (self.max_batch, self.engine.model_cfg.vocab_size),
                    jnp.int32,
                )
            self._counts = self._counts.at[slot_idx].set(0).at[
                slot_idx, tok
            ].add(1)
        slot.prefill_ids = None
        slot.pos = int(ids.size)
        slot.budget = min(
            s.max_new_tokens - len(req.output_ids),
            self.engine.max_seq_len - ids.size,
        )
        slot.next_token = tok
        lps = None
        if s.logprobs is not None:
            from ..ops.sampling import token_logprobs

            lps = [self._lp_entry(
                *token_logprobs(logits, jnp.asarray([tok], jnp.int32),
                                self._lp_bucket(s.logprobs)),
                0, s.logprobs, tok,
            )]
        if slot.machine is not None and not self._advance_machine(
            slot_idx, [tok]
        ):
            return
        self._emit(slot_idx, [tok], lps)
        if (
            self.slots[slot_idx].request is not None
            and slot.machine is not None
            and slot.machine.complete
        ):
            self._finish(slot_idx)

    @staticmethod
    def _lp_bucket(k: int) -> int:
        """Static logprob widths are compile variants: bucket requests to
        {0, 8, 20} and slice each slot's rows to what it asked for."""
        return 0 if k <= 0 else (8 if k <= 8 else 20)

    @staticmethod
    def _lp_entry(lp, tid, tlp, row, want_k, token) -> dict:
        """Build one Request.logprob_data dict from device logprob arrays
        ([B]/[B,k] or step-sliced), slicing top rows to the requested k."""
        top = []
        if want_k and want_k > 0:
            ids = np.asarray(tid[row][:want_k])
            vals = np.asarray(tlp[row][:want_k])
            top = [(int(i), float(v)) for i, v in zip(ids, vals)]
        return {
            "id": int(token),
            "logprob": float(np.asarray(lp[row])),
            "top": top,
        }

    def _table_row(self, slot_idx: int) -> np.ndarray:
        row = np.zeros(self.max_pages, np.int32)  # sink-padded
        pages = self.slots[slot_idx].pages
        row[: len(pages)] = pages
        return row

    def _bias_row(self, sampling) -> tuple[np.ndarray, np.ndarray]:
        """Fixed-width (ids, biases) row; requests with more than
        `bias_width` entries keep the largest-magnitude ones."""
        ids = np.zeros(self.bias_width, np.int32)
        vals = np.zeros(self.bias_width, np.float32)
        pairs = sorted(
            sampling.logit_bias, key=lambda p: -abs(float(p[1]))
        )
        if len(pairs) > self.bias_width and not self._warned_bias_clamp:
            self._warned_bias_clamp = True
            log.warning(
                "request logit_bias has %d entries; keeping the %d largest "
                "(BatchEngine.bias_width)", len(pairs), self.bias_width,
            )
        for j, (tid, b) in enumerate(pairs[: self.bias_width]):
            ids[j] = int(tid)
            vals[j] = float(b)
        return ids, vals

    def _effective_top_k(self, requested: int) -> int:
        """Clamp a request's top_k to the static sampling window. top_k <= 0
        means "disabled" (sample from the whole window)."""
        if requested <= 0 or requested >= self.top_k:
            if requested > self.top_k and not self._warned_topk_clamp:
                self._warned_topk_clamp = True
                log.warning(
                    "request top_k=%d exceeds the engine sampling window "
                    "(%d); clamping (larger windows: BatchEngine.top_k)",
                    requested, self.top_k,
                )
            return self.top_k
        return requested

    def _emit(
        self, slot_idx: int, tokens: list[int], logprobs: list[dict] | None = None
    ) -> None:
        """Push tokens to the request stream; finish on EOS/budget.
        `logprobs` (when the request asked for them) runs parallel to
        `tokens`; entries for tokens cut by EOS/budget are dropped too."""
        slot = self.slots[slot_idx]
        req = slot.request
        tok_eos = self.engine.tokenizer.is_eos
        for j, t in enumerate(tokens):
            if req.first_token_at is None:
                req.first_token_at = time.perf_counter()
            if tok_eos(t) or slot.budget <= 0:
                self._finish(slot_idx)
                return
            req.output_ids.append(t)
            if logprobs is not None:
                req.logprob_data.append(logprobs[j])
            req.out.put(t)
            slot.budget -= 1
        if slot.budget <= 0:
            self._finish(slot_idx)

    def _finish(
        self, slot_idx: int, state: RequestState = RequestState.FINISHED
    ) -> None:
        slot = self.slots[slot_idx]
        req = slot.request
        req.state = state
        req.finished_at = time.perf_counter()
        req.out.put(_END)
        if self.paged and slot.pages:
            self.alloc.release(slot.pages)
        self.slots[slot_idx] = _Slot()

    def _preempt(self, slot_idx: int) -> None:
        """Recompute-preemption: free the slot's pages and requeue the
        request; on re-admission its prompt + already-emitted tokens are
        prefilled again (usually cheap — the pages stay warm in the prefix
        cache) and generation continues without visible interruption."""
        slot = self.slots[slot_idx]
        req = slot.request
        log.info(
            "preempting request %d (%d tokens generated) — KV pool full",
            req.id, len(req.output_ids),
        )
        if slot.pages:
            self.alloc.release(slot.pages)
        self.slots[slot_idx] = _Slot()
        self._requeue_front(req)

    def _grow_tables(self, active_idx: list[int], n: int) -> list[int]:
        """Ensure each active slot's block table covers pos + n more tokens;
        preempts the youngest slots when the pool is exhausted. Returns the
        still-active indices."""
        from .paged_cache import OutOfPages

        ps = self.page_size
        # oldest-first page growth; youngest-first preemption victims
        for i in sorted(
            active_idx, key=lambda j: self.slots[j].request.submitted_at
        ):
            slot = self.slots[i]
            need = -(-(slot.pos + n) // ps) - len(slot.pages)
            while need > 0:
                try:
                    slot.pages.extend(self.alloc.alloc(need))
                    need = 0
                except OutOfPages:
                    victims = [
                        j
                        for j in active_idx
                        if j != i and self.slots[j].request is not None
                    ]
                    if not victims:
                        log.warning(
                            "request %d out of KV pages with no victim to "
                            "preempt; finishing early", slot.request.id,
                        )
                        self._finish(i)
                        break
                    victim = max(
                        victims, key=lambda j: self.slots[j].request.submitted_at
                    )
                    self._preempt(victim)
        return [i for i, s in enumerate(self.slots) if s.request is not None]

    # -- batched speculative decoding ---------------------------------------
    def _spec_eligible(self, active_idx: list[int]) -> bool:
        """Batched prompt-lookup speculation runs when the engine enables
        it. Sampled (temperature>0) slots speculate via rejection-sampling
        acceptance (ops.sampling.spec_verify_sample — output law identical
        to plain sampling), greedy slots via exact argmax matching, and the
        two MIX freely in one batch. Excluded per-slot features that the
        fused verify does not model: logit bias, penalties (both mutate
        logits statefully), logprobs reporting, and grammar constraints."""
        cfg = self.engine.config
        if cfg.speculative != "ngram" or not active_idx:
            return False
        gamma = max(1, cfg.spec_tokens)
        rounds = max(1, cfg.spec_rounds)
        lookahead = rounds * (gamma + 1)
        max_seq = self.engine.max_seq_len
        if min(max_seq - self.slots[i].pos for i in active_idx) < lookahead:
            return False  # cache tail: plain chunks handle the remainder
        for i in active_idx:
            sp = self.slots[i].request.sampling
            if (sp.logit_bias or sp.has_penalties
                    or sp.logprobs is not None
                    or self.slots[i].machine is not None):
                return False
        return True

    def _spec_step(self, active_idx: list[int]) -> bool:
        """One fused speculative call for all decoding slots. Returns False
        if it could not run (paged pool pressure) so step() falls through
        to the plain chunk."""
        from ..models.llama import spec_decode_rounds

        cfg = self.engine.config
        gamma = max(1, cfg.spec_tokens)
        ngram = max(1, cfg.spec_ngram)
        rounds = max(1, cfg.spec_rounds)
        lookahead = rounds * (gamma + 1)
        tables = None
        if self.paged:
            active_idx = self._grow_tables(active_idx, lookahead)
            active_idx = [i for i in active_idx if not self.slots[i].prefilling]
            if not active_idx:
                return True
            tables = jnp.asarray(
                np.stack([self._table_row(i) for i in range(self.max_batch)])
            )
        B = self.max_batch
        s = self.engine.max_seq_len
        tokens = np.zeros(B, np.int32)
        positions = np.zeros(B, np.int32)
        active = np.zeros(B, bool)
        hist = np.zeros((B, s), np.int32)
        hlen = np.ones(B, np.int32)  # >=1 keeps the drafter's clips benign
        temps = np.zeros(B, np.float32)
        top_ps = np.ones(B, np.float32)
        top_ks = np.full(B, self.top_k, np.int32)
        min_ps = np.zeros(B, np.float32)
        any_sampled = False
        for i in active_idx:
            slot = self.slots[i]
            req = slot.request
            # host records already include the pending token
            # (slot.next_token == output_ids[-1])
            ids = list(req.prompt_ids) + list(req.output_ids)
            ids = ids[-s:]
            hist[i, : len(ids)] = ids
            hlen[i] = len(ids)
            tokens[i] = slot.next_token
            positions[i] = slot.pos
            active[i] = True
            sp = req.sampling
            temps[i] = sp.temperature
            top_ps[i] = sp.top_p
            top_ks[i] = self._effective_top_k(sp.top_k)
            min_ps[i] = sp.min_p
            any_sampled |= not sp.greedy
        eos_arr = jnp.asarray(
            sorted(self.engine.tokenizer.eos_ids) or [-2], jnp.int32
        )
        spec_kw = {}
        if any_sampled:
            # mixed batch: rejection-sampling acceptance per lane (greedy
            # lanes reduce to exact argmax inside spec_verify_sample)
            self._key, sub = jax.random.split(self._key)
            spec_kw = dict(
                key=sub, temps=jnp.asarray(temps), top_k=self.top_k,
                top_ps=jnp.asarray(top_ps),
                top_k_rows=jnp.asarray(top_ks),
                min_ps=jnp.asarray(min_ps),
            )
        outs, ocnt, pend, _pos, self.cache, _h, _hl, act, dr, ac = (
            spec_decode_rounds(
                self.engine.params,
                self.engine.model_cfg,
                jnp.asarray(tokens),
                jnp.asarray(positions),
                self.cache,
                jnp.asarray(hist),
                jnp.asarray(hlen),
                eos_arr,
                jnp.asarray(active),
                rounds,
                gamma,
                ngram,
                page_tables=tables,
                **spec_kw,
            )
        )
        outs_h = np.asarray(outs)
        ocnt_h = np.asarray(ocnt)
        pend_h = np.asarray(pend)
        act_h = np.asarray(act)
        self.spec_drafted += int(np.asarray(dr).sum())
        self.spec_accepted += int(np.asarray(ac).sum())
        for i in active_idx:
            slot = self.slots[i]
            cnt = int(ocnt_h[i])
            # outs[i, 0] re-states the already-emitted pending token; fresh
            # tokens are outs[1:cnt] plus the new pending tail
            fresh = [int(t) for t in outs_h[i, 1:cnt]]
            ended = not bool(act_h[i])
            if not ended:
                fresh.append(int(pend_h[i]))
            slot.pos += cnt
            slot.next_token = int(pend_h[i])
            self._emit(i, fresh)
            if self.slots[i].request is not None and ended:
                # the fused rounds hit EOS (excluded from the stream)
                self._finish(i)
        return True

    def _sweep_cancelled(self) -> None:
        for i, slot in enumerate(self.slots):
            if slot.request is not None and slot.request.cancelled:
                self._finish(i, RequestState.CANCELLED)

    def step(self) -> int:
        """One scheduler iteration: admit, advance up to
        `prefill_ticks_per_step` pending prefills by one chunk each, then one
        fused decode chunk for the decoding slots. Returns the number of
        active requests after the step."""
        self._admit()
        self._sweep_cancelled()
        prefilling = [i for i, s in enumerate(self.slots) if s.prefilling]
        for i in prefilling[: self.prefill_ticks_per_step]:
            self._prefill_tick(i)
        active_idx = [
            i
            for i, s in enumerate(self.slots)
            if s.request is not None and not s.prefilling
        ]
        n_busy = sum(1 for s in self.slots if s.request is not None)
        if not active_idx:
            return n_busy
        max_seq = self.engine.max_seq_len
        # the chunk length must fit the tightest slot's remaining cache room
        # (KV writes past max_seq would clamp-shift and corrupt the lane)
        n = min(
            self.decode_chunk,
            min(max_seq - self.slots[i].pos for i in active_idx),
        )
        # constrained slots need a fresh host-computed vocab mask before
        # EVERY sample, so the fused chunk drops to one step while any is
        # active; plain slots still advance one token per step alongside
        # them (no serialization, unlike a dedicated constrained loop)
        constrained_idx = [
            i for i in active_idx if self.slots[i].machine is not None
        ]
        if constrained_idx:
            n = 1
        if self._spec_eligible(active_idx):
            handled = self._spec_step(active_idx)
            if handled:
                return sum(1 for s in self.slots if s.request is not None)
        if self.paged:
            active_idx = self._grow_tables(active_idx, n)
            active_idx = [i for i in active_idx if not self.slots[i].prefilling]
            if not active_idx:
                return sum(1 for s in self.slots if s.request is not None)
        B = self.max_batch
        # Lane compaction (paged mode): block tables make batch lanes
        # virtual, so a mostly-idle engine runs the decode at the smallest
        # power-of-two width covering the ACTIVE slots instead of paying
        # full-B attention/cache reads for frozen lanes (the fused chunk's
        # weight streaming is width-independent; the win is the per-lane
        # attention + sampling work). Dense mode keeps physical lanes.
        if self.paged and os.environ.get("NFAI_LANE_COMPACT", "1") != "0":
            rows = list(active_idx)
            width = 1
            while width < len(rows):
                width *= 2
            width = min(width, B)
        else:
            rows = list(range(B))
            width = B
        row_of = {i: j for j, i in enumerate(rows)}
        tokens = np.zeros(width, np.int32)
        positions = np.zeros(width, np.int32)
        active = np.zeros(width, bool)
        temps = np.zeros(width, np.float32)
        top_ps = np.ones(width, np.float32)
        top_ks = np.full(width, self.top_k, np.int32)
        min_ps = np.zeros(width, np.float32)
        pres = np.zeros(width, np.float32)
        freqs = np.zeros(width, np.float32)
        bias_ids = np.zeros((width, self.bias_width), np.int32)
        bias_vals = np.zeros((width, self.bias_width), np.float32)
        any_bias = False
        any_pen = False
        for i in active_idx:
            j = row_of[i]
            s = self.slots[i]
            tokens[j] = s.next_token
            positions[j] = s.pos
            active[j] = True
            sp = s.request.sampling
            temps[j] = sp.temperature
            top_ps[j] = sp.top_p
            top_ks[j] = self._effective_top_k(sp.top_k)
            min_ps[j] = sp.min_p
            pres[j] = sp.presence_penalty
            freqs[j] = sp.frequency_penalty
            if sp.logit_bias:
                bias_ids[j], bias_vals[j] = self._bias_row(sp)
                any_bias = True
            if sp.has_penalties:
                any_pen = True
        want_lp = [
            i for i in active_idx
            if self.slots[i].request.sampling.logprobs is not None
        ]
        n_lp = None
        if want_lp:
            n_lp = self._lp_bucket(max(
                self.slots[i].request.sampling.logprobs for i in want_lp
            ))
        extras = dict(min_p=jnp.asarray(min_ps))
        if constrained_idx:
            amask = np.ones((width, self.engine.model_cfg.vocab_size), bool)
            for i in constrained_idx:
                amask[row_of[i]] = self._mask_row(
                    self.slots[i], self.slots[i].budget
                )
            extras["allowed_mask"] = jnp.asarray(amask)
        if n_lp is not None:
            extras["n_logprobs"] = n_lp
        if any_bias:
            extras.update(
                bias_ids=jnp.asarray(bias_ids),
                bias_vals=jnp.asarray(bias_vals),
            )
        if any_pen:
            if self._counts is None:
                self._counts = jnp.zeros(
                    (B, self.engine.model_cfg.vocab_size), jnp.int32
                )
            row_sel = np.asarray(rows, np.int32)
            pad = width - len(rows)
            if pad:
                row_sel = np.concatenate([row_sel, np.zeros(pad, np.int32)])
            counts_in = jnp.take(self._counts, jnp.asarray(row_sel), axis=0)
            extras.update(
                presence=jnp.asarray(pres),
                frequency=jnp.asarray(freqs),
                counts=counts_in,
            )
        self._key, sub = jax.random.split(self._key)
        if self.paged:
            tables = np.stack(
                [self._table_row(i) for i in rows]
                + [np.zeros(self.max_pages, np.int32)] * (width - len(rows))
            )
            out = paged_decode_loop(
                self.engine.params,
                self.engine.model_cfg,
                jnp.asarray(tokens),
                jnp.asarray(positions),
                self.cache,
                jnp.asarray(tables),
                sub,
                n,
                jnp.asarray(temps),
                self.top_k,
                jnp.asarray(top_ps),
                active=jnp.asarray(active),
                top_k_rows=jnp.asarray(top_ks),
                **extras,
            )
        else:
            out = decode_loop(
                self.engine.params,
                self.engine.model_cfg,
                jnp.asarray(tokens),
                jnp.asarray(positions),
                self.cache,
                sub,
                n,
                jnp.asarray(temps),
                self.top_k,
                jnp.asarray(top_ps),
                uniform_start=False,
                active=jnp.asarray(active),
                top_k_rows=jnp.asarray(top_ks),
                **extras,
            )
        toks, nxt, self.cache, _ = out[:4]
        rest = list(out[4:])
        if any_pen:
            new_counts = rest.pop(0)
            self._counts = self._counts.at[
                jnp.asarray(np.asarray(rows, np.int32))
            ].set(new_counts[: len(rows)])
        lp_arrs = [np.asarray(a) for a in rest] if n_lp is not None else None
        toks_host = np.asarray(toks)
        nxt_host = np.asarray(nxt)
        for i in active_idx:
            j = row_of[i]
            slot = self.slots[i]
            # toks[j] = [prev next_token (already emitted), t1, ..., t_{n-1}];
            # fresh tokens for the stream are t1..t_{n-1} plus the new tail
            fresh = [int(t) for t in toks_host[j][1:]] + [int(nxt_host[j])]
            lps = None
            sp = slot.request.sampling
            if lp_arrs is not None and sp.logprobs is not None:
                lp_a, tid_a, tlp_a = lp_arrs
                # step k's logprob arrays describe fresh[k] exactly
                lps = [
                    self._lp_entry(
                        lp_a[j], tid_a[j], tlp_a[j], k, sp.logprobs, fresh[k]
                    )
                    for k in range(n)
                ]
            slot.pos += n
            slot.next_token = int(nxt_host[j])
            if slot.machine is not None and not self._advance_machine(
                i, fresh
            ):
                continue  # mask bug: request failed, slot freed
            self._emit(i, fresh, lps)
            if self.slots[i].request is not None and (
                slot.machine is not None and slot.machine.complete
            ):
                self._finish(i)  # structured output complete
            elif self.slots[i].request is not None and slot.pos >= max_seq:
                self._finish(i)  # out of cache room
        return sum(1 for s in self.slots if s.request is not None)

    # -- background driving -------------------------------------------------
    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.is_set():
            n = self.step()
            if n == 0:
                time.sleep(0.002)

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


def _next_bucket(n: int, cap: int) -> int:
    for b in (16, 32, 64, 128, 256, 512, 1024, 2048):
        if n <= b and b <= cap:
            return b
    return cap
