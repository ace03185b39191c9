"""Inference engine: model loading, chunked prefill, streaming decode.

Parity target: ``NFAI.Models.Llama3/LlamaModel.cs`` —
``GetStreamingResponseAsync`` (:76-97) → `stream_chat`;
``RunAsync`` prefill+decode loop (:99-173) → `generate`;
multi-turn KV persistence via ``firstInput`` (:17,101-102) → `ChatSession`
(which prefills only the yet-uncached suffix of the rendered conversation).

TPU-first differences: the prompt is prefilled in bucketed chunks (one jitted
call per chunk — the reference fed tokens one-by-one, LlamaModel.cs:103-126);
sampling runs on device inside the step (no full-vocab readback per token,
cf. LlamaModel.cs:128-131); generation refuses to overflow the KV cache
(quirk ledger: counter overflow, MatrixMultiplyShader.cs:248-252).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, SamplingParams
from ..gguf import GGUFFile, Keys
from ..models import KVCache, prefill_step, resolve
from ..models.llama import decode_loop, decode_step
from ..ops.sampling import sample_logits
from ..tokenizer import (
    ChatTemplate,
    Message,
    StreamDetokenizer,
    TextStopper,
    tokenizer_from_gguf,
)
from ..utils.logging import get_logger

log = get_logger(__name__)

_PREFILL_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def _ngram_propose(
    history: list[int], n: int, gamma: int
) -> list[int] | None:
    """Most recent occurrence of the trailing n-gram in `history`; returns up
    to `gamma` continuation tokens (prompt-lookup decoding)."""
    ln = len(history)
    if ln < n + 1:
        return None
    key = history[-n:]
    for j in range(ln - n - 1, -1, -1):
        if history[j : j + n] == key:
            cont = history[j + n : j + n + gamma]
            return cont or None
    return None


def _bucket(n: int, cap: int) -> int:
    for b in _PREFILL_BUCKETS:
        if n <= b and b <= cap:
            return b
    return cap


@dataclass
class GenerationMetrics:
    """Request-level metrics (SURVEY.md §5 observability: TTFT, tokens/s)."""

    prompt_tokens: int = 0
    new_tokens: int = 0
    ttft_s: float = 0.0
    decode_s: float = 0.0
    spec_drafted: int = 0  # speculative: draft tokens proposed
    spec_accepted: int = 0  # speculative: draft tokens accepted
    # SamplingParams.logprobs: one dict per emitted token (appended BEFORE
    # the token is yielded) — {"id", "logprob", "top": [(id, lp), ...]}
    logprobs: list = field(default_factory=list)

    @property
    def decode_tokens_per_s(self) -> float:
        return self.new_tokens / self.decode_s if self.decode_s > 0 else 0.0


class InferenceEngine:
    """Single-model inference engine over one jitted prefill/decode pair.

    The dtype-native compute path: weights are dequantized to `dtype`
    (bf16 by default) at load; quantized-in-HBM kernels plug in via
    `nfai_tpu.ops.qmatmul` (see models/llama_quant).
    """

    def __init__(
        self,
        gguf: str | Path | GGUFFile,
        config: EngineConfig | None = None,
    ):
        self.config = config or EngineConfig()
        g = gguf if isinstance(gguf, GGUFFile) else GGUFFile.open(gguf)
        self.gguf = g
        self.family = resolve(g)
        self.model_cfg = self.family.config_from_gguf(g)
        self.model_name = str(g.metadata.get(Keys.NAME, g.architecture))
        dtype = jnp.dtype(self.config.dtype)
        t0 = time.perf_counter()
        self.mesh = None
        if self.config.mesh_shape:
            from ..parallel import (
                TP_AXIS,
                llama_param_shardings,
                make_mesh,
                validate_tp,
            )

            self.mesh = make_mesh(self.config.mesh_shape)
            tp = self.mesh.shape[TP_AXIS]
            validate_tp(self.model_cfg, tp)
            if self.config.seq_parallel:
                sp = self.mesh.shape.get("sp", 1)
                if sp <= 1:
                    raise ValueError(
                        "seq_parallel needs mesh_shape={'sp': n>1}"
                    )
                if self.config.max_seq_len % sp:
                    raise ValueError(
                        f"max_seq_len={self.config.max_seq_len} must divide "
                        f"the sp axis ({sp})"
                    )
            if self.config.expert_parallel:
                if not getattr(self.model_cfg, "n_experts", 0):
                    raise ValueError("expert_parallel needs an MoE model")
                if self.model_cfg.n_experts % tp:
                    raise ValueError(
                        f"n_experts={self.model_cfg.n_experts} must divide "
                        f"tp={tp} for expert_parallel"
                    )
            if self.config.seq_parallel or self.config.expert_parallel:
                # static fields so jit traces the SP/EP branches (the mesh
                # objects ride the models.llama module context globals)
                import dataclasses

                self.model_cfg = dataclasses.replace(
                    self.model_cfg,
                    sp_axis="sp" if self.config.seq_parallel else "",
                    ep_axis=TP_AXIS if self.config.expert_parallel else "",
                )
            quantized = "auto" if self.config.param_dtype == "auto" else False
            # fuse=True under TP builds per-shard INTERLEAVED fused
            # projections (models.llama._fuse_projections_tp): each column
            # shard is a local [q_c|k_c|v_c] / fused-MLP container for the
            # whole-scan shard_map decode path; groups that fail the
            # per-shard checks stay split (the unfused path still works)
            params_np = self.family.load_params(
                g, self.model_cfg, dtype=dtype, device_put=False, fuse=True,
                quantized=quantized, tp=tp,
            )
            shardings = llama_param_shardings(self.mesh, params_np)
            if self.config.expert_parallel:
                # expert stacks shard over their E axis instead of FFN:
                # each chip's [E/tp, ...] slice is a standalone stacked
                # container for the unchanged local grouped kernels
                from ..parallel.expert_parallel import expert_shardings

                espec = expert_shardings(self.mesh, stacked_layers=True)
                for name in ("w_gate_exps", "w_up_exps", "w_down_exps"):
                    if name in shardings["layers"]:
                        shardings["layers"][name] = jax.tree.map(
                            lambda _: espec, shardings["layers"][name]
                        )
            self.params = jax.device_put(params_np, shardings)
            # quantized matmuls run the Pallas kernels per-shard through
            # shard_map (ops.qmatmul.TP_MESH + QTensor.tp_mode); weights that
            # failed the per-shard layout check stay on the GSPMD dequant path
            from ..ops import qmatmul as _qm
            from ..models import llama as _lm

            _qm.TP_MESH = self.mesh if tp > 1 else None
            _lm.set_seq_parallel(
                self.mesh, "sp" if self.config.seq_parallel else None
            )
            _lm.set_expert_parallel(
                self.mesh, TP_AXIS if self.config.expert_parallel else None
            )
        else:
            # single-device engine: clear any mesh a previous sharded
            # engine left in the module global, or quantized matmuls would
            # try to shard_map weights that are not tp-marked
            from ..models import llama as _lm
            from ..ops import qmatmul as _qm

            _qm.TP_MESH = None
            _lm.set_seq_parallel(None, None)
            _lm.set_expert_parallel(None, None)
            # param_dtype="auto" keeps supported GGUF quantizations in HBM
            # (fused dequant-matmul kernels); anything else dequantizes
            quantized = "auto" if self.config.param_dtype == "auto" else False
            self.params = self.family.load_params(
                g, self.model_cfg, dtype=dtype, quantized=quantized
            )
        log.info(
            "loaded %s (%d layers, %d-dim) in %.2fs",
            self.model_name,
            self.model_cfg.n_layers,
            self.model_cfg.hidden_size,
            time.perf_counter() - t0,
        )
        self.tokenizer = tokenizer_from_gguf(g.metadata)
        bos = (
            self.tokenizer.id_to_token.get(self.tokenizer.bos_id, "")
            if self.tokenizer.bos_id is not None
            else ""
        )
        eos = (
            self.tokenizer.id_to_token.get(self.tokenizer.eos_id, "")
            if self.tokenizer.eos_id is not None
            else ""
        )
        self.chat_template = ChatTemplate(
            g.metadata.get(Keys.TOKENIZER_CHAT_TEMPLATE), bos_token=bos, eos_token=eos
        )
        self.cache_dtype = dtype
        self.max_seq_len = min(self.config.max_seq_len, self.model_cfg.context_length)

    # -- low level ---------------------------------------------------------
    def new_cache(self, batch: int = 1) -> KVCache:
        cache = KVCache.zeros(
            self.model_cfg, batch, self.max_seq_len, self.cache_dtype,
            quantized=self.config.kv_dtype == "int8",
        )
        if self.mesh is not None:
            from ..parallel import kv_cache_sharding
            from ..parallel.sharding import kv_cache_sharding_sp

            if self.config.seq_parallel:
                from jax.sharding import NamedSharding, PartitionSpec as P

                kv = kv_cache_sharding_sp(self.mesh)
                # int8 scales are [L, B, Hkv, S] time-minor: S is axis 3
                sc = NamedSharding(self.mesh, P(None, None, None, "sp"))
                cache = type(cache)(
                    jax.device_put(cache.k, kv),
                    jax.device_put(cache.v, kv),
                    None if cache.ks is None else jax.device_put(cache.ks, sc),
                    None if cache.vs is None else jax.device_put(cache.vs, sc),
                )
            else:
                cache = jax.device_put(
                    cache, kv_cache_sharding(self.mesh, batch)
                )
        return cache

    def prefill(
        self, cache: KVCache, token_ids: Sequence[int], start_pos: int = 0
    ) -> tuple[jax.Array, KVCache]:
        """Prefill tokens (batch 1) in bucketed chunks; returns (last logits, cache)."""
        ids = np.asarray(token_ids, np.int32)
        if start_pos + ids.size > self.max_seq_len:
            raise ValueError(
                f"prompt of {ids.size} tokens at position {start_pos} exceeds "
                f"max_seq_len={self.max_seq_len}"
            )
        logits = None
        pos = start_pos
        chunk_cap = self.config.prefill_chunk
        while pos < start_pos + ids.size:
            take = min(chunk_cap, start_pos + ids.size - pos)
            # the padded bucket must not overrun the cache: dynamic_update_slice
            # clamps out-of-bounds starts, which would shift-overwrite earlier
            # slots. take <= max_seq_len - pos, so the min stays >= take.
            bucket = min(_bucket(take, chunk_cap), self.max_seq_len - pos)
            chunk = np.zeros(bucket, np.int32)
            chunk[:take] = ids[pos - start_pos : pos - start_pos + take]
            positions = np.arange(pos, pos + bucket, dtype=np.int32)
            # attention only needs slots < pos+bucket; round to a bucket so
            # compile variants stay bounded
            attend = min(_bucket(pos + bucket, self.max_seq_len), self.max_seq_len)
            logits, cache = prefill_step(
                self.params,
                self.model_cfg,
                jnp.asarray(chunk[None, :]),
                jnp.asarray(positions[None, :]),
                jnp.asarray([take - 1], jnp.int32),
                cache,
                attend,
            )
            pos += take
        return logits, cache

    # -- generation --------------------------------------------------------
    def generate(
        self,
        prompt_ids: Sequence[int],
        sampling: SamplingParams | None = None,
        cache: KVCache | None = None,
        start_pos: int = 0,
        metrics: GenerationMetrics | None = None,
    ) -> Iterator[int]:
        """Stream generated token ids until EOS / max tokens / cache full."""
        sampling = sampling or SamplingParams()
        metrics = metrics if metrics is not None else GenerationMetrics()
        if cache is None:
            cache = self.new_cache(1)
        key = jax.random.PRNGKey(
            sampling.seed if sampling.seed is not None else np.random.randint(2**31)
        )
        # optional sampling extensions (logit bias / penalties / min-p)
        bias_ids = bias_vals = None
        if sampling.logit_bias:
            pairs = tuple(sampling.logit_bias)
            bias_ids = jnp.asarray([[int(i) for i, _ in pairs]], jnp.int32)
            bias_vals = jnp.asarray([[float(v) for _, v in pairs]], jnp.float32)
        counts = (
            jnp.zeros((1, self.model_cfg.vocab_size), jnp.int32)
            if sampling.has_penalties
            else None
        )
        t0 = time.perf_counter()
        logits, cache = self.prefill(cache, prompt_ids, start_pos)
        pos = start_pos + len(prompt_ids)
        if sampling.constrained:
            metrics.prompt_tokens = len(prompt_ids)
            yield from self._generate_constrained(
                logits, pos, cache, sampling, metrics, key, t0
            )
            return
        key, sub = jax.random.split(key)
        if bias_ids is not None:
            from ..ops.sampling import apply_logit_bias

            logits = apply_logit_bias(logits, bias_ids, bias_vals)
        token = sample_logits(
            logits, sub, sampling.temperature, sampling.top_k, sampling.top_p,
            min_p=sampling.min_p,
        ).astype(jnp.int32)
        if counts is not None:
            counts = counts.at[0, token[0]].add(1)
        metrics.prompt_tokens = len(prompt_ids)
        metrics.ttft_s = time.perf_counter() - t0
        self._last_cache, self._last_pos = cache, pos

        want_lp = sampling.logprobs
        if want_lp is not None:
            from ..ops.sampling import token_logprobs

            lp_k = max(0, min(int(want_lp), 20))
            carry_lp = self._lp_entry(
                token_logprobs(logits, token, lp_k), 0, lp_k, int(token[0])
            )
        if (
            self.config.speculative in ("ngram", "draft")
            # both drafters speculate for sampled requests too
            # (rejection-sampling acceptance against the point-mass draft;
            # output law identical to plain sampling)
            and bias_ids is None
            and counts is None
            and want_lp is None
        ):
            if self.config.speculative == "draft":
                yield from self._generate_draft(
                    token, pos, cache, list(int(t) for t in prompt_ids),
                    sampling, metrics, key,
                )
            else:
                yield from self._generate_ngram(
                    token, pos, cache, list(int(t) for t in prompt_ids),
                    sampling, metrics, key,
                )
            return

        # Fused decode: chunks of up to `decode_chunk` tokens run entirely on
        # device (the reference synced per op). Chunk sizes are powers of two
        # to bound compiled variants. Dispatch runs one chunk AHEAD of the
        # host-side EOS check: the jit-call latency of chunk N+1 overlaps
        # chunk N's readback (if EOS lands mid-chunk the speculative chunk's
        # work is discarded — its cache writes sit past the conversation end
        # and are overwritten by the next prefill).
        t_dec = time.perf_counter()
        emitted = 0
        done = False
        pending: list[tuple] = []  # (toks_device, n, start_pos)
        spec_budget = sampling.max_new_tokens  # tokens dispatched so far

        def dispatch():
            nonlocal token, cache, key, pos, spec_budget, counts
            budget = min(spec_budget, self.max_seq_len - pos)
            if budget <= 0:
                return False
            n = min(self.config.decode_chunk, budget)
            n = 1 << (n.bit_length() - 1)
            out = decode_loop(
                self.params,
                self.model_cfg,
                token,
                jnp.asarray([pos], jnp.int32),
                cache,
                key,
                n,
                sampling.temperature,
                sampling.top_k,
                sampling.top_p,
                min_p=sampling.min_p,
                bias_ids=bias_ids,
                bias_vals=bias_vals,
                presence=sampling.presence_penalty,
                frequency=sampling.frequency_penalty,
                counts=counts,
                n_logprobs=lp_k if want_lp is not None else None,
            )
            toks, token, cache, key = out[:4]
            rest = list(out[4:])
            if counts is not None:
                counts = rest.pop(0)
            lp_arrs = rest if want_lp is not None else None
            # `token` is now the pending token AFTER this chunk — recorded
            # so the logprob carry can name it even though the next chunk
            # was already dispatched by the time this one is read back
            pending.append((toks, n, pos, lp_arrs, token))
            pos += n
            spec_budget -= n
            return True

        dispatch()
        while pending and not done:
            dispatch()  # overlap the next chunk with this chunk's readback
            toks, n, p0, lp_arrs, chunk_next = pending.pop(0)
            toks_host = np.asarray(toks[0])  # sync
            if lp_arrs is not None:
                lp_host = [np.asarray(a[0]) for a in lp_arrs]  # [n], [n,k]x2
            for j, t in enumerate(toks_host):
                t = int(t)
                if (
                    self.tokenizer.is_eos(t)
                    or emitted >= sampling.max_new_tokens
                ):
                    done = True
                    self._last_pos = p0 + j
                    break
                if want_lp is not None:
                    # toks[0]'s logprob was computed by the previous chunk
                    # (or at prefill); step j's arrays describe toks[j+1]
                    metrics.logprobs.append(carry_lp)
                    carry_lp = self._lp_entry(
                        lp_host, j, lp_k,
                        int(toks_host[j + 1]) if j + 1 < n
                        else int(chunk_next[0]),
                    )
                yield t
                emitted += 1
            else:
                self._last_pos = p0 + n
            self._last_cache = cache
        if not done:
            # budget exhausted mid-stream: the final sampled token needs no
            # KV slot
            tok_id = int(token[0])
            if emitted < sampling.max_new_tokens and not self.tokenizer.is_eos(
                tok_id
            ):
                if want_lp is not None:
                    metrics.logprobs.append(carry_lp)
                yield tok_id
                emitted += 1
        metrics.new_tokens = emitted
        metrics.decode_s = time.perf_counter() - t_dec

    @staticmethod
    def _lp_entry(arrs, row, want_k, token) -> dict:
        """One GenerationMetrics.logprobs dict from (lp, top_ids, top_lps)
        arrays indexed at `row` (prefill: [1]-shaped; chunks: [n]-shaped)."""
        lp, tid, tlp = arrs
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

    def _generate_ngram(
        self, token, pos, cache, history, sampling, metrics, key=None
    ) -> Iterator[int]:
        """Prompt-lookup speculative decoding, fully fused:
        models.llama.spec_decode_rounds runs `spec_rounds` rounds of
        (on-device n-gram draft → ONE verify forward → accept) per
        dispatch, so the per-dispatch latency (~26 ms on a tunneled chip)
        is paid once per `spec_rounds` verifies instead of per verify.
        Greedy requests match plain greedy EXACTLY (argmax-prefix accept);
        sampled requests use rejection-sampling acceptance whose output
        law equals plain sampling (ops.sampling.spec_verify_sample). On
        sustained rejection it interleaves plain fused chunks (more tokens
        per dispatch when drafts never hit), and the cache tail takes the
        plain path. No draft model needed."""
        from ..models.llama import spec_decode_rounds

        gamma = max(1, self.config.spec_tokens)
        n = max(1, self.config.spec_ngram)
        rounds = max(1, self.config.spec_rounds)
        if key is None:
            key = jax.random.PRNGKey(0)
        spec_kw = {}
        if not sampling.greedy:
            spec_kw = dict(
                temps=jnp.asarray([sampling.temperature], jnp.float32),
                top_k=max(1, sampling.top_k),
                top_ps=jnp.asarray([sampling.top_p], jnp.float32),
                min_ps=jnp.asarray([sampling.min_p], jnp.float32),
            )
        t_dec = time.perf_counter()
        emitted = 0
        tok_id = int(token[0])
        s = self.max_seq_len
        eos_arr = jnp.asarray(
            sorted(self.tokenizer.eos_ids) or [-2], jnp.int32
        )
        hist = jnp.zeros((1, s), jnp.int32)
        hist = hist.at[0, : len(history)].set(
            jnp.asarray(history, jnp.int32)
        )
        hist = hist.at[0, len(history)].set(tok_id)
        hlen_host = len(history) + 1
        hlen = jnp.asarray([hlen_host], jnp.int32)
        force_plain = False

        def emit_ok():
            return (
                emitted < sampling.max_new_tokens
                and not self.tokenizer.is_eos(tok_id)
            )

        while emit_ok():
            room = s - pos
            if room < gamma + 1 or force_plain:
                if room <= 0:
                    # final token needs no KV slot (mirrors generate's tail)
                    yield tok_id
                    emitted += 1
                    history.append(tok_id)
                    break
                # rejection streak / tail: one plain fused greedy chunk
                force_plain = False
                m = min(self.config.decode_chunk, room,
                        sampling.max_new_tokens - emitted)
                m = 1 << (max(m, 1).bit_length() - 1)
                key, sub = jax.random.split(key)
                toks, token, cache, _ = decode_loop(
                    self.params, self.model_cfg,
                    jnp.asarray([tok_id], jnp.int32),
                    jnp.asarray([pos], jnp.int32),
                    cache, sub, m, sampling.temperature,
                    max(1, sampling.top_k), sampling.top_p,
                    min_p=sampling.min_p,
                )
                outs = [int(t) for t in np.asarray(toks[0])]
                nxt_id = int(token[0])
                stop = False
                for j, t in enumerate(outs):
                    tok_id = t
                    if not emit_ok():
                        stop = True
                        self._last_pos = pos + j
                        break
                    yield t
                    emitted += 1
                    history.append(t)
                self._last_cache = cache
                if stop:
                    break
                pos += m
                self._last_pos = pos
                tok_id = nxt_id
                # keep the device-side history in sync for the next drafts
                entries = outs[1:] + [nxt_id]
                hist = hist.at[
                    0, hlen_host : hlen_host + len(entries)
                ].set(jnp.asarray(entries, jnp.int32))
                hlen_host += len(entries)
                hlen = jnp.asarray([hlen_host], jnp.int32)
                continue
            if spec_kw:
                key, sub = jax.random.split(key)
                spec_kw["key"] = sub
            outs_d, ocnt, pend, _pos_d, cache, hist, hlen, act, dr, ac = (
                spec_decode_rounds(
                    self.params, self.model_cfg,
                    jnp.asarray([tok_id], jnp.int32),
                    jnp.asarray([pos], jnp.int32),
                    cache, hist, hlen, eos_arr,
                    jnp.ones((1,), jnp.bool_), rounds, gamma, n,
                    **spec_kw,
                )
            )
            cnt = int(ocnt[0])
            toks_h = [int(x) for x in np.asarray(outs_d[0, :cnt])]
            metrics.spec_drafted += int(dr[0])
            metrics.spec_accepted += int(ac[0])
            stop = False
            for j, t in enumerate(toks_h):
                tok_id = t
                if not emit_ok():
                    stop = True
                    self._last_pos = pos + j
                    break
                yield t
                emitted += 1
                history.append(t)
            self._last_cache = cache
            if stop:
                break
            pos += cnt
            self._last_pos = pos
            hlen_host += cnt
            tok_id = int(pend[0])
            if not bool(act[0]):
                if s - pos >= gamma + 1:
                    break  # EOS reached inside the fused rounds
                continue  # ran out of room mid-call: tail path handles it
            # pure-miss call (1 token/round): plain chunks yield far more
            # tokens per dispatch — interleave one before retrying drafts
            force_plain = int(ac[0]) == 0
        else:
            # loop ended because the pending token is EOS / budget reached
            self._last_cache = cache
        metrics.new_tokens = emitted
        metrics.decode_s = time.perf_counter() - t_dec

    @property
    def draft_engine(self) -> "InferenceEngine":
        """Lazy second engine for speculative='draft' (EngineConfig.
        draft_gguf). Must share the target's vocabulary."""
        if getattr(self, "_draft_engine", None) is None:
            from dataclasses import replace

            if not self.config.draft_gguf:
                raise ValueError(
                    "speculative='draft' requires EngineConfig.draft_gguf"
                )
            self._draft_engine = InferenceEngine(
                self.config.draft_gguf,
                replace(
                    self.config, gguf_path=self.config.draft_gguf,
                    speculative="off", draft_gguf="",
                ),
            )
            if (self._draft_engine.model_cfg.vocab_size
                    != self.model_cfg.vocab_size):
                raise ValueError(
                    "draft model vocabulary differs from the target's"
                )
        return self._draft_engine

    def _generate_draft(
        self, token, pos, cache, history, sampling, metrics, key=None
    ) -> Iterator[int]:
        """Draft-model speculative decoding (greedy), fully fused: the
        draft GGUF prefills the same prompt into its own cache, then
        models.llama.draft_spec_rounds runs `spec_rounds` rounds of
        (gamma+1 draft steps → one target verify → longest-prefix accept)
        per dispatch. Output matches the target's plain greedy EXACTLY —
        the draft only sets the acceptance rate (classic speculative
        decoding, Leviathan et al.; llama.cpp's --model-draft analog)."""
        from ..models.llama import draft_spec_rounds

        gamma = max(1, self.config.spec_tokens)
        rounds = max(1, self.config.spec_rounds)
        de = self.draft_engine
        if key is None:
            key = jax.random.PRNGKey(0)
        spec_kw = {}
        if not sampling.greedy:
            # rejection-sampling acceptance vs the greedy point-mass draft:
            # output law equals plain sampling (spec_verify_sample)
            spec_kw = dict(
                temps=jnp.asarray([sampling.temperature], jnp.float32),
                top_k=max(1, sampling.top_k),
                top_ps=jnp.asarray([sampling.top_p], jnp.float32),
                min_ps=jnp.asarray([sampling.min_p], jnp.float32),
            )
        t_dec = time.perf_counter()
        emitted = 0
        tok_id = int(token[0])
        s = min(self.max_seq_len, de.max_seq_len)
        eos_arr = jnp.asarray(
            sorted(self.tokenizer.eos_ids) or [-2], jnp.int32
        )
        dcache = de.new_cache(1)
        _, dcache = de.prefill(dcache, history)

        def emit_ok():
            return (
                emitted < sampling.max_new_tokens
                and not self.tokenizer.is_eos(tok_id)
            )

        while emit_ok():
            room = s - pos
            if room < gamma + 1:
                if room <= 0:
                    yield tok_id
                    emitted += 1
                    break
                # cache tail: plain fused greedy chunks on the target
                m = min(self.config.decode_chunk, room,
                        sampling.max_new_tokens - emitted)
                m = 1 << (max(m, 1).bit_length() - 1)
                key, sub = jax.random.split(key)
                toks, token, cache, _ = decode_loop(
                    self.params, self.model_cfg,
                    jnp.asarray([tok_id], jnp.int32),
                    jnp.asarray([pos], jnp.int32),
                    cache, sub, m, sampling.temperature,
                    max(1, sampling.top_k), sampling.top_p,
                    min_p=sampling.min_p,
                )
                outs = [int(t) for t in np.asarray(toks[0])]
                nxt_id = int(token[0])
                stop = False
                for j, t in enumerate(outs):
                    tok_id = t
                    if not emit_ok():
                        stop = True
                        self._last_pos = pos + j
                        break
                    yield t
                    emitted += 1
                self._last_cache = cache
                if stop:
                    break
                pos += m
                self._last_pos = pos
                tok_id = nxt_id
                continue
            if spec_kw:
                key, sub = jax.random.split(key)
                spec_kw["key"] = sub
            outs_d, ocnt, pend, _p, cache, dcache, act, dr, ac = (
                draft_spec_rounds(
                    self.params, self.model_cfg,
                    de.params, de.model_cfg,
                    jnp.asarray([tok_id], jnp.int32),
                    jnp.asarray([pos], jnp.int32),
                    cache, dcache, eos_arr,
                    jnp.ones((1,), jnp.bool_), rounds, gamma, **spec_kw,
                )
            )
            cnt = int(ocnt[0])
            toks_h = [int(x) for x in np.asarray(outs_d[0, :cnt])]
            metrics.spec_drafted += int(dr[0])
            metrics.spec_accepted += int(ac[0])
            stop = False
            for j, t in enumerate(toks_h):
                tok_id = t
                if not emit_ok():
                    stop = True
                    self._last_pos = pos + j
                    break
                yield t
                emitted += 1
            self._last_cache = cache
            if stop:
                break
            pos += cnt
            self._last_pos = pos
            tok_id = int(pend[0])
            if not bool(act[0]) and s - pos >= gamma + 1:
                break  # EOS reached inside the fused rounds
        else:
            self._last_cache = cache
        metrics.new_tokens = emitted
        metrics.decode_s = time.perf_counter() - t_dec

    @property
    def json_constraint(self):
        """Lazy vocab-wide TokenConstraint (built once per engine)."""
        if getattr(self, "_json_constraint", None) is None:
            from ..constrained import constraint_for

            self._json_constraint = constraint_for(self.tokenizer, "json")
        return self._json_constraint

    def _generate_constrained(
        self, logits, pos, cache, sampling, metrics, key, t0
    ) -> Iterator[int]:
        """Grammar-constrained decoding (response_format="json" /
        "json_schema", SamplingParams.grammar GBNF, or .regex): before
        every sample the host automaton produces a bool[V] mask of
        legal continuations; illegal tokens go to -inf and sampling stays
        on device. Runs token-by-token (decode_step) — the mask depends on
        each accepted token — so it pays per-dispatch latency instead of
        using the fused chunks. Near the token budget it switches to
        "closing" masks so the output terminates as a *complete* match
        instead of truncating mid-structure (closing_allowed)."""
        from ..constrained import JsonMachine
        from ..grammar import machine_for

        cons = self.json_constraint
        machine = machine_for(sampling)
        if machine is None:
            machine = JsonMachine(require_object=True)
        vocab = self.model_cfg.vocab_size
        emitted = 0
        first = True
        t_dec = time.perf_counter()
        while emitted < sampling.max_new_tokens:
            budget = sampling.max_new_tokens - emitted
            # each token is >= 1 byte, so bytes-to-close bounds tokens-to-
            # close; +4 margin keeps a little slack for multi-byte choices
            closing = len(machine.closing_string()) + 4 >= budget
            mask = (
                cons.closing_allowed(machine) if closing
                else cons.allowed(machine)
            )
            m = np.zeros(vocab, bool)
            m[: mask.shape[0]] = mask
            key, sub = jax.random.split(key)
            masked = jnp.where(jnp.asarray(m)[None, :], logits, -jnp.inf)
            token = int(
                sample_logits(
                    masked, sub, sampling.temperature, sampling.top_k,
                    sampling.top_p, min_p=sampling.min_p,
                )[0]
            )
            if first:
                metrics.ttft_s = time.perf_counter() - t0
                first = False
            if self.tokenizer.is_eos(token):
                break
            ok = machine.advance_bytes(cons.token_bytes[token])
            assert ok, "constrained sampler emitted an illegal token"
            if sampling.logprobs is not None:
                from ..ops.sampling import token_logprobs

                k = max(0, min(int(sampling.logprobs), 20))
                # logprobs over the CONSTRAINED (masked, renormalized)
                # distribution — what the sampler actually drew from
                metrics.logprobs.append(self._lp_entry(
                    token_logprobs(
                        masked, jnp.asarray([token], jnp.int32), k
                    ),
                    0, k, token,
                ))
            yield token
            emitted += 1
            if machine.complete or pos >= self.max_seq_len:
                break
            logits, cache = decode_step(
                self.params, self.model_cfg,
                jnp.asarray([token], jnp.int32),
                jnp.asarray([pos], jnp.int32), cache,
            )
            pos += 1
            self._last_cache, self._last_pos = cache, pos
        metrics.new_tokens = emitted
        metrics.decode_s = time.perf_counter() - t_dec

    def generate_text(
        self, prompt: str, sampling: SamplingParams | None = None
    ) -> str:
        ids = self.tokenizer.encode(prompt)
        detok = StreamDetokenizer(self.tokenizer)
        out = [detok.push(t) for t in self.generate(ids, sampling)]
        return "".join(out) + detok.flush()


@dataclass
class ChatSession:
    """Multi-turn chat with KV-cache reuse across turns.

    The rendered conversation is re-tokenized each turn and only the suffix
    beyond the cached prefix is prefilled (generalizing the reference's
    ``firstInput`` flag, LlamaModel.cs:101-102 — which also ignored every
    message but the first user one, LlamaModel.cs:79; here full history and
    system prompts are honored).
    """

    engine: InferenceEngine
    sampling: SamplingParams = field(default_factory=SamplingParams)
    messages: list[Message] = field(default_factory=list)
    _cache: Any = None
    _cached_ids: list[int] = field(default_factory=list)

    def __post_init__(self):
        if not self.messages and self.engine.config.system_prompt:
            self.messages.append(Message("system", self.engine.config.system_prompt))

    def stream(self, user_text: str) -> Iterator[str]:
        """Send a user message; yields assistant text pieces."""
        self.messages.append(Message("user", user_text))
        prompt = self.engine.chat_template.render(
            self.messages, add_generation_prompt=True
        )
        ids = self.engine.tokenizer.encode(prompt, add_bos=False)
        # longest common prefix with what's already in the cache
        common = 0
        for a, b in zip(self._cached_ids, ids):
            if a != b:
                break
            common += 1
        if common == len(ids):  # always leave at least one token to prefill
            common = max(0, len(ids) - 1)
        if self._cache is None or common == 0:
            self._cache = self.engine.new_cache(1)
            common = 0
        new_ids = ids[common:]

        detok = StreamDetokenizer(self.engine.tokenizer)
        stopper = TextStopper(self.sampling.stop)
        reply_ids: list[int] = []
        metrics = GenerationMetrics()
        for tok in self.engine.generate(
            new_ids, self.sampling, cache=self._cache, start_pos=common,
            metrics=metrics,
        ):
            reply_ids.append(tok)
            piece = detok.push(tok)
            if piece:
                emit, done = stopper.feed(piece)
                if emit:
                    yield emit
                if done:
                    break
        else:
            tail = detok.flush()
            if tail:
                emit, _ = stopper.feed(tail)
                if emit:
                    yield emit
            final = stopper.flush()
            if final:
                yield final
        self.last_metrics = metrics
        # the cache holds KV for exactly _last_pos tokens (the final sampled
        # token may never have run through decode_step)
        self._cache = self.engine._last_cache
        self._cached_ids = (ids + reply_ids)[: self.engine._last_pos]
        reply_text = self.engine.tokenizer.decode(reply_ids, skip_special=True)
        self.messages.append(Message("assistant", reply_text))

    def send(self, user_text: str) -> str:
        return "".join(self.stream(user_text))

    # -- session persistence (SURVEY.md §5 checkpoint/resume: serializable
    # KV/session state for request migration; the reference's session state
    # was implicit in GPU buffers + a firstInput flag) -------------------
    def save(self, path) -> None:
        """Serialize conversation + KV cache so the session can resume in a
        different process (or after a crash) without re-prefilling."""
        import json

        meta = {
            "messages": [m.asdict() for m in self.messages],
            "cached_ids": list(self._cached_ids),
            "model": self.engine.model_name,
            "max_seq_len": self.engine.max_seq_len,
        }
        arrays = {}
        if self._cache is not None:
            arrays["cache_k"] = np.asarray(self._cache.k)
            arrays["cache_v"] = np.asarray(self._cache.v)
            if self._cache.ks is not None:  # int8 cache scales
                arrays["cache_ks"] = np.asarray(self._cache.ks)
                arrays["cache_vs"] = np.asarray(self._cache.vs)
        np.savez_compressed(path, meta=json.dumps(meta), **arrays)

    @classmethod
    def load(
        cls,
        engine: InferenceEngine,
        path,
        sampling: SamplingParams | None = None,
    ) -> "ChatSession":
        import json

        from ..models import KVCache

        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["meta"]))
            if meta["model"] != engine.model_name:
                raise ValueError(
                    f"session was saved for model {meta['model']!r}, "
                    f"engine runs {engine.model_name!r}"
                )
            if meta["max_seq_len"] != engine.max_seq_len:
                raise ValueError(
                    f"session cache length {meta['max_seq_len']} != engine "
                    f"max_seq_len {engine.max_seq_len}"
                )
            session = cls(engine, sampling or SamplingParams(), messages=[])
            session.messages = [Message(**m) for m in meta["messages"]]
            session._cached_ids = [int(t) for t in meta["cached_ids"]]
            if "cache_k" in z:
                if z["cache_k"].ndim != 4:
                    # pre-merged-lane sessions stored [L, Hkv, B, S, D]
                    raise ValueError(
                        "session cache uses the old per-head KV layout; "
                        "re-create the session (cache layout is now "
                        "[L, B, S, Hkv*D])"
                    )
                session._cache = KVCache(
                    jnp.asarray(z["cache_k"]),
                    jnp.asarray(z["cache_v"]),
                    jnp.asarray(z["cache_ks"]) if "cache_ks" in z else None,
                    jnp.asarray(z["cache_vs"]) if "cache_vs" in z else None,
                )
        return session
