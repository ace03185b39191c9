"""On-device token sampling.

Parity target: ``NFAI.Models.Llama3/SamplingUtils.cs:5-33`` — CPU pipeline
temperature → softmax → top-k → top-p → renormalize → multinomial. Here the
whole pipeline runs inside the jitted step on device (the reference reads the
full vocab logits back to the host every token, ``LlamaModel.cs:128-131``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def filtered_for_sampling(
    logits: jax.Array,  # [B, V] float32
    temperature: float | jax.Array,
    top_k: int,
    top_p: float | jax.Array,
    top_k_rows: jax.Array | None = None,
    min_p: float | jax.Array = 0.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The sample_logits pipeline up to (but not including) the categorical
    draw: temperature → top-k window → per-row top-k → top-p → min-p.

    Returns (filtered [B, K] tempered logits with dropped entries at
    NEG_INF, top_idx [B, K] their vocab ids, greedy [B] bool rows).
    ``categorical(filtered)`` indexed through ``top_idx`` reproduces
    sample_logits exactly for non-greedy rows. Exposed separately so
    speculative decoding can compute the EXACT per-token acceptance
    probability p(draft) and the post-rejection residual distribution of
    the same pipeline (models.llama spec_decode_rounds)."""

    def per_row(v):  # scalar or [B] -> [B, 1]
        v = jnp.asarray(v, jnp.float32)
        return jnp.broadcast_to(v, (logits.shape[0],))[:, None]

    temperature = per_row(temperature)
    top_p = per_row(top_p)
    greedy = temperature[:, 0] <= 0.0
    t = jnp.maximum(temperature, 1e-6)
    scaled = logits / t

    if top_k > 0 and top_k < logits.shape[-1]:
        # exact lax.top_k over a 128k vocab costs ~9 ms/step on TPU (full
        # sort); the TPU-native approx_max_k runs in tens of µs. With
        # recall_target=0.99 a tail token of the top-40 may occasionally be
        # replaced by a near-tie — far below the sampling noise floor.
        top_vals, top_idx = jax.lax.approx_max_k(scaled, top_k, recall_target=0.99)
        order = jnp.argsort(-top_vals, axis=-1)  # approx_max_k is unsorted
        top_vals = jnp.take_along_axis(top_vals, order, axis=-1)
        top_idx = jnp.take_along_axis(top_idx, order, axis=-1)
    else:
        top_vals = jnp.sort(scaled, axis=-1)[..., ::-1]
        top_idx = jnp.argsort(scaled, axis=-1)[..., ::-1]

    if top_k_rows is not None:
        # per-row top-k: drop ranks beyond the row's own k (rank 0 always kept)
        ranks = jnp.arange(top_vals.shape[-1])[None, :]
        kk = jnp.maximum(jnp.asarray(top_k_rows, jnp.int32), 1)[:, None]
        top_vals = jnp.where(ranks < kk, top_vals, NEG_INF)

    # top-p over the sorted distribution: keep the smallest prefix whose
    # cumulative probability exceeds p (always at least one token)
    probs = jax.nn.softmax(top_vals, axis=-1)
    cumulative = jnp.cumsum(probs, axis=-1)
    keep = (cumulative - probs) < top_p
    # min-p floor relative to the max prob (rank 0 is always kept)
    keep &= probs >= per_row(min_p) * probs[:, :1]
    return jnp.where(keep, top_vals, NEG_INF), top_idx, greedy


def sample_logits(
    logits: jax.Array,  # [B, V] float
    key: jax.Array,
    temperature: float | jax.Array = 0.5,
    top_k: int = 40,
    top_p: float | jax.Array = 0.95,
    top_k_rows: jax.Array | None = None,  # [B] int32 per-row top-k (traced)
    min_p: float | jax.Array = 0.0,  # per-row-able: drop tokens with
    # prob < min_p * max_prob (llama.cpp/vLLM-style nucleus floor)
) -> jax.Array:
    """Sample next token ids [B] with temperature / top-k / top-p / min-p
    filtering.

    `top_k` must be static (it bounds the sort width); temperature, top_p and
    min_p may be traced, either scalars or per-row [B] arrays (continuous
    batching mixes requests with different sampling settings). `top_k_rows`
    applies a per-row top-k *within* the static `top_k` window by masking
    ranks >= top_k_rows[i] — exact for per-row values <= the window width.
    temperature <= 0 is greedy argmax (per row).
    """
    logits = logits.astype(jnp.float32)
    static_temp = isinstance(temperature, (int, float))
    if static_temp and temperature <= 0.0:
        # static greedy: skip the whole sampling graph
        return jnp.argmax(logits, axis=-1)

    filtered, top_idx, greedy = filtered_for_sampling(
        logits, temperature, top_k, top_p, top_k_rows, min_p
    )
    choice = jax.random.categorical(key, filtered, axis=-1)  # [B]
    sampled = jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0]
    if static_temp:
        # temperature is statically > 0: no greedy rows; skip the
        # full-vocab argmax the mixed path would compute every step
        return sampled
    # mixed batches (continuous batching): greedy rows need the exact argmax
    return jnp.where(greedy, jnp.argmax(logits, axis=-1), sampled)


def greedy_sample(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits.astype(jnp.float32), axis=-1)


def spec_verify_sample(
    logits3: jax.Array,  # [B, T, V] target logits at [tok, draft...] (T=g+1)
    draft: jax.Array,  # [B, gamma] point-mass drafted token ids
    key: jax.Array,
    temperature: jax.Array,  # [B]
    top_k: int,
    top_p: jax.Array,  # [B]
    top_k_rows: jax.Array | None = None,  # [B]
    min_p: jax.Array | float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Rejection-sampling acceptance for a POINT-MASS drafter (prompt-lookup
    n-grams / greedy draft-model rollouts): draft token d_j is accepted with
    probability p_j(d_j) — its probability under the full sampling pipeline
    (temperature/top-k/top-p/min-p) — and on rejection the continuation is
    resampled from the residual distribution, which for a point-mass q is
    exactly p with d_j removed and renormalized. Token-by-token, the output
    law equals plain autoregressive sampling (the speculative-sampling
    theorem with q = δ_d); greedy rows (temperature <= 0) reduce to the
    argmax-prefix-match rule bit-exactly.

    Returns (n_acc [B] in 0..gamma, new_tok [B]): n_acc accepted drafts,
    and the continuation token — a residual resample at the reject
    position, or a fresh pipeline sample after full acceptance."""
    b, t, v = logits3.shape
    gamma = t - 1
    lf = logits3.astype(jnp.float32).reshape(b * t, v)

    def bt(a):  # [B] -> [B*T] (repeat per verify column)
        a = jnp.broadcast_to(jnp.asarray(a, jnp.float32), (b,))
        return jnp.broadcast_to(a[:, None], (b, t)).reshape(-1)

    tkr = None
    if top_k_rows is not None:
        tkr = jnp.broadcast_to(
            jnp.asarray(top_k_rows, jnp.int32)[:, None], (b, t)
        ).reshape(-1)
    filtered, top_idx, _ = filtered_for_sampling(
        lf, bt(temperature), top_k, bt(top_p), tkr, bt(min_p)
    )
    k = filtered.shape[-1]
    probs3 = jax.nn.softmax(filtered, axis=-1).reshape(b, t, k)
    idx3 = top_idx.reshape(b, t, k)
    f3 = filtered.reshape(b, t, k)
    greedy = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (b,)
    )[:, None] <= 0.0  # [B, 1]
    argmax3 = jnp.argmax(lf, axis=-1).reshape(b, t).astype(jnp.int32)

    # p(d_j) under the filtered distribution (0 when filtered out)
    match = idx3[:, :gamma] == draft[:, :, None]
    p_d = jnp.sum(jnp.where(match, probs3[:, :gamma], 0.0), axis=-1)
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (b, gamma))
    acc = jnp.where(greedy, draft == argmax3[:, :gamma], u < p_d)
    n_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)

    # continuation per column: columns < gamma exclude their draft token
    # (residual); column gamma is a plain pipeline sample
    excl = jnp.concatenate(
        [draft, jnp.full((b, 1), -1, draft.dtype)], axis=1
    )  # [B, T]; -1 never matches
    f3 = jnp.where(idx3 == excl[:, :, None], NEG_INF, f3)
    choice = jax.random.categorical(kr, f3, axis=-1)  # [B, T]
    cont = jnp.take_along_axis(idx3, choice[..., None], axis=-1)[..., 0]
    cont = jnp.where(greedy, argmax3, cont).astype(jnp.int32)
    new_tok = jnp.take_along_axis(cont, n_acc[:, None], axis=1)[:, 0]
    return n_acc, new_tok


def apply_logit_bias(
    logits: jax.Array,  # [B, V] float
    bias_ids: jax.Array,  # [B, W] int32 token ids (pad with 0)
    bias_vals: jax.Array,  # [B, W] float additive biases (pad with 0.0)
) -> jax.Array:
    """Per-request additive logit biases (OpenAI `logit_bias`): a fixed-width
    (id, bias) table per row; padding rows add 0.0 to token 0 (a no-op)."""
    b = logits.shape[0]
    rows = jnp.arange(b)[:, None]
    return logits.at[rows, bias_ids].add(bias_vals.astype(logits.dtype))


def apply_penalties(
    logits: jax.Array,  # [B, V] float
    counts: jax.Array,  # [B, V] int32 output-token counts so far
    presence: jax.Array,  # [B] or scalar
    frequency: jax.Array,  # [B] or scalar
) -> jax.Array:
    """OpenAI-style presence/frequency penalties over the OUTPUT tokens
    generated so far (vLLM semantics: prompt tokens are not penalized)."""
    pres = jnp.broadcast_to(
        jnp.asarray(presence, jnp.float32), (logits.shape[0],)
    )[:, None]
    freq = jnp.broadcast_to(
        jnp.asarray(frequency, jnp.float32), (logits.shape[0],)
    )[:, None]
    cf = counts.astype(jnp.float32)
    return logits - freq * cf - pres * (cf > 0)


def token_logprobs(
    logits: jax.Array,  # [B, V] float (pre-temperature, post-bias/penalty)
    chosen: jax.Array,  # [B] int32 sampled token ids
    n_top: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """OpenAI `logprobs`: log-probability of the chosen token plus the
    `n_top` most likely alternatives, from the UN-tempered distribution
    (OpenAI semantics — logprobs describe the model, not the sampler).

    Returns (chosen_lp [B], top_ids [B, max(n_top,1)], top_lps [B, ...]);
    when n_top == 0 the top arrays are placeholders (width 1) so the
    jitted callers keep a static output structure."""
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)  # [B]
    rows = jnp.arange(logits.shape[0])
    chosen_lp = logits[rows, chosen].astype(jnp.float32) - lse
    k = max(n_top, 1)
    # approx_max_k: exact top-k over 128k vocab costs a full sort (~9 ms)
    top_vals, top_ids = jax.lax.approx_max_k(
        logits.astype(jnp.float32), k, recall_target=0.99
    )
    order = jnp.argsort(-top_vals, axis=-1)
    top_vals = jnp.take_along_axis(top_vals, order, axis=-1)
    top_ids = jnp.take_along_axis(top_ids, order, axis=-1)
    return chosen_lp, top_ids.astype(jnp.int32), top_vals - lse[:, None]
