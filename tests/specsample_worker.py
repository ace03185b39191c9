"""Worker for tests/test_spec_sampling.py — rejection-sampling speculation
math checks, run in a SUBPROCESS. These are the suite's alphabetically LAST
compile-heavy programs; on this image the in-process XLA:CPU compiler is
left in a corrupted state by the accumulated preceding compile load and
segfaults on exactly this file's first fresh vmap compile (reproduced 5x
at tests/test_spec_sampling.py across cache states and test subsets, r4).
The checks themselves pass in any fresh process.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from nfai_tpu.ops.sampling import (
    filtered_for_sampling,
    sample_logits,
    spec_verify_sample,
)


def _plain_marginal(logits_row, temp, top_k, top_p, min_p=0.0):
    """Exact probability vector plain sample_logits draws from."""
    filtered, idx, _ = filtered_for_sampling(
        logits_row[None, :].astype(jnp.float32),
        jnp.asarray([temp]), top_k, jnp.asarray([top_p]), None, min_p,
    )
    p = np.zeros(logits_row.shape[-1])
    probs = np.asarray(jax.nn.softmax(filtered, axis=-1))[0]
    for j, tid in enumerate(np.asarray(idx)[0]):
        p[tid] += probs[j]
    return p


def test_first_token_marginal_matches_plain_sampling():
    """Monte-Carlo: the first emitted token of a speculative round (draft
    accepted -> draft token, else residual resample) is distributed exactly
    like a plain sample from the target pipeline."""
    rng = np.random.default_rng(0)
    V, gamma = 16, 3
    logits = jnp.asarray(rng.standard_normal((1, gamma + 1, V)) * 2.0)
    draft = jnp.asarray([[3, 7, 1]], jnp.int32)
    temp, top_p, top_k = 0.8, 0.9, 8

    want = _plain_marginal(logits[0, 0], temp, top_k, top_p)

    n_trials = 30000
    keys = jax.random.split(jax.random.PRNGKey(1), n_trials)

    def one(key):
        n_acc, new_tok = spec_verify_sample(
            logits, draft, key, jnp.asarray([temp]), top_k,
            jnp.asarray([top_p]),
        )
        # first emitted token: draft[0] if >=1 accepted, else the residual
        return jnp.where(n_acc[0] >= 1, draft[0, 0], new_tok[0])

    toks = np.asarray(jax.vmap(one)(keys))
    got = np.bincount(toks, minlength=V) / n_trials
    # 30k trials: per-bucket standard error <= ~0.003
    np.testing.assert_allclose(got, want, atol=0.015)


def test_second_token_marginal_conditional():
    """Given the first draft accepted, the SECOND emitted token must be
    distributed like a plain sample at column 1."""
    rng = np.random.default_rng(2)
    V, gamma = 12, 2
    logits = jnp.asarray(rng.standard_normal((1, gamma + 1, V)) * 1.5)
    draft = jnp.asarray([[5, 9]], jnp.int32)
    temp, top_p, top_k = 1.0, 1.0, 0  # no truncation: clean conditional

    want = _plain_marginal(logits[0, 1], temp, top_k, top_p)

    n_trials = 40000
    keys = jax.random.split(jax.random.PRNGKey(3), n_trials)

    def one(key):
        n_acc, new_tok = spec_verify_sample(
            logits, draft, key, jnp.asarray([temp]), top_k,
            jnp.asarray([top_p]),
        )
        tok2 = jnp.where(n_acc[0] >= 2, draft[0, 1], new_tok[0])
        return jnp.where(n_acc[0] >= 1, tok2, -1)  # -1: first rejected

    toks = np.asarray(jax.vmap(one)(keys))
    toks = toks[toks >= 0]
    got = np.bincount(toks, minlength=V) / len(toks)
    np.testing.assert_allclose(got, want, atol=0.02)


def test_greedy_rows_match_argmax_prefix():
    rng = np.random.default_rng(4)
    V, gamma, B = 10, 3, 4
    logits = jnp.asarray(rng.standard_normal((B, gamma + 1, V)))
    am = np.asarray(jnp.argmax(logits, axis=-1))  # [B, T]
    # drafts: row 0 matches all, row 1 none, row 2 first only, row 3 mixed
    draft = np.stack([
        am[0, :gamma],
        (am[1, :gamma] + 1) % V,
        [am[2, 0], (am[2, 1] + 1) % V, am[2, 2]],
        [(am[3, 0] + 1) % V, am[3, 1], am[3, 2]],
    ]).astype(np.int32)
    n_acc, new_tok = spec_verify_sample(
        jnp.asarray(logits), jnp.asarray(draft), jax.random.PRNGKey(0),
        jnp.zeros(B), 8, jnp.ones(B),
    )
    assert list(np.asarray(n_acc)) == [gamma, 0, 1, 0]
    # continuation = argmax at the reject position (or column gamma)
    expect = [am[0, gamma], am[1, 0], am[2, 1], am[3, 0]]
    assert list(np.asarray(new_tok)) == expect


def test_full_acceptance_continuation_is_plain_sample():
    """After all gamma drafts accept, the continuation token must be a
    plain pipeline sample at column gamma (not residual-masked)."""
    rng = np.random.default_rng(5)
    V, gamma = 8, 1
    logits = np.zeros((1, gamma + 1, V), np.float32)
    logits[0, 0, 2] = 50.0  # draft token 2 has p ~= 1 -> always accepted
    logits[0, 1] = rng.standard_normal(V)
    draft = jnp.asarray([[2]], jnp.int32)
    want = _plain_marginal(jnp.asarray(logits)[0, 1], 1.0, 0, 1.0)
    n_trials = 30000
    keys = jax.random.split(jax.random.PRNGKey(6), n_trials)

    def one(key):
        n_acc, new_tok = spec_verify_sample(
            jnp.asarray(logits), draft, key, jnp.asarray([1.0]), 0,
            jnp.asarray([1.0]),
        )
        return jnp.where(n_acc[0] == 1, new_tok[0], -1)

    toks = np.asarray(jax.vmap(one)(keys))
    assert (toks >= 0).mean() > 0.999  # ~always accepted
    got = np.bincount(toks[toks >= 0], minlength=V) / (toks >= 0).sum()
    np.testing.assert_allclose(got, want, atol=0.015)


def main() -> int:
    test_first_token_marginal_matches_plain_sampling()
    print("first-token marginal OK")
    test_second_token_marginal_conditional()
    print("second-token conditional OK")
    test_greedy_rows_match_argmax_prefix()
    print("greedy prefix OK")
    test_full_acceptance_continuation_is_plain_sample()
    print("continuation OK")
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
