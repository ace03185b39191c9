"""Sharding layouts for model params, KV cache, and activations.

Tensor-parallel layout (Megatron-style, expressed declaratively — GSPMD
inserts the psum/all-gather at layer boundaries):

- wq/wk/wv: columns (head dim output) sharded over tp  → per-chip heads
- wo:       rows (head dim input) sharded over tp      → output is a partial
            sum; GSPMD all-reduces into the residual
- w_gate/w_up: columns sharded; w_down: rows sharded   → same pattern in MLP
- lm_head:  vocab-sharded columns (logits gathered only for sampling)
- KV cache: kv-head axis sharded over tp, batch over dp — keeps the door open
  to ring/all-gather sequence parallelism (SURVEY.md §5 long-context)

n_heads, n_kv_heads, ffn_dim and vocab must divide by the tp size (checked).
"""
from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DP_AXIS, TP_AXIS


def validate_tp(cfg, tp: int) -> None:
    problems = []
    if cfg.n_heads % tp:
        problems.append(f"n_heads={cfg.n_heads}")
    if cfg.n_kv_heads % tp:
        problems.append(f"n_kv_heads={cfg.n_kv_heads}")
    if cfg.ffn_dim % tp:
        problems.append(f"ffn_dim={cfg.ffn_dim}")
    if cfg.vocab_size % tp:
        problems.append(f"vocab_size={cfg.vocab_size}")
    if problems:
        raise ValueError(
            f"tensor-parallel size {tp} does not divide: {', '.join(problems)}"
        )


def llama_param_shardings(mesh: Mesh) -> dict:
    """Pytree of NamedShardings matching the params tree of models.llama.

    Layer weights have a leading stacked-layer axis (None). Weights stored
    (in, out): column-parallel shards the last axis, row-parallel the middle.
    """
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    return {
        "embed": s(None, None),  # replicated (gather is tiny)
        "layers": {
            "attn_norm": s(None, None),
            "wq": s(None, None, TP_AXIS),
            "wk": s(None, None, TP_AXIS),
            "wv": s(None, None, TP_AXIS),
            "wo": s(None, TP_AXIS, None),
            "ffn_norm": s(None, None),
            "w_gate": s(None, None, TP_AXIS),
            "w_up": s(None, None, TP_AXIS),
            "w_down": s(None, TP_AXIS, None),
        },
        "final_norm": s(None),
        "lm_head": s(None, TP_AXIS),
        "inv_freq": s(None),
    }


def kv_cache_sharding(mesh: Mesh, batch: int | None = None) -> NamedSharding:
    """[L, H_kv, B, S, D] — kv heads over tp, batch over dp (replicated when
    the batch does not divide the dp axis, e.g. single-request generate)."""
    dp = mesh.shape[DP_AXIS]
    batch_axis = DP_AXIS if (batch is None or batch % dp == 0) else None
    return NamedSharding(mesh, P(None, TP_AXIS, batch_axis, None, None))


def token_sharding(mesh: Mesh) -> NamedSharding:
    """[B] / [B, T] token and position arrays — batch over dp."""
    return NamedSharding(mesh, P(DP_AXIS))
