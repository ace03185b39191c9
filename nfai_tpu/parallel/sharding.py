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
    if getattr(cfg, "moe_ffn_dim", 0) and cfg.moe_ffn_dim % tp:
        problems.append(f"moe_ffn_dim={cfg.moe_ffn_dim}")
    if cfg.vocab_size % tp:
        problems.append(f"vocab_size={cfg.vocab_size}")
    if problems:
        raise ValueError(
            f"tensor-parallel size {tp} does not divide: {', '.join(problems)}"
        )


def llama_param_shardings(mesh: Mesh, params: dict | None = None) -> dict:
    """Pytree of NamedShardings matching the params tree of models.llama.

    Layer weights have a leading stacked-layer axis (None). Weights stored
    (in, out): column-parallel shards the last axis, row-parallel the middle.
    When `params` is given, quantized leaves (QTensor) get structure-matched
    shardings: qs/scales/mins all shard along their last (N) axis for
    column-parallel weights, along the K axis for row-parallel ones.
    Row-parallel 4-bit containers are packed per-K-section at load time
    (QTensor.sections == tp) so each chip's contiguous byte-row shard
    decodes a self-contained k-range; ops.qmatmul then runs the Pallas
    fused dequant-matmul per-shard under shard_map (QTensor.tp_mode).
    Weights that fail the per-shard kernel layout checks stay unmarked and
    run the GSPMD-sharded XLA dequant fallback.
    """
    from ..ops.qtensor import QTensor

    s = lambda *spec: NamedSharding(mesh, P(*spec))

    def wrap(name, col_parallel, row_parallel, stacked=True):
        """Sharding for a (possibly quantized) weight entry."""
        lead = (None,) if stacked else ()
        if col_parallel:
            spec2 = (*lead, None, TP_AXIS)
        elif row_parallel:
            spec2 = (*lead, TP_AXIS, None)
        else:
            spec2 = (*lead, None, None)
        dense = s(*spec2)
        if params is None:
            return dense
        leaf = params
        for part in name.split("."):
            if leaf is None or part not in leaf:
                return dense
            leaf = leaf[part]
        if isinstance(leaf, QTensor):
            return leaf.replace(
                qs=dense,
                scales=dense,
                mins=dense if leaf.mins is not None else None,
            )
        return dense

    layer_keys = {
        "attn_norm": s(None, None),
        "wq": wrap("layers.wq", True, False),
        "wk": wrap("layers.wk", True, False),
        "wv": wrap("layers.wv", True, False),
        "wo": wrap("layers.wo", False, True),
        "ffn_norm": s(None, None),
        "w_gate": wrap("layers.w_gate", True, False),
        "w_up": wrap("layers.w_up", True, False),
        "w_down": wrap("layers.w_down", False, True),
        # pre-fused projections (phi3 checkpoints, or fuse=True loads).
        # Column sharding splits the concatenated [q|k|v] / [gate|up] axis
        # into contiguous chip-slices that straddle section boundaries —
        # GSPMD keeps the logical array semantics, so the downstream static
        # slices stay correct (resharding collectives are inserted as
        # needed); hand-written shard_map kernels need section-aware
        # repacking instead (see engine TP notes).
        "wqkv": wrap("layers.wqkv", True, False),
        "w_gate_up": wrap("layers.w_gate_up", True, False),
    }
    if params is not None:
        def wrap_exps(name, spec):
            """Expert stacks may be QTensors (quantized-in-HBM MoE):
            qs/scales/mins are all rank-4 [L, E, rows, N] and shard the
            same axis (GSPMD keeps logical semantics for the unmarked
            dequant fallback under TP)."""
            leaf = params["layers"].get(name)
            from ..ops.qtensor import QTensor

            if isinstance(leaf, QTensor):
                return leaf.replace(
                    qs=spec, scales=spec,
                    mins=spec if leaf.mins is not None else None,
                )
            return spec

        # optional per-arch tensors + only keys actually present
        extra = {
            "wq_bias": s(None, TP_AXIS),
            "wk_bias": s(None, TP_AXIS),
            "wv_bias": s(None, TP_AXIS),
            "wqkv_bias": s(None, TP_AXIS),
            "q_norm": s(None, None),
            "k_norm": s(None, None),
            "post_attn_norm": s(None, None),
            "post_ffw_norm": s(None, None),
            # MoE (qwen3moe): router is tiny -> replicated; expert stacks
            # [L, E, K, N] shard the ffn dim (N for gate/up, K for down) so
            # every chip holds a slice of every expert. Expert-parallel
            # sharding (E axis over the mesh) is the rehearsed alternative:
            # parallel.expert_parallel.expert_shardings + moe_ffn_ep prove
            # the E-shards are standalone containers for the unchanged
            # grouped kernels (tests/test_expert_parallel.py)
            "router": s(None, None, None),
            "w_gate_exps": wrap_exps(
                "w_gate_exps", s(None, None, None, TP_AXIS)
            ),
            "w_up_exps": wrap_exps(
                "w_up_exps", s(None, None, None, TP_AXIS)
            ),
            "w_down_exps": wrap_exps(
                "w_down_exps", s(None, None, TP_AXIS, None)
            ),
        }
        layer_keys.update(extra)
        layer_keys = {
            k: v for k, v in layer_keys.items() if k in params["layers"]
        }
    out = {
        "embed": s(None, None),  # replicated (gather is tiny)
        "layers": layer_keys,
        "final_norm": s(None),
        "lm_head": wrap("lm_head", True, False, stacked=False),
        "inv_freq": s(None),
    }
    if params is not None and "inv_freq_local" in params:
        out["inv_freq_local"] = s(None)  # gemma3 local-layer rope table
    if params is not None and params.get("embed") is None:
        out["embed"] = None  # tied quantized table lives under lm_head
    return out


def kv_cache_sharding(mesh: Mesh, batch: int | None = None) -> NamedSharding:
    """[L, B, S, KVD] — the merged KVD axis is head-major, so sharding it
    over tp keeps whole kv-heads per shard (validate_tp guarantees
    n_kv_heads % tp == 0); batch over dp (replicated when the batch does not
    divide the dp axis, e.g. single-request generate)."""
    dp = mesh.shape[DP_AXIS]
    batch_axis = DP_AXIS if (batch is None or batch % dp == 0) else None
    return NamedSharding(mesh, P(None, batch_axis, None, TP_AXIS))


def kv_cache_sharding_sp(mesh: Mesh, axis: str = "sp") -> NamedSharding:
    """[L, B, S, KVD] sharded over the SEQUENCE axis (sequence-parallel
    engines, EngineConfig.seq_parallel): each chip holds an S/n slice of
    every layer's cache — the layout parallel.seq_parallel reassembles
    decode attention from. Weights stay replicated; max_seq_len must
    divide the axis."""
    return NamedSharding(mesh, P(None, None, axis, None))


def token_sharding(mesh: Mesh) -> NamedSharding:
    """[B] / [B, T] token and position arrays — batch over dp."""
    return NamedSharding(mesh, P(DP_AXIS))
