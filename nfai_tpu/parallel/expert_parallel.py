"""Expert-parallel MoE rehearsal: expert stacks sharded over the mesh.

SURVEY §2.7 scopes PP/EP to "leave seams"; VERDICT r3 asked for the expert
seam to be real — a layout + hook proving the grouped quantized kernels
(ops.qmatmul.qmatmul_grouped) need no re-plumbing when the expert axis is
sharded. The seam is this: a [E, ...] stacked expert container sharded on
its E axis gives every chip a contiguous [E/n, ...] slice that IS a
standalone stacked container — same kind, same k/n, same group — so the
per-shard compute is the unchanged local grouped kernel (or its XLA
fallback), and the only collective is one psum of the mixed outputs.

Routing stays replicated (the router is tiny, sharding.py keeps it so);
each chip masks the routing weights to its local experts and remaps expert
ids to shard-local ids. Non-local (token, slot) pairs keep their rows —
static shapes for jit — but contribute 0 through their masked weights.

Rehearsed for correctness on the 8-virtual-device CPU mesh
(tests/test_expert_parallel.py) against the single-device MoE oracle.
Reference frame: the reference has no MoE and no parallelism at all
(SURVEY §2.7); this goes with parallel.seq_parallel beyond it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TP_AXIS


def expert_shardings(mesh: Mesh, stacked_layers: bool = False,
                     axis: str = TP_AXIS):
    """NamedSharding for an expert-stacked weight ([E, K, N] or layer-
    stacked [L, E, K, N]): shard the EXPERT axis over `axis`. Apply to each
    QTensor leaf (qs/scales/mins share the E axis position)."""
    lead = (None,) if stacked_layers else ()
    return NamedSharding(mesh, P(*lead, axis, None, None))


def moe_ffn_ep(
    x: jax.Array,  # [N, H] flattened tokens
    lp: dict,  # router [H, E] + w_gate_exps/w_up_exps/w_down_exps stacks
    cfg,  # LlamaConfig (n_experts, n_experts_used, norm_topk_prob)
    act,
    mesh: Mesh,
    axis: str = TP_AXIS,
) -> jax.Array:
    """Expert-parallel MoE FFN: per-chip compute over its E/n local experts
    (dense einsum or the quantized grouped kernel contract, unchanged), one
    psum to mix. Exact vs the single-device oracle (_moe_ffn_dense /
    _moe_ffn_grouped_q up to f32 reduction order)."""
    from ..models.llama import _moe_group_layout, _moe_route
    from ..ops.qmatmul import qmatmul_grouped
    from ..ops.qtensor import QTensor

    e, used = cfg.n_experts, cfg.n_experts_used
    n_sh = mesh.shape[axis]
    el = e // n_sh
    assert e % n_sh == 0, (e, n_sh)
    quant = isinstance(lp["w_gate_exps"], QTensor)

    def leaves(w):
        if isinstance(w, QTensor):
            return (w.qs, w.scales) + ((w.mins,) if w.mins is not None else ())
        return (w,)

    def rebuild(w, parts):
        if isinstance(w, QTensor):
            qs, scales = parts[0], parts[1]
            mins = parts[2] if w.mins is not None else None
            return w.replace(qs=qs, scales=scales, mins=mins)
        return parts[0]

    wg, wu, wd = lp["w_gate_exps"], lp["w_up_exps"], lp["w_down_exps"]
    flat = [x, lp["router"], *leaves(wg), *leaves(wu), *leaves(wd)]
    espec = P(axis, None, None)
    specs = [P(), P()]
    for w in (wg, wu, wd):
        specs += [espec] * len(leaves(w))

    def local(xl, router, *wparts):
        i = 0
        ws = []
        for w in (wg, wu, wd):
            k = len(leaves(w))
            ws.append(rebuild(w, wparts[i : i + k]))
            i += k
        wgl, wul, wdl = ws
        idx = jax.lax.axis_index(axis)
        n = xl.shape[0]
        top_vals, top_idx = _moe_route(xl, {"router": router}, cfg)
        local_sel = (top_idx // el) == idx
        vals = jnp.where(local_sel, top_vals, 0.0)  # [N, used]
        lid = jnp.clip(top_idx - idx * el, 0, el - 1)
        if quant:
            # grouped-kernel contract, unchanged, on the LOCAL container
            flat_expert = lid.reshape(-1)
            flat_weight = vals.reshape(-1)
            rows = n * used
            tm = 8
            order, dst, block_group, m_pad = _moe_group_layout(
                flat_expert, rows, el, tm
            )
            token_of = order // used
            x_pad = jnp.zeros((m_pad, xl.shape[1]), jnp.bfloat16).at[dst].set(
                xl[token_of].astype(jnp.bfloat16)
            )
            gate = qmatmul_grouped(x_pad, wgl, block_group, tm)
            up = qmatmul_grouped(x_pad, wul, block_group, tm)
            inner = (
                act(gate.astype(jnp.float32)) * up.astype(jnp.float32)
            ).astype(jnp.bfloat16)
            down = qmatmul_grouped(inner, wdl, block_group, tm)
            dsel = down[dst].astype(jnp.float32) * flat_weight[order][:, None]
            out = jnp.zeros((n, xl.shape[1]), jnp.float32).at[token_of].add(dsel)
        else:
            # dense local oracle: every LOCAL expert computed, masked mix
            mix = jnp.sum(
                jax.nn.one_hot(lid, el, dtype=jnp.float32)
                * vals[..., None],
                axis=-2,
            )  # [N, El]
            xe = xl.astype(wgl.dtype)
            gate = jnp.einsum("nh,ehf->nef", xe, wgl)
            up = jnp.einsum("nh,ehf->nef", xe, wul)
            inner = act(gate) * up
            down = jnp.einsum("nef,efh->neh", inner, wdl)
            out = jnp.einsum("neh,ne->nh", down.astype(jnp.float32), mix)
        return jax.lax.psum(out, axis)

    out = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(specs), out_specs=P(),
        check_vma=False,
    )(*flat)
    return out.astype(x.dtype)
