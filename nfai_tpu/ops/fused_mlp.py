"""One-kernel quantized MLP: y = (act(x @ Wg) * (x @ Wu)) @ Wd.

Replaces the decode path's two layered dequant-matmul launches for
w_gate_up / w_down (the reference runs these as separate FFN shader
dispatches — NFAI.Vulkan.Shaders/TransformerBlock.cs — and the round-2
profile had the pair at ~1.55 ms of a ~2.8 ms step vs ~0.74 ms of HBM
bytes). One kernel overlaps everything: a single sequential grid streams
gate, up, AND down tiles together, the [B, F] activation never leaves
VMEM, and the pair pays one pipeline fill instead of two.

Layout contract (ops.qtensor.to_v3_mlp_stacked):
- grid step j covers down v3 word rows [j*TFB/2, (j+1)*TFB/2), which decode
  the four ffn k-ranges {p*F/4 + [j*TFB, (j+1)*TFB)} (v3 planes are
  k-quarters);
- the gate/up container ("q4mlpg") has its ffn columns PRE-PERMUTED into
  per-step [gate_j | up_j] slabs, so ONE [K/8, 8*TFB] BlockSpec fetches
  BOTH projections' four ranges (and one fetches both scale blocks) —
  5 operand DMAs per grid step total (the naturally-ordered first probe
  needed ~25 and lost to the two-kernel path, benchmarks/qmm_fused_mlp.py;
  the first permuted container used separate gate/up specs, 7 DMAs);
- the down container ("q4mlpd") keeps natural v3 words and permutes only
  its merged scale/min rows into the same per-step order.

The per-block affine mins ride in-kernel as rank-1 block-sum dots (same
trick as ops.qmatmul's layered kernels).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qmatmul import _block_sums, _interpret, _scaled_deq
from .qtensor import MLP_TFB, QBLOCK, QTensor

_HDR = 0x40004000
_MSK = 0x00780078
_SHIFTS = (3, -5, -1, -9)  # per-plane (qtensor.V3_SHIFTS)

# Per-grid-cell VMEM budget (v5e VMEM is 16 MB; leave headroom for the
# scalar-prefetch machinery and Mosaic's own buffers). Weight operand
# blocks are double-buffered across the sequential grid axis.
_VMEM_BUDGET = 13 << 20


def mlp_weight_block_bytes(k: int, h: int, scale_itemsize: int,
                           tfb: int = MLP_TFB) -> int:
    """Bytes of the per-grid-step weight operand blocks (gate + up + down
    words and their merged scale blocks) — the VMEM-dominant term."""
    gq_uq = 2 * (k // 8) * (4 * tfb) * 4
    gs_us = 2 * (2 * (k // QBLOCK)) * (4 * tfb) * scale_itemsize
    dq = (tfb // 2) * h * 4
    ds = (2 * tfb // 8) * h * scale_itemsize
    return gq_uq + gs_us + dq + ds


def _pick_bt(b: int, k: int, h: int, wbytes: int) -> int | None:
    """Largest batch tile whose working set fits the VMEM budget: weight
    blocks double-buffer across grid steps; each batch row adds x (bf16,
    double-buffered), the f32 accumulator, and the output block."""
    per_row = 2 * 2 * k + 4 * h + 2 * 2 * h
    bt = min(b, 128)
    while bt > 8:
        if 2 * wbytes + bt * per_row <= _VMEM_BUDGET:
            return bt
        bt //= 2
    return bt if 2 * wbytes + bt * per_row <= _VMEM_BUDGET else None


def _plane(w, s):
    sh = (w << s) if s > 0 else (w >> -s)
    return pltpu.bitcast((sh & jnp.int32(_MSK)) | jnp.int32(_HDR), jnp.bfloat16)


def _mlp_kernel_v2(
    lref, x_ref, guq_ref, gus_ref, dq_ref, ds_ref,
    o_ref, acc_ref, bs_ref, *, k: int, tfb: int, act: str,
):
    """Combined-slab variant of `_mlp_kernel`: gate and up are ONE set of
    4 plane dots over the full [K/8, 8·TFB] slab (the per-step [gate|up]
    column layout makes the split a free output slice), and the gate/up
    activation block-sums — loop-invariant across the ffn grid axis — are
    computed once at j==0 into scratch. 36 → 20 MXU dot launches per grid
    step with identical numerics; wins when the kernel is dot-launch-bound
    rather than VPU/DMA-bound (A/B: NFAI_MLP_V2)."""
    x = x_ref[...].astype(jnp.bfloat16)  # [BT, K]
    kq = k // 4  # x rows per v3 plane
    pb = kq // QBLOCK  # scale rows per plane
    kb = k // QBLOCK

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # per-plane activation block-sums, hoisted (j-invariant)
        bs_ref[...] = _block_sums(x, QBLOCK)  # [BT, K/32]

    guw = guq_ref[...]  # [K/8, 8*TFB] int32: [gate_j | up_j] slab
    gusc = gus_ref[...]  # [2*K/32, 8*TFB] merged scales|mins, same slab

    gu = None
    for p, s in enumerate(_SHIFTS):
        xp = x[:, p * kq : (p + 1) * kq]
        wp = _scaled_deq(_plane(guw, s), gusc[p * pb : (p + 1) * pb], QBLOCK)
        d = jax.lax.dot(xp, wp, preferred_element_type=jnp.float32)
        d -= jax.lax.dot(
            bs_ref[:, p * pb : (p + 1) * pb],
            gusc[kb + p * pb : kb + (p + 1) * pb].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        gu = d if gu is None else gu + d  # [BT, 8*TFB]

    w4 = 4 * tfb
    g, u = gu[:, :w4], gu[:, w4:]
    if act == "gelu":
        a = jax.nn.gelu(g, approximate=True) * u
    else:
        a = jax.nn.silu(g) * u
    a = a.astype(jnp.bfloat16)  # [BT, 4*TFB]

    wd = dq_ref[...]  # [TFB/2, H] int32
    ds = ds_ref[...]  # [2*TFB/8, H] merged scale|min rows (per-step order)
    fpb = tfb // QBLOCK  # scale rows per down plane
    for p, s in enumerate(_SHIFTS):
        ap = a[:, p * tfb : (p + 1) * tfb]
        wp = _scaled_deq(_plane(wd, s), ds[p * fpb : (p + 1) * fpb], QBLOCK)
        acc_ref[...] += jax.lax.dot(ap, wp, preferred_element_type=jnp.float32)
        acc_ref[...] -= jax.lax.dot(
            _block_sums(ap, QBLOCK),
            ds[(4 + p) * fpb : (5 + p) * fpb].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _mlp_kernel(
    lref, x_ref, guq_ref, gus_ref, dq_ref, ds_ref,
    o_ref, acc_ref, *, k: int, tfb: int, act: str,
):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.bfloat16)  # [BT, K]
    kq = k // 4  # x rows per v3 plane
    pb = kq // QBLOCK  # scale rows per plane
    kb = k // QBLOCK
    guw = guq_ref[...]  # [K/8, 8*TFB] int32: [gate_j | up_j] slab
    gusc = gus_ref[...]  # [2*K/32, 8*TFB] merged scales|mins, same slab

    def proj(w, sc):
        # w [K/8, 4*TFB] int32, sc [2*K/32, 4*TFB] merged scales|mins
        acc = None
        for p, s in enumerate(_SHIFTS):
            xp = x[:, p * kq : (p + 1) * kq]
            wp = _scaled_deq(_plane(w, s), sc[p * pb : (p + 1) * pb], QBLOCK)
            d = jax.lax.dot(xp, wp, preferred_element_type=jnp.float32)
            d -= jax.lax.dot(
                _block_sums(xp, QBLOCK),
                sc[kb + p * pb : kb + (p + 1) * pb].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        return acc  # [BT, 4*TFB] f32

    w4 = 4 * tfb
    g = proj(guw[:, :w4], gusc[:, :w4])
    u = proj(guw[:, w4:], gusc[:, w4:])
    if act == "gelu":
        a = jax.nn.gelu(g, approximate=True) * u
    else:
        a = jax.nn.silu(g) * u
    a = a.astype(jnp.bfloat16)  # [BT, 4*TFB]

    wd = dq_ref[...]  # [TFB/2, H] int32
    ds = ds_ref[...]  # [2*TFB/8, H] merged scale|min rows (per-step order)
    fpb = tfb // QBLOCK  # scale rows per down plane (8)
    for p, s in enumerate(_SHIFTS):
        ap = a[:, p * tfb : (p + 1) * tfb]
        wp = _scaled_deq(_plane(wd, s), ds[p * fpb : (p + 1) * fpb], QBLOCK)
        acc_ref[...] += jax.lax.dot(ap, wp, preferred_element_type=jnp.float32)
        acc_ref[...] -= jax.lax.dot(
            _block_sums(ap, QBLOCK),
            ds[(4 + p) * fpb : (5 + p) * fpb].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("act", "out_dtype", "tfb", "v2"))
def _fused_mlp(x, layer, gq, gs, dq, ds, act="silu", out_dtype=jnp.bfloat16,
               tfb=MLP_TFB, v2=False):
    """x [B, K] through stacked fused-MLP containers:
    gq [L, K/8, 2F] (q4mlpg words; per-step [gate_j | up_j] slabs of width
    8*tfb — ONE BlockSpec fetches both projections' words per grid step),
    gs [L, 2K/32, 2F] merged scales|mins (same column order),
    dq [L, F/8, H] natural v3 words,
    ds [L, 2F/32, H] merged scale|min rows in per-step order.
    `tfb` must match the width baked into the container permutations."""
    b, k = x.shape
    f2 = gq.shape[2]
    f = f2 // 2
    h = dq.shape[2]
    nj = f // (4 * tfb)
    kb = k // QBLOCK
    # batch tiling: decode is a single small tile; bigger row counts step
    # down to keep the operand set + per-tile accumulator inside VMEM
    # (mlp_eligible guarantees bt=8 fits; callers route large row counts
    # to mlp_prefill instead of re-streaming weights per tile)
    wbytes = mlp_weight_block_bytes(k, h, gs.dtype.itemsize, tfb)
    bt = _pick_bt(b, k, h, wbytes)
    if bt is None:  # pragma: no cover - mlp_eligible guards this
        raise ValueError("fused-MLP operand blocks exceed the VMEM budget")
    pad = (-b) % bt
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    nb = x.shape[0] // bt

    grid = (nb, nj)
    in_specs = [
        pl.BlockSpec((bt, k), lambda bi, j, lr: (bi, 0)),
        pl.BlockSpec((None, k // 8, 8 * tfb), lambda bi, j, lr: (lr[0], 0, j)),
        pl.BlockSpec((None, 2 * kb, 8 * tfb), lambda bi, j, lr: (lr[0], 0, j)),
        pl.BlockSpec((None, tfb // 2, h), lambda bi, j, lr: (lr[0], j, 0)),
        pl.BlockSpec((None, tfb // 4, h), lambda bi, j, lr: (lr[0], j, 0)),
    ]
    # combined-slab kernel (see _mlp_kernel_v2): one dot set over the full
    # [gate|up] slab + hoisted gate/up block-sums
    kernel = functools.partial(
        _mlp_kernel_v2 if v2 else _mlp_kernel, k=k, tfb=tfb, act=act
    )
    scratch = [pltpu.VMEM((bt, h), jnp.float32)]
    if v2:
        scratch.append(pltpu.VMEM((bt, kb), jnp.float32))
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], h), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bt, h), lambda bi, j, lr: (bi, 0)),
            scratch_shapes=scratch,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(100 << 20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * f2 + 2 * b * f * h,
            bytes_accessed=(k // 2) * f2 + (k // QBLOCK) * f2 * 8
            + (f // 2) * h + (f // QBLOCK) * h * 8 + b * (k + h) * 2,
            transcendentals=b * f,
        ),
        interpret=_interpret(),
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, gq, gs, dq, ds)
    return y[:b] if pad else y


def fused_mlp_layered(
    x: jax.Array, gu: QTensor, dn: QTensor, layer, act: str = "silu"
) -> jax.Array:
    """Layer-indexed fused MLP over stacked "q4mlpg"/"q4mlpd" containers.
    x [..., K] -> [..., H]."""
    lead = x.shape[:-1]
    xb = x.reshape(-1, gu.k)
    y = _fused_mlp(xb, layer, gu.qs, gu.scales, dn.qs, dn.scales, act=act,
                   tfb=gu.tfb or MLP_TFB,
                   # r5 A/B on silicon: v2 (combined-slab, hoisted bsums)
                   # wins BOTH measured configs — 1B b8 3958->4045 tok/s
                   # (eff 0.93->0.95), 8B tp4 shard 2597->2655 (0.70->0.71)
                   v2=os.environ.get("NFAI_MLP_V2", "1") != "0")
    return y.reshape(*lead, dn.n).astype(x.dtype)


def fused_mlp(x: jax.Array, gu: QTensor, dn: QTensor, act: str = "silu"):
    """Single-layer (sliced-container) fused MLP — wraps the leaves in a
    1-layer stack (XLA reshape, no copy) and indexes layer 0."""
    return fused_mlp_layered(
        x,
        gu.replace(qs=gu.qs[None], scales=gu.scales[None]),
        dn.replace(qs=dn.qs[None], scales=dn.scales[None]),
        0,
        act=act,
    )


# Row count above which the fused kernel's per-128-row weight re-streaming
# loses to dequantize-once + dense matmuls. The kernel re-reads ~Q quantized
# bytes per batch tile; the dense path costs ~Q read + 4Q dequant write +
# 4Q dense read — break-even around 8-9 tiles (~1k rows).
MLP_FUSED_MAX_ROWS = 1024


def mlp_tp(x: jax.Array, gu: QTensor, dn: QTensor, act: str = "silu"):
    """Tensor-parallel MLP over per-layer slices of the TP-interleaved
    fused-MLP containers (QTensor.tpi == tp): each shard's column/row slice
    is a standalone local q4mlpg/q4mlpd pair (ops.qtensor
    to_v3_mlp_stacked_tp), so shard_map runs the standard local fused
    kernel — or the dequant-once prefill path for large row counts — and
    psums the down-projection partials. Used by the generic (prefill)
    forward; the whole-scan TP decode path consumes the locals directly
    inside its own shard_map."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DP_AXIS, TP_AXIS
    from . import qmatmul as _qm

    mesh = _qm.TP_MESH
    tp = gu.tpi
    lead = x.shape[:-1]
    xb = x.reshape(-1, gu.k)
    rows = xb.shape[0]
    dp = mesh.shape[DP_AXIS]
    bax = DP_AXIS if (dp > 1 and rows % dp == 0) else None
    rows_local = rows // dp if bax else rows

    def local_fn(xl, gq, gs, dq, ds):
        gul = gu.replace(qs=gq, scales=gs, n=gu.n // tp, tpi=0, tp_mode=None)
        dnl = dn.replace(qs=dq, scales=ds, k=dn.k // tp, tpi=0, tp_mode=None)
        if rows_local > MLP_FUSED_MAX_ROWS:
            y = mlp_prefill(xl, gul, dnl, act=act)
        else:
            y = fused_mlp(xl, gul, dnl, act=act)
        return jax.lax.psum(y.astype(jnp.float32), TP_AXIS).astype(y.dtype)

    y = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(bax, None),
            P(None, TP_AXIS), P(None, TP_AXIS),
            P(TP_AXIS, None), P(TP_AXIS, None),
        ),
        out_specs=P(bax, None),
        check_vma=False,
    )(xb, gu.qs, gu.scales, dn.qs, dn.scales)
    return y.reshape(*lead, dn.n).astype(x.dtype)


def mlp_prefill(x: jax.Array, gu: QTensor, dn: QTensor, act: str = "silu"):
    """MLP over per-layer fused-MLP container slices for LARGE row counts
    (prefill): dequantize each weight ONCE per call (XLA) instead of
    re-streaming every weight block per 128-row kernel tile — an 8k-token
    prompt would otherwise re-read the MLP weights 64x per layer.

    The gate/up weight is dequantized in its PHYSICAL (per-step
    [gate_j|up_j] slab) column order and the activation STAYS in that
    order: the per-step permutation (j, p, t) <-> p*(F/4) + j*tfb + t is a
    pure axis transpose, so instead of the old `a[:, argsort(perm)]`
    gather on the [rows, F] activation (the 2x2048-token prefill profile
    showed ~36 ms of gather + bad-layout f32 materialization in this
    chain), the DOWN weight's rows transpose into the activation's order —
    an XLA transpose of the [F, H] matrix, F*H elements instead of
    rows*F and no gather at all."""
    from .qtensor import dequant_qtensor

    f = gu.n // 2
    tfb = gu.tfb or MLP_TFB
    nj = f // (4 * tfb)
    lead = x.shape[:-1]
    xb = x.reshape(-1, gu.k).astype(jnp.bfloat16)
    # gate/up through the fused-dequant q4v3 kernel in PHYSICAL (permuted)
    # column order — the q4mlpg merged-scales layout matches q4v3m. The
    # row-chunked kernel runs at MXU peak at prefill shapes (qkv measured
    # 70 us for its 65 us ideal) and skips the dense-dequant staging the
    # old XLA path paid per layer (~14 ms/2x2048-prefill of u32 decode
    # fusions, f32 scale materialization, and layout copies).
    from .qmatmul import KERNEL_ENABLED, kernel_supported, qmatmul

    if KERNEL_ENABLED and kernel_supported(gu.replace(kind="q4v3m")):
        gup = qmatmul(xb, gu.replace(kind="q4v3m"))
    else:  # tiny test shapes: XLA dequant fallback
        wgu = dequant_qtensor(gu.replace(kind="q4v3m"))
        gup = jax.lax.dot(
            xb, wgu, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
    # physical slab j = [gate cols (4*tfb) | up cols (4*tfb)]. Split with
    # STATIC lane-aligned 2D slices and re-concat: the previous
    # reshape-to-[rows, nj, 2, w] forced an XLA relayout to a 1024-lane
    # minor dim plus a transpose copy (~22 ms per 2x2048 1B prefill in
    # reshape.547/copy.92/fusion.103/reshape.548); slicing the flat
    # [rows, 2F] at 128-multiple column offsets keeps everything in the
    # native tiling and fuses into one elementwise pass.
    rows = gup.shape[0]
    w = 4 * tfb
    act_fn = (functools.partial(jax.nn.gelu, approximate=True)
              if act == "gelu" else jax.nn.silu)
    a = jnp.concatenate(
        [
            (
                act_fn(gup[:, 2 * j * w : (2 * j + 1) * w].astype(jnp.float32))
                * gup[:, (2 * j + 1) * w : (2 * j + 2) * w].astype(jnp.float32)
            ).astype(jnp.bfloat16)
            for j in range(nj)
        ],
        axis=-1,
    )  # [rows, F] in mlp_col_perm order
    wd = dequant_qtensor(dn)  # q4mlpd dequant un-permutes rows to natural
    # natural row p*(F/4) + j*tfb + t -> physical (j, p, t): a transpose
    wdp = wd.reshape(4, nj, tfb, dn.n).transpose(1, 0, 2, 3).reshape(f, dn.n)
    y = jax.lax.dot(a, wdp, preferred_element_type=jnp.float32)
    return y.reshape(*lead, dn.n).astype(x.dtype)
