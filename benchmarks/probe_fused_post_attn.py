"""PROBE (dead end, kept for the record): post-attention fusion — ONE
Pallas kernel per decode layer for
    h_mid = h + attn @ Wo
    x     = rmsnorm(h_mid) * g_ffn
    a     = silu(x @ Wg) * (x @ Wu)
returning (a [B, F], h_mid [B, H]).

Why: in the decode profile the standalone wo matmul costs ~10.7 µs/call
against 3.8 µs of HBM bytes — launch overhead and pipeline fill dominate a
2-grid-cell kernel. Folding wo + residual + norm into the FIRST grid cell
of the gate_up kernel (whose (1024-byte, 1024-lane) tiles are the measured
optimum — benchmarks/qmm_probe2) hides that entire cost inside gate_up's
pipeline, and pairing each gate tile with its up tile lets SwiGLU happen
in-register, so the [B, 2F] intermediate never exists in HBM.

Containers are the standard v2 split-half 4-bit layout (ops.qtensor);
the per-block affine mins ride the same activation-block-sum MXU dots as
ops.qmatmul's layered kernels. Activation block sums for gate/up are
computed in-kernel with a selector-matrix dot (Mosaic has no in-kernel
lane reshapes).

MEASURED RESULT (v5e, 1B shapes, b8): 160 us/layer fused vs 68.4 us for
the unfused wo + norm + gate_up + swiglu chain — the cell-0 prologue
serializes the wo DMA+compute against the whole gate_up pipeline and the
raised vmem limit costs more than the saved launch. NOT integrated; the
two-kernel path with (1024,1024) tiles stays the production one. Same
conclusion as benchmarks/qmm_fused_mlp.py: on this compiler/hardware,
well-tiled separate kernels beat composite kernels for these shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nfai_tpu.ops.qtensor import QBLOCK


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=dim)


def _deq_pair(byte, sc_lo, sc_hi):
    """v2 split-half byte tile -> (w_lo, w_hi) bf16 with per-block scales."""
    hi16f = (byte & jnp.int8(-16)).astype(jnp.bfloat16)
    lof = byte.astype(jnp.bfloat16) - hi16f

    def scl(w, sc):
        tk, tn = w.shape
        return (
            w.reshape(tk // QBLOCK, QBLOCK, tn)
            * sc[...][:, None, :].astype(jnp.bfloat16)
        ).reshape(tk, tn)

    return scl(lof, sc_lo), scl(hi16f, sc_hi)


def _kernel(
    lref,
    attn_ref,  # [B, QD] attention output (pre-wo)
    bsa_ref,  # [B, QD/32] f32 block sums of attn (for wo mins)
    h_ref,  # [B, H] residual stream
    nw_ref,  # [1, H] ffn_norm weights for this layer
    wo_q, wo_sl, wo_sh, wo_ml, wo_mh,  # wo container (full-K blocks)
    g_q, g_sl, g_sh, g_ml, g_mh,  # gate column tile
    u_q, u_sl, u_sh, u_ml, u_mh,  # up column tile
    a_ref,  # out [B, TN] activation tile
    h_out_ref,  # out [B, H] post-attention residual (written in cell 0)
    xn_ref,  # scratch [B, H] bf16 normalized x
    bsx_ref,  # scratch [B, H/32] f32 block sums of x
    *,
    eps: float,
    kb: int,  # H/32 (gate/up K blocks)
    qkb: int,  # QD/32 (wo K blocks)
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        attn = attn_ref[...]
        b, qd = attn.shape
        a_lo = attn[:, : qd // 2].astype(jnp.bfloat16)
        a_hi = attn[:, qd // 2 :].astype(jnp.bfloat16)
        w_lo, w_hi = _deq_pair(wo_q[...], wo_sl[...], wo_sh[...])
        y = jax.lax.dot(a_lo, w_lo, preferred_element_type=jnp.float32)
        y += jax.lax.dot(a_hi, w_hi, preferred_element_type=jnp.float32)
        bsa = bsa_ref[...]
        y -= jax.lax.dot(
            bsa[:, : qkb // 2], wo_ml[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        y -= jax.lax.dot(
            bsa[:, qkb // 2 :], wo_mh[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        h_mid = h_ref[...].astype(jnp.float32) + y  # [B, H]
        h_out_ref[...] = h_mid.astype(h_out_ref.dtype)
        # rmsnorm in f32 (same math as ops.norms.rms_norm)
        var = jnp.mean(h_mid * h_mid, axis=-1, keepdims=True)
        xn = h_mid * jax.lax.rsqrt(var + eps) * nw_ref[...].astype(
            jnp.float32
        )
        xn_ref[...] = xn.astype(xn_ref.dtype)
        # block sums of the NORMALIZED activations for the gate/up mins
        h_dim = xn.shape[-1]
        sel = (
            _iota2((h_dim, kb), 0) // QBLOCK == _iota2((h_dim, kb), 1)
        ).astype(jnp.float32)
        bsx_ref[...] = jax.lax.dot(xn, sel, preferred_element_type=jnp.float32)

    xn = xn_ref[...]
    b, h_dim = xn.shape
    x_lo = xn[:, : h_dim // 2]
    x_hi = xn[:, h_dim // 2 :]
    bsx = bsx_ref[...]

    def proj(q_r, sl, sh, ml, mh):
        w_lo, w_hi = _deq_pair(q_r[...], sl[...], sh[...])
        acc = jax.lax.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
        acc += jax.lax.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
        acc -= jax.lax.dot(
            bsx[:, : kb // 2], ml[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc -= jax.lax.dot(
            bsx[:, kb // 2 :], mh[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return acc

    g = proj(g_q, g_sl, g_sh, g_ml, g_mh)
    u = proj(u_q, u_sl, u_sh, u_ml, u_mh)
    a_ref[...] = (g * jax.lax.logistic(g) * u).astype(a_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "tn", "interpret")
)
def post_attn_mlp_in(
    attn: jax.Array,  # [B, QD]
    h: jax.Array,  # [B, H]
    norm_w: jax.Array,  # [H] this layer's ffn_norm (pre-sliced smalls)
    layer: jax.Array,
    wo_qs: jax.Array,  # [L, QD/2, H]
    wo_sc: jax.Array,  # [L, QD/32, H]
    wo_mn: jax.Array,
    gu_qs: jax.Array,  # [L, H/2, 2F] (gate | up)
    gu_sc: jax.Array,  # [L, H/32, 2F]
    gu_mn: jax.Array,
    eps: float = 1e-5,
    tn: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (a [B, F] bf16, h_mid [B, H] f32-accurate bf16)."""
    b, qd = attn.shape
    h_dim = h.shape[1]
    l, _, f2 = gu_qs.shape
    f = f2 // 2
    kb = h_dim // QBLOCK
    qkb = qd // QBLOCK
    n_tiles = f // tn
    bsa = jnp.sum(
        attn.astype(jnp.float32).reshape(b, qkb, QBLOCK), axis=-1
    )  # [B, QD/32]
    larr = jnp.asarray(layer, jnp.int32).reshape(1)
    up_off = f // tn  # up tile column offset in tn units

    def gu_blocks(col_off):
        return [
            pl.BlockSpec(
                (None, h_dim // 2, tn),
                lambda j, lr, o=col_off: (lr[0], 0, j + o),
            ),
            pl.BlockSpec(
                (None, kb // 2, tn), lambda j, lr, o=col_off: (lr[0], 0, j + o)
            ),
            pl.BlockSpec(
                (None, kb // 2, tn), lambda j, lr, o=col_off: (lr[0], 1, j + o)
            ),
        ]

    in_specs = [
        pl.BlockSpec((b, qd), lambda j, lr: (0, 0)),
        pl.BlockSpec((b, qkb), lambda j, lr: (0, 0)),
        pl.BlockSpec((b, h_dim), lambda j, lr: (0, 0)),
        pl.BlockSpec((1, h_dim), lambda j, lr: (0, 0)),
        # wo container, full-K single block
        pl.BlockSpec((None, qd // 2, h_dim), lambda j, lr: (lr[0], 0, 0)),
        pl.BlockSpec((None, qkb // 2, h_dim), lambda j, lr: (lr[0], 0, 0)),
        pl.BlockSpec((None, qkb // 2, h_dim), lambda j, lr: (lr[0], 1, 0)),
        pl.BlockSpec((None, qkb // 2, h_dim), lambda j, lr: (lr[0], 0, 0)),
        pl.BlockSpec((None, qkb // 2, h_dim), lambda j, lr: (lr[0], 1, 0)),
    ]
    args = [
        larr, attn, bsa, h, norm_w.reshape(1, h_dim),
        wo_qs, wo_sc, wo_sc, wo_mn, wo_mn,
    ]
    gq = gu_blocks(0)
    in_specs += [gq[0], gq[1], gq[2], gq[1], gq[2]]
    args += [gu_qs, gu_sc, gu_sc, gu_mn, gu_mn]
    uq = gu_blocks(up_off)
    in_specs += [uq[0], uq[1], uq[2], uq[1], uq[2]]
    args += [gu_qs, gu_sc, gu_sc, gu_mn, gu_mn]

    a, h_mid = pl.pallas_call(
        functools.partial(_kernel, eps=eps, kb=kb, qkb=qkb),
        out_shape=(
            jax.ShapeDtypeStruct((b, f), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, h_dim), h.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((b, tn), lambda j, lr: (0, j)),
                pl.BlockSpec((b, h_dim), lambda j, lr: (0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((b, h_dim), jnp.bfloat16),
                pltpu.VMEM((b, kb), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the wo-prologue transients push past the 16MB default scoped
            # vmem limit; v5e has 128MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * qd * h_dim + 2 * b * h_dim * f2,
            bytes_accessed=(qd // 2) * h_dim + (h_dim // 2) * f2
            + ((qd // QBLOCK) * h_dim + kb * f2) * 8,
            transcendentals=b * f,
        ),
        interpret=interpret,
    )(*args)
    return a, h_mid


def post_attn_mlp_reference(
    attn, h, norm_w, layer, wo_qt, gu_qt, eps=1e-5
):
    """jnp reference through the shipped layered matmuls (tests)."""
    from nfai_tpu.ops.norms import rms_norm
    from nfai_tpu.ops.qmatmul import qmatmul_layered

    y = qmatmul_layered(attn, wo_qt, layer)
    h_mid = (h.astype(jnp.float32) + y.astype(jnp.float32)).astype(h.dtype)
    x = rms_norm(h_mid, norm_w, eps)
    gu = qmatmul_layered(x.astype(jnp.bfloat16), gu_qt, layer)
    f = gu.shape[-1] // 2
    a = jax.nn.silu(gu[..., :f].astype(jnp.float32)) * gu[..., f:].astype(
        jnp.float32
    )
    return a.astype(jnp.bfloat16), h_mid
