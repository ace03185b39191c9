"""Flash prefill attention: offset-causal, GQA, length-masked — the prompt
chunk attends to the KV cache without ever materializing the [T, S] score
matrix in HBM.

The XLA fallback (ops.attention.causal_prefill_attention via
models.llama._cached_attention) builds masked scores of shape
[B, Hkv, R, T, S]; at an 8k context that is hundreds of MB per chunk and
dominates long-context TTFT. This kernel keeps the online-softmax state in
VMEM per (T-block, q-group) row and skips whole S-blocks that lie entirely
in the causal future of the chunk.

Layout: the GQA group dim R is flattened into the row dim OUTSIDE the
kernel (q arrives as [B, Hkv, T*R, D]), so every in-kernel op is a plain 2D
matmul — [TB*R, D] x [SB, D]^T scores and [TB*R, SB] x [SB, D] weighted
sums — that tiles onto the MXU at full width. The previous [TB, R, D]
3D layout padded R=4 sublanes to 8 and ran the MXU at ~7% (39 µs per
(256, 512) grid cell on v5e); row i of the flat block maps to token
i // R, which only changes the iota arithmetic of the causal mask.

KV layouts (kv_layout=):
- "full" (production): the cache stays in its NATIVE merged-lane
  [B, S, Hkv*D] storage (models.llama.KVCache). The kernel fetches
  full-width [s_block, KVD] row bands — one contiguous DMA per
  (t-block, s-block) cell instead of one per head — and a STATIC
  Python loop slices each head's D lanes from the loaded value. This
  removes the per-chunk head-major transpose, which the 2x2048 1B
  prefill profile priced at ~27 ms of transpose copies + ~23 ms of
  follow-on slices per call (vs 27 ms for the kernel itself).
- "headmajor": caller passes [B, Hkv, S, D] (transposed outside); kept
  for callers that already hold a head-major cache.
- "merged": lane-sliced BlockSpec over the merged layout; requires
  D % 128 == 0 and measured slower than "full" (strided D-wide DMAs);
  kept for probes.

Semantics match `_cached_attention`: query at absolute position p attends
cache slots s <= p. The chunk's queries sit at contiguous positions
offset..offset+T-1 (per batch row), which is exactly how the engine's
chunked prefill lays them out; K/V for the chunk must already be written
into the cache (same contract as the decode path).

Reference framing: replaces the reference's per-token score/softmax/
weighted-sum shader chain (``AttentionScoreCalculationShader.cs`` etc.) for
the prefill phase at block granularity instead of token granularity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_T_BLOCK = 256
DEFAULT_S_BLOCK = 512


def _to_mxu(x: jax.Array, dtype) -> jax.Array:
    """Cast a kernel operand to the MXU input dtype. Production (bf16
    activations) runs full-rate bf16 dots — f32 inputs are emulated at a
    fraction of peak on the MXU; int8 cache values (|v| <= 127) are exact
    in bf16 and route through f32 (Mosaic has no direct int8->bf16). The
    f32 path is kept for f32-activation callers (CPU tests)."""
    if x.dtype == dtype:
        return x
    return x.astype(jnp.float32).astype(dtype)


def _prefill_kernel(
    off_ref,  # SMEM [B] int32: absolute position of each row's q[0]
    win_ref,  # SMEM [1] int32: sliding window (0 = unlimited)
    q_ref,  # [TB*R, D] — R flattened into rows (row i -> token i // R)
    k_ref,  # [SB, D] (int8 when quantized)
    v_ref,  # [SB, D]
    *rest,  # ([ks_ref, vs_ref] when quantized,) o_ref, m/l/acc scratch
    t_block: int,
    s_block: int,
    n_rep: int,
    scale: float,
    softcap: float,
    windowed: bool,
    quantized: bool = False,
    mxu_dtype=jnp.bfloat16,
):
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    tb = pl.program_id(2)
    kk = pl.program_id(3)
    offset = off_ref[b]
    win = win_ref[0]
    t0 = offset + tb * t_block  # absolute position of this block's first q

    @pl.when(kk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # block skip: S-block fully in the causal future of every q in the block,
    # or (sliding window) fully behind every q's window
    relevant = kk * s_block <= t0 + t_block - 1
    if windowed:
        relevant &= (win == 0) | ((kk + 1) * s_block - 1 > t0 - win)

    @pl.when(relevant)
    def _():
        # bf16 MXU inputs (f32 dots run at a fraction of bf16 peak via
        # multi-pass emulation); int8 cache values <= 127 are exact in
        # bf16, accumulation stays f32 via preferred_element_type
        q = _to_mxu(q_ref[...], mxu_dtype)  # [TB*R, D]
        k = _to_mxu(k_ref[...], mxu_dtype)  # [SB, D]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [TB*R, SB]
        if quantized:
            # per-token scale factors out of the D contraction: one
            # broadcast multiply per score column ([1, SB] -> [TB*R, SB])
            scores = scores * ks_ref[...]
        if softcap:
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))
        span = kk * s_block + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=1
        )
        # row i of the flat block is query group-member i % R of token i // R
        qpos = t0 + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, dimension=0
        ) // n_rep
        visible = span <= qpos
        if windowed:
            visible &= (win == 0) | (span > qpos - win)
        scores = jnp.where(visible, scores, NEG_INF)

        m_prev = m_ref[:, :1]  # [TB*R, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [TB*R, SB]
        l_ref[...] = jnp.broadcast_to(
            l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
            l_ref.shape,
        )
        if quantized:
            p = p * vs_ref[...]  # fold the v scale into the softmax weights
        pv = jax.lax.dot_general(
            p.astype(mxu_dtype),
            _to_mxu(v_ref[...], mxu_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TB*R, D]
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kk == pl.num_programs(3) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[...] = (acc_ref[...] / denom).astype(o_ref.dtype)


def _prefill_kernel_full(
    off_ref,  # SMEM [B] int32
    win_ref,  # SMEM [1] int32
    q_ref,  # [Hkv, TB*R, D]
    k_ref,  # [SB, Hkv*D] — native merged-lane cache band
    v_ref,  # [SB, Hkv*D]
    *rest,  # ([ks_ref, vs_ref] [Hkv, 1, SB] when quantized,) o_ref, scratch
    t_block: int,
    s_block: int,
    n_rep: int,
    n_kv: int,
    d: int,
    scale: float,
    softcap: float,
    windowed: bool,
    quantized: bool = False,
    mxu_dtype=jnp.bfloat16,
):
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    tb = pl.program_id(1)
    kk = pl.program_id(2)
    offset = off_ref[b]
    win = win_ref[0]
    t0 = offset + tb * t_block

    @pl.when(kk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    relevant = kk * s_block <= t0 + t_block - 1
    if windowed:
        relevant &= (win == 0) | ((kk + 1) * s_block - 1 > t0 - win)

    @pl.when(relevant)
    def _():
        # the causal/window mask is head-independent: build it once.
        # (A full-block variant that skips the mask passes was measured a
        # wash on the 2x2048 prefill and doubled Mosaic stack pressure —
        # VMEM OOM at s_block=1024 — so one masked path it is.)
        shape = (t_block * n_rep, s_block)
        span = kk * s_block + jax.lax.broadcasted_iota(
            jnp.int32, shape, dimension=1
        )
        qpos = t0 + jax.lax.broadcasted_iota(
            jnp.int32, shape, dimension=0
        ) // n_rep
        visible = span <= qpos
        if windowed:
            visible &= (win == 0) | (span > qpos - win)
        for h in range(n_kv):  # static unroll: ref-level lane-slice loads
            kh = _to_mxu(k_ref[:, h * d:(h + 1) * d], mxu_dtype)
            vh = _to_mxu(v_ref[:, h * d:(h + 1) * d], mxu_dtype)
            # fold the softmax scale into q ([TB*R, D]) instead of the
            # [TB*R, SB] scores: one small VPU pass instead of a large one
            q = (q_ref[h].astype(jnp.float32) * scale).astype(mxu_dtype)
            scores = jax.lax.dot_general(
                q, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                scores = scores * ks_ref[h]
            if softcap:
                scores = softcap * jnp.tanh(scores * (1.0 / softcap))
            scores = jnp.where(visible, scores, NEG_INF)

            m_prev = m_ref[h, :, :1]
            m_new = jnp.maximum(
                m_prev, jnp.max(scores, axis=-1, keepdims=True)
            )
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)
            l_ref[h] = jnp.broadcast_to(
                l_ref[h, :, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
                l_ref.shape[1:],
            )
            if quantized:
                p = p * vs_ref[h]
            pv = jax.lax.dot_general(
                p.astype(mxu_dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[h] = acc_ref[h] * corr + pv
            m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :, :1], 1e-30)
        o_ref[...] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_block", "s_block", "interpret", "scale", "softcap", "kv_layout"
    ),
)
def flash_prefill_attention(
    q: jax.Array,  # [B, T, Hq, D]
    k_cache: jax.Array,  # see kv_layout
    v_cache: jax.Array,
    offsets: jax.Array,  # [B] int32 absolute position of q[:, 0]
    t_block: int = DEFAULT_T_BLOCK,
    s_block: int = DEFAULT_S_BLOCK,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float = 0.0,
    window: jax.Array | int = 0,  # sliding window; 0 = unlimited (traced ok)
    k_scales: jax.Array | None = None,  # [B, Hkv, S] f32 (int8 cache)
    v_scales: jax.Array | None = None,
    kv_layout: str = "headmajor",
) -> jax.Array:
    """Returns [B, T, Hq, D]; query t attends cache slots <= offsets[b]+t.

    kv_layout selects how the cache arrives (see module docstring):
    "full"/"merged" take the native [B, S, Hkv*D] storage, "headmajor"
    takes [B, Hkv, S, D] transposed by the caller."""
    b, t, hq, d = q.shape
    if kv_layout in ("full", "merged"):
        _, s, kvd = k_cache.shape
        hkv = kvd // d
        if kv_layout == "merged" and d % 128:
            raise ValueError(
                f"kv_layout='merged' needs D % 128 == 0 (lane-sliced "
                f"BlockSpec), got D={d}; use 'full' or 'headmajor'"
            )
    else:
        _, hkv, s, _ = k_cache.shape
    r = hq // hkv
    t_block = min(t_block, t)
    s_block = min(s_block, s)
    if t % t_block or s % s_block:
        raise ValueError(
            f"T={t} % t_block={t_block} or S={s} % s_block={s_block} != 0"
        )
    # flatten the q-group dim into rows: [B, Hkv, T*R, D] with token-major
    # row order (token i // R) so a T-block slice covers whole tokens
    qg = (
        q.reshape(b, t, hkv, r, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, hkv, t * r, d)
    )
    if scale is None:
        scale = 1.0 / (d**0.5)
    windowed = not (isinstance(window, int) and window == 0)
    win_arr = jnp.asarray(window, jnp.int32).reshape(1)
    quantized = k_scales is not None
    # bf16-activation callers (production) get full-rate bf16 MXU dots;
    # f32 callers (tests, parity oracles) keep exact f32 dots
    mxu_dtype = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32

    if kv_layout == "full":
        grid = (b, t // t_block, s // s_block)
        in_specs = [
            pl.BlockSpec((b,), lambda bb, tb, kk: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda bb, tb, kk: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (None, hkv, t_block * r, d), lambda bb, tb, kk: (bb, 0, tb, 0)
            ),
            pl.BlockSpec(
                (None, s_block, hkv * d), lambda bb, tb, kk: (bb, kk, 0)
            ),
            pl.BlockSpec(
                (None, s_block, hkv * d), lambda bb, tb, kk: (bb, kk, 0)
            ),
        ]
        args = [offsets, win_arr, qg, k_cache, v_cache]
        if quantized:
            sspec = pl.BlockSpec(
                (None, hkv, 1, s_block), lambda bb, tb, kk: (bb, 0, 0, kk)
            )
            in_specs += [sspec, sspec]
            args += [
                k_scales.reshape(b, hkv, 1, s),
                v_scales.reshape(b, hkv, 1, s),
            ]
        out = pl.pallas_call(
            functools.partial(
                _prefill_kernel_full, t_block=t_block, s_block=s_block,
                n_rep=r, n_kv=hkv, d=d, scale=scale, softcap=softcap,
                windowed=windowed, quantized=quantized,
                mxu_dtype=mxu_dtype,
            ),
            out_shape=jax.ShapeDtypeStruct((b, hkv, t * r, d), q.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (None, hkv, t_block * r, d),
                    lambda bb, tb, kk: (bb, 0, tb, 0),
                ),
                scratch_shapes=[
                    pltpu.VMEM((hkv, t_block * r, 128), jnp.float32),
                    pltpu.VMEM((hkv, t_block * r, 128), jnp.float32),
                    pltpu.VMEM((hkv, t_block * r, d), jnp.float32),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*args)
        return (
            out.reshape(b, hkv, t, r, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b, t, hq, d)
        )

    in_specs = [
        pl.BlockSpec(
            (b,), lambda bb, h, tb, kk: (0,), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (1,), lambda bb, h, tb, kk: (0,), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (None, None, t_block * r, d),
            lambda bb, h, tb, kk: (bb, h, tb, 0),
        ),
    ]
    if kv_layout == "merged":
        kv_spec = pl.BlockSpec(
            (None, s_block, d), lambda bb, h, tb, kk: (bb, kk, h)
        )
    else:
        kv_spec = pl.BlockSpec(
            (None, None, s_block, d), lambda bb, h, tb, kk: (bb, h, kk, 0)
        )
    in_specs += [kv_spec, kv_spec]
    args = [offsets, win_arr, qg, k_cache, v_cache]
    if quantized:
        sspec = pl.BlockSpec(
            (None, None, 1, s_block), lambda bb, h, tb, kk: (bb, h, 0, kk)
        )
        in_specs += [sspec, sspec]
        args += [
            k_scales.reshape(b, hkv, 1, s),
            v_scales.reshape(b, hkv, 1, s),
        ]

    grid = (b, hkv, t // t_block, s // s_block)
    out = pl.pallas_call(
        functools.partial(
            _prefill_kernel, t_block=t_block, s_block=s_block, n_rep=r,
            scale=scale, softcap=softcap, windowed=windowed,
            quantized=quantized, mxu_dtype=mxu_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t * r, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (None, None, t_block * r, d),
                lambda bb, h, tb, kk: (bb, h, tb, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((t_block * r, 128), jnp.float32),
                pltpu.VMEM((t_block * r, 128), jnp.float32),
                pltpu.VMEM((t_block * r, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return (
        out.reshape(b, hkv, t, r, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, t, hq, d)
    )
