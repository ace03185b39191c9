"""Device layouts for block-quantized weights (weights stay quantized in HBM).

The GGUF on-disk block formats (nfai_tpu.gguf.quants) are repacked at load
time into TPU-friendly arrays so the Pallas matmul kernels (ops.qmatmul) can
fuse dequantization into the contraction:

- weights are stored transposed to (K=in, N=out) — the GGUF quant blocks run
  along K (ggml's contiguous ne[0] axis), so after transpose the per-32-block
  scale for element (k, n) is ``scales[k // 32, n]``;
- 8-bit kinds: ``qs`` int8 [K, N];
- 4-bit kinds: ``qs`` int8 [K/2, N] with **split-half packing** — byte (i, n)
  holds k=i in its low nibble and k=i+K/2 in its high nibble, so a kernel
  k-tile unpacks two *contiguous* k-ranges (no sublane interleave on TPU).
  The high nibble stores the *biased-signed* value ``(q - 8) & 0xF`` and its
  scale rows are pre-divided by 16, so the in-kernel decode is pure int8/bf16
  arithmetic (Mosaic cannot lower int8 shifts/sub/mul, only AND):
      hi16f = (byte & 0xF0).astype(bf16)   # exactly 16*(q_hi - 8)
      lof   = byte.astype(bf16) - hi16f    # exactly q_lo (0..15)
      w     = hi16f * (s/16),  lof * s
  The -8 bias is absorbed into the high-half effective mins (m' = m - 8s),
  which the external rank-1 correction already applies;
- affine kinds (Q4_K's ``d*sc*q - dmin*m``, Q4_0's ``d*(q-8)``) are expressed
  as ``value = scales*q - mins`` with precomputed effective per-block
  scales/mins; the mins term is folded out of the kernel entirely via
  per-block activation sums (see qmatmul.mins_correction).

Reference parity note: the reference's only "quantized" path read Q8_0 as raw
bytes + one trailing scale it never applied (NFAI.GGUF/Parser.cs:93-100,
SURVEY.md §2.2). These layouts implement the real ggml semantics.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import ml_dtypes

from ..gguf.constants import GGMLType
from ..gguf.quants import _unpack_kquant_scales

QBLOCK = 32  # default scale granularity along K
# Effective scales/mins stay f32 in HBM for the v2/q8 containers: bf16 storage
# was measured to double Q8_0's effective weight error (bf16 eps 0.4% vs
# f16-scale-exact), violating the "ppl within llama.cpp's delta" target for
# ~1 bit/elem of bandwidth. NFAI_SCALE_DTYPE=bf16 is an A/B escape hatch
# (perf probes only).
SCALE_DTYPE = np.float32
MIN_DTYPE = np.float32
if os.environ.get("NFAI_SCALE_DTYPE") == "bf16":  # pragma: no cover
    SCALE_DTYPE = MIN_DTYPE = ml_dtypes.bfloat16


def _v3_scale_dtype():
    """Storage dtype for v3-container (4-bit) scales/mins: bf16 by default.

    Unlike the q8 case above this is nearly free accuracy-wise: the matmul
    kernels multiply the decoded values by scales in bf16 REGARDLESS
    (qmatmul._scaled_deq), so f32 storage only adds precision to the rank-1
    mins-correction dot. bf16 halves the scale-array HBM bytes (+6.3% tok/s
    on the 1B q4 decode bench) and drops the arrays below XLA's per-layer
    alternate-memory re-staging threshold. NFAI_V3_SCALE_DTYPE=f32 restores
    f32 storage (A/B + accuracy-paranoia escape hatch)."""
    if os.environ.get("NFAI_V3_SCALE_DTYPE") == "f32":
        return jnp.float32
    return jnp.bfloat16


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qs", "scales", "mins"],
    meta_fields=["kind", "k", "n", "group", "sections", "tp_mode", "tfb",
                 "tpi"],
)
@dataclasses.dataclass
class QTensor:
    """A quantized (K, N) weight. `mins` is None for symmetric kinds.

    `group` is the per-scale block length along K (32 for the 32-block
    formats and Q4_K/Q5_K super-block sub-blocks; 16 for Q2_K/Q3_K/Q6_K).

    `sections` (4-bit kinds only): the K axis is divided into `sections`
    contiguous chunks, each split-half packed independently. Row-parallel
    tensor-parallel weights are packed with sections = tp so that each
    chip's contiguous byte-row shard decodes a self-contained, contiguous
    k-range (see parallel/sharding.py).

    `tp_mode` ("col" | "row" | None) marks how this weight shards under
    tensor parallelism; ops.qmatmul uses it to route through shard_map so
    the Pallas kernels run per-shard instead of falling back to the XLA
    dequant path.
    """

    qs: jax.Array  # int8: [K, N] (8-bit container) or packed [K//2, N] (4-bit)
    scales: jax.Array  # f32 [K//group, N] (effective per-block scales)
    mins: jax.Array | None  # f32 [K//group, N] or None
    kind: str  # "q8" | "q4"
    k: int
    n: int
    group: int = QBLOCK
    sections: int = 1
    tp_mode: str | None = None
    # fused-MLP containers only ("q4mlpg"/"q4mlpd"): ffn elements per v3
    # plane per grid step, baked into the column/row permutation at pack
    # time. Smaller tfb halves the per-grid-step VMEM operand blocks
    # (8B-class shapes overflow the 16 MB VMEM at 256). 0 = n/a.
    tfb: int = 0
    # TP-interleaved fused projections: columns are ordered PER SHARD
    # ([q_c|k_c|v_c] / [gate_c|up_c] for shard c), so a contiguous column
    # shard is itself a fused local projection for the whole-scan shard_map
    # decode path. Consumers outside shard_map un-permute the OUTPUT
    # columns (tp_fused_inv_perm). 0 = logical column order.
    tpi: int = 0

    def replace(self, **kw) -> "QTensor":
        return dataclasses.replace(self, **kw)

    @property
    def shape(self):  # (in, out) like a dense (K, N) weight
        return (self.k, self.n)

    @property
    def dtype(self):
        return jnp.bfloat16

    def hbm_bytes(self) -> int:
        b = self.qs.size * self.qs.dtype.itemsize
        b += self.scales.size * self.scales.dtype.itemsize
        if self.mins is not None:
            b += self.mins.size * self.mins.dtype.itemsize
        return b


# ---------------------------------------------------------------------------
# integer-level GGUF block decoders (q values + effective scales/mins)


def _q8_0_int(raw: np.ndarray, n_out: int, k_in: int):
    blocks = raw.reshape(n_out * k_in // 32, 34)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32).reshape(n_out, k_in // 32)
    q = blocks[:, 2:].view(np.int8).reshape(n_out, k_in)
    return q, d, None


def _q4_0_int(raw: np.ndarray, n_out: int, k_in: int):
    blocks = raw.reshape(n_out * k_in // 32, 18)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32).reshape(n_out, k_in // 32)
    qs = blocks[:, 2:18]
    lo = qs & 0x0F
    hi = qs >> 4
    q = np.concatenate([lo, hi], axis=1).reshape(n_out, k_in)  # values 0..15
    return q, d, 8.0 * d  # value = d*q - 8d


def _q4_1_int(raw: np.ndarray, n_out: int, k_in: int):
    blocks = raw.reshape(n_out * k_in // 32, 20)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32).reshape(n_out, k_in // 32)
    m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32).reshape(n_out, k_in // 32)
    qs = blocks[:, 4:20]
    q = np.concatenate([qs & 0x0F, qs >> 4], axis=1).reshape(n_out, k_in)
    return q, d, -m  # value = d*q + m = d*q - (-m)


def _q4_k_int(raw: np.ndarray, n_out: int, k_in: int):
    if k_in % 256:
        raise ValueError(f"Q4_K requires the in-dim to be a multiple of 256, got {k_in}")
    nb = n_out * k_in // 256
    blocks = raw.reshape(nb, 144)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)  # (nb,1)
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
    sc, mi = _unpack_kquant_scales(blocks[:, 4:16])  # (nb,8) ints
    qs = blocks[:, 16:144].reshape(nb, 4, 32)
    lo = qs & 0x0F
    hi = qs >> 4
    q = np.stack([lo, hi], axis=2).reshape(nb, 256)
    eff_scale = (d * sc.astype(np.float32)).reshape(n_out, k_in // 256, 8)
    eff_min = (dmin * mi.astype(np.float32)).reshape(n_out, k_in // 256, 8)
    # expand 8 sub-blocks of 32 → per-32-block arrays
    scales = eff_scale.reshape(n_out, k_in // 32)
    mins = eff_min.reshape(n_out, k_in // 32)
    return q.reshape(n_out, k_in), scales, mins


def _q5_k_int(raw: np.ndarray, n_out: int, k_in: int):
    """Q5_K → int8 container (values 0..31) + effective scales/mins per 32."""
    from ..gguf.quants import _unpack_kquant_scales as unpack

    if k_in % 256:
        raise ValueError(f"Q5_K requires in-dim % 256 == 0, got {k_in}")
    nb = n_out * k_in // 256
    blocks = raw.reshape(nb, 176)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    dmin = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
    sc, mi = unpack(blocks[:, 4:16])
    qh = blocks[:, 16:48]
    qs = blocks[:, 48:176].reshape(nb, 4, 32)
    j = np.arange(4)
    hb1 = ((qh[:, None, :] >> (2 * j)[None, :, None]) & 1).astype(np.uint8)
    hb2 = ((qh[:, None, :] >> (2 * j + 1)[None, :, None]) & 1).astype(np.uint8)
    lo = (qs & 0x0F) | (hb1 << 4)
    hi = (qs >> 4) | (hb2 << 4)
    q = np.stack([lo, hi], axis=2).reshape(nb, 256)
    scales = (d * sc.astype(np.float32)).reshape(n_out, k_in // 32)
    mins = (dmin * mi.astype(np.float32)).reshape(n_out, k_in // 32)
    return q.reshape(n_out, k_in), scales, mins


def _q6_k_int(raw: np.ndarray, n_out: int, k_in: int):
    """Q6_K → int8 (q-32, symmetric) + effective scales per 16 elements."""
    if k_in % 256:
        raise ValueError(f"Q6_K requires in-dim % 256 == 0, got {k_in}")
    nb = n_out * k_in // 256
    blocks = raw.reshape(nb, 210)
    ql = blocks[:, 0:128].reshape(nb, 2, 64)
    qh = blocks[:, 128:192].reshape(nb, 2, 32)
    sc = blocks[:, 192:208].view(np.int8).astype(np.float32)  # (nb,16)
    d = blocks[:, 208:210].copy().view(np.float16).astype(np.float32)
    q1 = (ql[:, :, :32] & 0x0F) | (((qh >> 0) & 3) << 4)
    q2 = (ql[:, :, 32:] & 0x0F) | (((qh >> 2) & 3) << 4)
    q3 = (ql[:, :, :32] >> 4) | (((qh >> 4) & 3) << 4)
    q4 = (ql[:, :, 32:] >> 4) | (((qh >> 6) & 3) << 4)
    q = np.stack([q1, q2, q3, q4], axis=2).reshape(nb, 256).astype(np.int16) - 32
    scales = (d * sc).reshape(n_out, k_in // 16)
    return q.astype(np.int8).reshape(n_out, k_in), scales, None


def _q2_k_int(raw: np.ndarray, n_out: int, k_in: int):
    """Q2_K → int8 (values 0..3) + effective scales/mins per 16 elements."""
    if k_in % 256:
        raise ValueError(f"Q2_K requires in-dim % 256 == 0, got {k_in}")
    nb = n_out * k_in // 256
    blocks = raw.reshape(nb, 84)
    scales8 = blocks[:, 0:16]
    qs = blocks[:, 16:80].reshape(nb, 2, 32)
    d = blocks[:, 80:82].copy().view(np.float16).astype(np.float32)
    dmin = blocks[:, 82:84].copy().view(np.float16).astype(np.float32)
    shifts = np.arange(4)
    q = ((qs[:, :, None, :] >> (2 * shifts)[None, None, :, None]) & 3)
    q = q.reshape(nb, 256)
    scales = (d * (scales8 & 0x0F).astype(np.float32)).reshape(n_out, k_in // 16)
    mins = (dmin * (scales8 >> 4).astype(np.float32)).reshape(n_out, k_in // 16)
    return q.astype(np.int8).reshape(n_out, k_in), scales, mins


def _q3_k_int(raw: np.ndarray, n_out: int, k_in: int):
    """Q3_K → int8 (signed, hmask applied) + effective scales per 16."""
    from ..gguf.quants import _unpack_q3k_scales

    if k_in % 256:
        raise ValueError(f"Q3_K requires in-dim % 256 == 0, got {k_in}")
    nb = n_out * k_in // 256
    blocks = raw.reshape(nb, 110)
    hmask = blocks[:, 0:32]
    qs = blocks[:, 32:96].reshape(nb, 2, 32)
    sc = _unpack_q3k_scales(blocks[:, 96:108]).astype(np.float32)  # (nb,16)
    d = blocks[:, 108:110].copy().view(np.float16).astype(np.float32)
    shifts = np.arange(4)
    q = ((qs[:, :, None, :] >> (2 * shifts)[None, None, :, None]) & 3).astype(np.int16)
    m = (4 * np.arange(2)[:, None] + shifts[None, :]).reshape(1, 2, 4, 1)
    hb = ((hmask[:, None, None, :] >> m) & 1).astype(np.int16)
    q = q - (1 - hb) * 4
    scales = (d * sc).reshape(n_out, k_in // 16)
    return q.astype(np.int8).reshape(n_out, k_in), scales, None


_INT_DECODERS = {
    GGMLType.Q8_0: ("q8", 32, _q8_0_int),
    GGMLType.Q4_0: ("q4", 32, _q4_0_int),
    GGMLType.Q4_1: ("q4", 32, _q4_1_int),
    GGMLType.Q4_K: ("q4", 32, _q4_k_int),
    GGMLType.Q5_K: ("q8", 32, _q5_k_int),
    GGMLType.Q6_K: ("q8", 16, _q6_k_int),
    GGMLType.Q2_K: ("q8", 16, _q2_k_int),
    GGMLType.Q3_K: ("q8", 16, _q3_k_int),
}

SUPPORTED_QUANT_TYPES = frozenset(_INT_DECODERS)


def pack_gguf_tensor(
    raw: np.ndarray,
    ggml_type: GGMLType,
    shape_out_in: tuple[int, int],
    device_put: bool = True,
    sections: int = 1,
) -> QTensor:
    """Repack a GGUF matmul weight (numpy shape (N_out, K_in)) for the TPU
    kernels. Raises KeyError for unsupported kinds (caller falls back to
    dense dequantized weights). `sections` > 1 packs 4-bit kinds per
    contiguous K-chunk (row-parallel TP shards; no-op for 8-bit kinds)."""
    n_out, k_in = shape_out_in
    kind, group, decode = _INT_DECODERS[ggml_type]
    q, scales, mins = decode(np.ascontiguousarray(raw).view(np.uint8), n_out, k_in)

    scales_t = np.ascontiguousarray(scales.T).astype(SCALE_DTYPE)  # [K/g, N]
    mins_t = (
        np.ascontiguousarray(mins.T).astype(MIN_DTYPE)
        if mins is not None
        else None
    )
    if kind == "q8":
        qs_t = np.ascontiguousarray(q.T, dtype=np.int8)  # [K, N]
        sections = 1
    else:
        ks = k_in // sections  # section length along K
        if ks % 64 or k_in % sections:
            raise ValueError(
                f"4-bit packing requires K/sections % 64 == 0, got "
                f"K={k_in} sections={sections}"
            )
        qt = q.T.astype(np.uint8)  # [K, N], values 0..15
        # per-section split-half packing: byte (i, n) of section c holds
        # k = c*ks + i (low nibble) and k = c*ks + ks/2 + i (high nibble).
        # High nibble biased-signed ((q-8) & 0xF): the kernel decodes with
        # AND + bf16 SUB only (see module docstring).
        qsec = qt.reshape(sections, ks, n_out)
        lo = qsec[:, : ks // 2]
        hi_biased = (qsec[:, ks // 2 :] - 8) & 0x0F
        qs_t = np.ascontiguousarray(
            (lo | (hi_biased << 4)).reshape(k_in // 2, n_out)
        ).view(np.int8)
        # fold /16 into the high-half scales; absorb the -8 bias into mins
        if mins_t is None:
            mins_t = np.zeros_like(scales_t)
        gsec = ks // group  # scale rows per section
        sc_sec = scales_t.reshape(sections, gsec, n_out)
        mn_sec = mins_t.reshape(sections, gsec, n_out)
        mn_sec[:, gsec // 2 :] -= 8.0 * sc_sec[:, gsec // 2 :]
        sc_sec = sc_sec.copy()
        sc_sec[:, gsec // 2 :] /= 16.0
        scales_t = sc_sec.reshape(k_in // group, n_out)
        mins_t = mn_sec.reshape(k_in // group, n_out)

    def put(a):
        return jnp.asarray(a) if (device_put and a is not None) else a

    return QTensor(
        qs=put(qs_t),
        scales=put(scales_t),
        mins=put(mins_t) if mins_t is not None else None,
        kind=kind,
        k=k_in,
        n=n_out,
        group=group,
        sections=sections,
    )


def tp_fused_col_perm(widths: list[int], tp: int) -> np.ndarray:
    """Column order for a TP-interleaved fused projection: shard c's block
    holds [part0_c | part1_c | ...] (each part's c-th 1/tp column slice).
    Returns `perm` with interleaved[:, i] = logical[:, perm[i]]."""
    offs = np.concatenate([[0], np.cumsum(widths)])
    blocks = []
    for c in range(tp):
        for w, o in zip(widths, offs):
            per = w // tp
            blocks.append(np.arange(o + c * per, o + (c + 1) * per))
    return np.concatenate(blocks)


def tp_fused_inv_perm(widths: list[int], tp: int) -> np.ndarray:
    """Inverse permutation restoring logical column order on the OUTPUT of
    an interleaved fused projection: logical = out[:, inv]."""
    return np.argsort(tp_fused_col_perm(widths, tp))


def permute_qtensor_cols(qt: QTensor, perm: np.ndarray) -> QTensor:
    """Reorder a (possibly stacked) v2/q8 container's output columns —
    exact, because both packings are column-independent."""
    if qt.kind not in ("q4", "q8"):
        raise ValueError(f"column permute needs a v2/q8 container, got {qt.kind}")
    take = lambda a: None if a is None else np.asarray(a)[..., perm]
    return qt.replace(qs=take(qt.qs), scales=take(qt.scales),
                      mins=take(qt.mins))


def qtensor_k_section(qt: QTensor, c: int) -> QTensor:
    """Section `c` of a per-section-packed (sections=S) 4-bit container as
    a standalone sections=1 container with k = K/S — each section's
    split-half bytes and scale rows are self-contained by construction
    (pack_gguf_tensor), so this is a pure row slice."""
    s = qt.sections
    ks2 = qt.k // (2 * s)  # packed byte rows per section
    gsec = qt.k // (qt.group * s)  # scale rows per section
    take = lambda a, r: None if a is None else np.asarray(a)[..., c * r:(c + 1) * r, :]
    return qt.replace(
        qs=take(qt.qs, ks2),
        scales=take(qt.scales, gsec),
        mins=take(qt.mins, gsec),
        k=qt.k // s,
        sections=1,
        tp_mode=None,
    )


def pad_qtensor_n(qt: QTensor, multiple: int = 512) -> QTensor:
    """Zero-pad the output (N) axis so the matmul kernels can use wide lane
    tiles. The 128k-vocab LM head (N=128256) only divides 128/256, leaving
    ~1000 grid cells per call; padding to a 512-multiple nearly halves its
    kernel wall time on v5e (qmm_probe2: 660 -> 438 us). `qt.n` stays the
    LOGICAL width — ops.qmatmul slices the padded columns off the output.
    Padded scales/mins are zero so the padded region dequantizes to exactly
    0 (and is sliced away regardless). numpy leaves only (load-time path);
    no-op for sectioned containers and TP-marked weights (per-shard widths
    would stop dividing)."""
    n_phys = qt.qs.shape[-1]
    pad = (-n_phys) % multiple
    if pad == 0 or qt.sections != 1 or qt.tp_mode is not None:
        return qt

    def padn(a):
        if a is None:
            return None
        a = np.asarray(a)
        return np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])

    return qt.replace(qs=padn(qt.qs), scales=padn(qt.scales), mins=padn(qt.mins))


def _pack_v3_words(q: np.ndarray) -> np.ndarray:
    """nibbles q [K, N] (0..15) → int32 "v3 bit-decode" words [K/8, N].

    Each int32 word holds 8 nibbles in 4 "planes" (byte-pair × nibble
    position); plane p decodes the contiguous k-quarter [p*K/4, (p+1)*K/4).
    The placement is chosen so that ``((w << s_p) & 0x00780078) | 0x40004000``
    bitcast to 2 bf16 halfwords yields exactly ``2 + q/8`` with NO int→float
    casts — the v2 nibble container's int8→bf16 casts are ~half its kernel
    time at the 128k-vocab LM-head shape (benchmarks/qmm_probe3.py: 364 µs
    vs 438 µs on v5e). Plane shifts: p0 ``<<3``, p1 ``>>5``, p2 ``>>1``,
    p3 ``>>9``. Halfword h of word row s is plane row 2s+h (little-endian,
    parity-verified on both TPU Mosaic and XLA bitcast_convert_type)."""
    k, n = q.shape
    if k % 8:
        raise ValueError(f"v3 packing requires K % 8 == 0, got {k}")
    kq = k // 4
    planes = [q[i * kq : (i + 1) * kq].astype(np.uint32) for i in range(4)]
    words = np.zeros((k // 8, n), np.uint32)
    for p, (byte_pair, nib_shift) in enumerate(
        [(0, 0), (1, 0), (0, 4), (1, 4)]
    ):
        pr = planes[p]
        for half in (0, 1):
            rows = pr[half::2]
            bit = (half * 2 + byte_pair) * 8 + nib_shift
            words[: rows.shape[0]] |= rows << bit
    return words.view(np.int32)


V3_SHIFTS = (3, -5, -1, -9)  # per-plane shift (positive = left)


def to_v3(qt: QTensor, merge_bytes: int | None = None) -> QTensor:
    """Repack a v2 (split-half nibble) 4-bit container into the v3
    bit-decode container (kind "q4v3"): qs int32 [K/8, N], effective
    scales' = 8·s and mins' = m + 16·s so that
    ``scales'·(2 + q/8) - mins'·(Σx per block) ≡ s·q - m`` — the +2 header
    constant folds into the existing rank-1 mins correction for free.
    Used for the LM head only (decode's widest matmul); returns `qt`
    unchanged when the shape doesn't qualify.

    Containers whose scales array reaches `merge_bytes` (default
    V3_MERGE_BYTES) come back as kind "q4v3m" with scales+mins merged
    row-wise — XLA memory-space assignment was measured re-staging the
    128k-vocab head's 33 MB scales AND mins arrays into alternate memory
    every decode step (2 async copies/step; see V3_MERGE_BYTES)."""
    if (
        qt.kind != "q4"
        or qt.sections != 1
        or qt.tp_mode is not None
        or qt.group != QBLOCK
        or qt.k % 2048
    ):
        return qt
    byte = np.asarray(qt.qs).view(np.uint8)  # [K/2, N]
    k, n_phys = qt.k, byte.shape[-1]
    lo = byte & 0x0F
    hi = ((byte >> 4) + 8) & 0x0F  # un-bias the stored (q-8) & 0xF
    q = np.concatenate([lo, hi], axis=0)  # natural k order
    sc = np.asarray(qt.scales, np.float32).copy()
    mn = (
        np.asarray(qt.mins, np.float32).copy()
        if qt.mins is not None
        else np.zeros_like(sc)
    )
    half = sc.shape[0] // 2
    sc[half:] *= 16.0  # undo the v2 high-half /16 fold
    mn[half:] += 8.0 * sc[half:]  # undo the v2 high-half -8·s bias fold
    sdt = _v3_scale_dtype()
    return QTensor(
        qs=jnp.asarray(_pack_v3_words(q)),
        scales=jnp.asarray(8.0 * sc, sdt),
        mins=jnp.asarray(mn + 16.0 * sc, sdt),
        kind="q4v3",
        k=k,
        n=qt.n,
        group=QBLOCK,
    )


# Stacked containers whose scales array is at least this big store scales
# and mins MERGED in one [L, 2*K/32, N] array (kind "q4v3m"). Reason
# (profile_decode on the 1B q4 decode step): XLA memory-space assignment
# re-staged w_down's 33.5 MB scales AND mins arrays into alternate memory
# on EVERY layer iteration — 32 async copies/step, ~1.07 GB/step of pure
# HBM waste (1.57 ms/step of copy span vs a 2.47 ms step). Arrays at
# gate_up's 67 MB size were never staged, so merging the two 33.5 MB
# arrays past that threshold removes the copies entirely (and halves the
# scale-operand DMA count per grid step as a bonus).
V3_MERGE_BYTES = int(
    os.environ.get("NFAI_V3_MERGE_BYTES", str(32 << 20))
)  # A/B knob: 0 merges every v3 container (halves per-cell scale DMAs —
# the "separate mins DMA" term of the 8B wqkv/wo anatomy, r4)


def to_v3_stacked(qt: QTensor, merge_bytes: int | None = None) -> QTensor:
    """`to_v3` for a layer-stacked QTensor (leaves [L, ...]); used by
    load_params for decode-path layer weights. In-model evidence for the
    switch (8B profile): every v2 nibble kernel runs ~2.05x its HBM-byte
    ideal while the v3 lm_head runs 1.56x — the int8→bf16 casts are a
    uniform ~2x dequant tax the bit-decode avoids. Returns `qt` unchanged
    when ineligible (mixed/sectioned/TP/odd-K containers).

    Containers whose scales array reaches `merge_bytes` (default
    V3_MERGE_BYTES) come back as kind "q4v3m" with scales+mins merged
    row-wise into one array (see V3_MERGE_BYTES)."""
    if (
        qt.kind != "q4"
        or qt.sections != 1
        # column-parallel TP weights MAY convert: the v3 packing is
        # column-independent, so any contiguous column shard of a v3
        # container is itself a valid v3 container (the per-shard kernels
        # under shard_map see a standard local container). Row-parallel
        # (K-sectioned) weights stay v2 — their split-half sections are
        # already per-shard-decodable.
        or qt.tp_mode == "row"
        or qt.group != QBLOCK
        or qt.k % 2048
        or qt.mins is None
        or qt.qs is None
        or qt.qs.ndim != 3  # metadata only — np.asarray here would pull
        # the whole device array through the host (79 s over the TPU tunnel)
    ):
        return qt
    q, sc_eff, mn_eff = _v3_natural(qt)
    words = np.stack([_pack_v3_words(q[i]) for i in range(q.shape[0])])
    sdt = _v3_scale_dtype()
    limit = V3_MERGE_BYTES if merge_bytes is None else merge_bytes
    if sc_eff.nbytes >= limit:
        return QTensor(
            qs=jnp.asarray(words),
            scales=jnp.asarray(np.concatenate([sc_eff, mn_eff], axis=1), sdt),
            mins=None,
            kind="q4v3m",
            k=qt.k,
            n=qt.n,
            group=QBLOCK,
            tp_mode=qt.tp_mode,
            tpi=qt.tpi,
        )
    return QTensor(
        qs=jnp.asarray(words),
        scales=jnp.asarray(sc_eff, sdt),
        mins=jnp.asarray(mn_eff, sdt),
        kind="q4v3",
        k=qt.k,
        n=qt.n,
        group=QBLOCK,
        tp_mode=qt.tp_mode,
        tpi=qt.tpi,
    )


# ---------------------------------------------------------------------------
# q8v3: cast-free bit-decode container for 8-bit weights (kind "q8v3")
#
# The plain q8 kernel's int8→bf16 cast is a ~2x dequant tax (the same wall
# benchmarks/qmm_probe.py measured for q4 before v3). An int8 value is two
# nibbles — v = 16*(v>>4) + (v & 0xF) — so it packs into TWO v3 word sets:
# the lo nibbles decode with the standard 0x4000 header to dl = 2 + ql/8,
# the hi nibbles (biased +8) with a STEP-2 header 0x4200 to dh = 32 + 2*qh
# (exponent 5 puts the nibble at the ones/twos bits). Folding the planes
# in bf16,
#     u0 = (dh − 50) + dl  ∈ [−16, 15.875]  — EXACT in bf16 —  and v ≡ 8·u0,
# so  s·(x·v) − m·Σx  =  (8s)·(x·u0) − m·Σx:  ONE dot per x-plane, the same
# effective-scale convention as q4v3 (8s), the ORIGINAL mins (no affine
# amplification — symmetric kinds like Q8_0 need no block-sum dot at all),
# and per-product bf16 rounding identical to the plain q8 kernel's
# (|8·u0| = |v| ≤ 128). Storage is identical to int8 (two [K/8, N] int32
# word sets = K*N bytes).

V3_HI_HDR = 0x42004200  # step-2 header: ((w<<s) & 0x00780078) | hdr = 32+2q


def _q8v3_words(v8: np.ndarray) -> np.ndarray:
    """int8 values [K, N] → int32 words [K/4, N]: lo-nibble v3 word rows
    [0, K/8), hi-nibble (biased +8) rows [K/8, K/4)."""
    lo = (v8 & 0x0F).astype(np.uint8)
    hi = ((v8 >> 4) + 8).astype(np.uint8) & 0x0F  # arithmetic shift: h+8 ∈ [0,15]
    return np.concatenate([_pack_v3_words(lo), _pack_v3_words(hi)], axis=0)


def q8v3_eligible(qt: "QTensor") -> bool:
    return (
        qt.kind == "q8"
        and qt.sections == 1
        and qt.tp_mode is None
        and qt.group in (16, 32)
        and qt.k % 2048 == 0
        and qt.qs is not None
        and qt.qs.ndim in (2, 3)  # not expert stacks [L, E, ...]
    )


def to_q8v3_stacked(qt: QTensor) -> QTensor:
    """Repack a stacked (or 2D) 8-bit container into the cast-free q8v3
    bit-decode container: qs int32 [L, K/4, N] (lo words | hi words),
    scales = effective 8·s (v ≡ 8·u0, see module comment), mins carried
    over unchanged (None for symmetric kinds — no block-sum dot needed).
    Returns `qt` unchanged when ineligible (odd K, TP, sections)."""
    if not q8v3_eligible(qt):
        return qt
    v8 = np.asarray(qt.qs).view(np.int8)
    sdt = _v3_scale_dtype()
    if v8.ndim == 2:
        words = _q8v3_words(v8)
    else:
        words = np.stack([_q8v3_words(v8[i]) for i in range(v8.shape[0])])
    return QTensor(
        qs=jnp.asarray(words),
        scales=jnp.asarray(8.0 * np.asarray(qt.scales, np.float32), sdt),
        mins=None if qt.mins is None else jnp.asarray(
            np.asarray(qt.mins, np.float32), sdt
        ),
        kind="q8v3",
        k=qt.k,
        n=qt.n,
        group=qt.group,
    )


# ---------------------------------------------------------------------------
# fused-MLP container (kinds "q4mlpg" / "q4mlpd")
#
# ops.fused_mlp runs the whole per-layer MLP — y = (act(x@Wg) * (x@Wu)) @ Wd —
# as ONE Pallas kernel whose grid walks the down-projection's v3 word rows.
# A word-row tile of the down matrix decodes FOUR k-ranges at once (the v3
# planes are k-quarters), so the gate/up columns feeding each grid step are
# the four ranges {p*F/4 + [j*MLP_TFB, (j+1)*MLP_TFB)}. Baking that column
# order into the gate/up container ("q4mlpg") lets one BlockSpec fetch all
# four ranges contiguously — 7 chunky operand DMAs per grid step instead of
# the ~25 a naturally-ordered container needs (the first fused-MLP probe,
# benchmarks/qmm_fused_mlp.py, lost to the two-kernel path on exactly that).
# The down container ("q4mlpd") keeps its v3 words natural and permutes only
# the scale/min ROWS into the same per-step order. Both permutations are
# internal relabelings of the ffn axis — conversion and dequantization are
# exact inverses (see dequant_qtensor).

MLP_TFB = 256  # ffn elements per plane per grid step (baked into the perm)


def mlp_col_perm(f: int, tfb: int = MLP_TFB) -> np.ndarray:
    """ffn-axis permutation: position (j, p, t) ← old column p*F/4 + j*tfb + t
    — grid step j's four down-plane ranges, made contiguous."""
    nj = f // (4 * tfb)
    j, p, t = np.meshgrid(
        np.arange(nj), np.arange(4), np.arange(tfb), indexing="ij"
    )
    return (p * (f // 4) + j * tfb + t).reshape(-1)


def mlp_gu_col_perm(f: int, tfb: int = MLP_TFB) -> np.ndarray:
    """Column permutation of the fused [gate|up] (width 2F) projection:
    grid step j's slab holds [gate cols of step j (4*tfb) | up cols of
    step j (4*tfb)], so ONE BlockSpec of width 8*tfb fetches both
    projections' words (and one fetches both scale blocks) — 5 operand
    DMAs per grid step instead of 7."""
    perm = mlp_col_perm(f, tfb).reshape(-1, 4 * tfb)  # [nj, 4*tfb]
    return np.concatenate([perm, f + perm], axis=1).reshape(-1)


def mlp_tfb_for(gu: "QTensor", dn: "QTensor") -> int | None:
    """Pick the fused-MLP grid-step width (ffn elements per v3 plane per
    step): the largest tfb whose per-grid-step operand blocks fit the
    kernel's VMEM budget at the smallest batch tile. None when no tfb fits
    or the pair fails the layout constraints — the pair then stays on the
    two-kernel path instead of failing at Mosaic compile. (1B-class shapes
    keep 256; 8B's [K=4096, F=14336, H=4096] needs 128 — 256 would put
    ~15.7 MB of double-buffered operands over the 16 MB VMEM.)"""
    from .fused_mlp import _pick_bt, mlp_weight_block_bytes

    f = gu.n // 2
    layout_ok = (
        gu.kind == "q4" and dn.kind == "q4"
        and gu.sections == 1 and dn.sections == 1
        and gu.tp_mode is None and dn.tp_mode is None
        and gu.group == QBLOCK and dn.group == QBLOCK
        and gu.mins is not None and dn.mins is not None
        and gu.qs is not None and gu.qs.ndim == 3
        and dn.qs is not None and dn.qs.ndim == 3
        and gu.n == 2 * f and dn.k == f
        and gu.k % 1024 == 0  # scale rows per x-plane stay a multiple of 8
        and gu.qs.shape[-1] == gu.n  # no N padding
        and dn.qs.shape[-1] == dn.n
    )
    if not layout_ok:
        return None
    sbytes = jnp.dtype(_v3_scale_dtype()).itemsize
    for tfb in (256, 128, 64):
        if f % (4 * tfb):
            continue
        wbytes = mlp_weight_block_bytes(gu.k, dn.n, sbytes, tfb)
        if _pick_bt(8, gu.k, dn.n, wbytes) is not None:
            return tfb
    return None


def mlp_eligible(gu: "QTensor", dn: "QTensor") -> bool:
    """Whether the pair converts to the fused-MLP layout (see mlp_tfb_for)."""
    return mlp_tfb_for(gu, dn) is not None


def _v3_natural(qt: "QTensor"):
    """Stacked v2 q4 → (nibble values [L, K, N] in natural k order,
    effective v3 scales, effective v3 mins) — shared by to_v3_stacked and
    the fused-MLP conversion."""
    byte = np.asarray(qt.qs).view(np.uint8)  # [L, K/2, N]
    lo = byte & 0x0F
    hi = ((byte >> 4) + 8) & 0x0F
    q = np.concatenate([lo, hi], axis=1)  # [L, K, N]
    sc = np.asarray(qt.scales, np.float32).copy()
    mn = np.asarray(qt.mins, np.float32).copy()
    half = sc.shape[1] // 2
    sc[:, half:] *= 16.0
    mn[:, half:] += 8.0 * sc[:, half:]
    return q, 8.0 * sc, mn + 16.0 * sc


def to_v3_mlp_stacked(gu: "QTensor", dn: "QTensor"):
    """Convert a stacked (w_gate_up, w_down) q4 pair to the fused-MLP
    containers ("q4mlpg", "q4mlpd") consumed by ops.fused_mlp. Returns the
    pair unchanged when ineligible. The grid-step width `tfb` is chosen per
    shape (mlp_tfb_for) and baked into the permutations + the container."""
    tfb = mlp_tfb_for(gu, dn)
    if tfb is None:
        return gu, dn
    sdt = _v3_scale_dtype()
    f = gu.n // 2
    perm2 = mlp_gu_col_perm(f, tfb)  # per-step [gate_j | up_j] slabs
    q, sc, mn = _v3_natural(gu)
    q, sc, mn = q[:, :, perm2], sc[:, :, perm2], mn[:, :, perm2]
    words = np.stack([_pack_v3_words(q[i]) for i in range(q.shape[0])])
    gu_out = QTensor(
        qs=jnp.asarray(words),
        scales=jnp.asarray(np.concatenate([sc, mn], axis=1), sdt),
        mins=None, kind="q4mlpg", k=gu.k, n=gu.n, group=QBLOCK, tfb=tfb,
    )
    q, sc, mn = _v3_natural(dn)
    rperm = mlp_col_perm(f, tfb)[:: QBLOCK] // QBLOCK  # scale-row order
    words = np.stack([_pack_v3_words(q[i]) for i in range(q.shape[0])])
    # merged rows grouped PER GRID STEP: [sc rows of step j | min rows of
    # step j] so one BlockSpec fetches both (rows_per_step = 4*tfb/32 each)
    rps = 4 * tfb // QBLOCK
    l, fb, h = sc.shape
    nj = fb // rps
    sp = sc[:, rperm].reshape(l, nj, rps, h)
    mp = mn[:, rperm].reshape(l, nj, rps, h)
    merged = np.concatenate([sp, mp], axis=2).reshape(l, 2 * fb, h)
    dn_out = QTensor(
        qs=jnp.asarray(words),
        scales=jnp.asarray(merged, sdt),
        mins=None, kind="q4mlpd", k=dn.k, n=dn.n, group=QBLOCK, tfb=tfb,
    )
    return gu_out, dn_out


def to_v3_mlp_stacked_tp(gu: "QTensor", dn: "QTensor", tp: int):
    """Per-shard fused-MLP conversion for tensor parallelism: `gu` is the
    TP-interleaved fused gate_up ([gate_c|up_c] per shard, QTensor.tpi ==
    tp) and `dn` the per-section-packed w_down (sections == tp). Each
    shard's LOCAL pair converts to the one-kernel fused-MLP containers
    independently, then the locals concatenate back into one global array
    whose contiguous shard slices are standard q4mlpg/q4mlpd containers —
    the whole-scan shard_map decode path runs the fused MLP kernel per
    shard with a psum after. Returns the pair unchanged when any local
    pair fails the layout/VMEM checks."""
    if (
        gu.kind != "q4" or dn.kind != "q4"
        or gu.tpi != tp or dn.sections != tp
        or gu.n % (2 * tp) or dn.k % tp
    ):
        return gu, dn
    col_w = gu.n // tp  # interleaved [gate_c|up_c] block width
    locals_g, locals_d = [], []
    for c in range(tp):
        sl = lambda a: None if a is None else np.asarray(a)[..., c * col_w:(c + 1) * col_w]
        gu_c = gu.replace(
            qs=sl(gu.qs), scales=sl(gu.scales), mins=sl(gu.mins),
            n=col_w, tpi=0, tp_mode=None,
        )
        dn_c = qtensor_k_section(dn, c)
        g2, d2 = to_v3_mlp_stacked(gu_c, dn_c)
        if g2.kind != "q4mlpg":
            return gu, dn
        locals_g.append(g2)
        locals_d.append(d2)
    tfb = locals_g[0].tfb
    gu_out = QTensor(
        qs=jnp.concatenate([g.qs for g in locals_g], axis=2),
        scales=jnp.concatenate([g.scales for g in locals_g], axis=2),
        mins=None, kind="q4mlpg", k=gu.k, n=gu.n, group=QBLOCK,
        tfb=tfb, tpi=tp, tp_mode="col",
    )
    dn_out = QTensor(
        qs=jnp.concatenate([d.qs for d in locals_d], axis=1),
        scales=jnp.concatenate([d.scales for d in locals_d], axis=1),
        mins=None, kind="q4mlpd", k=dn.k, n=dn.n, group=QBLOCK,
        tfb=tfb, tpi=tp, tp_mode="row",
    )
    return gu_out, dn_out


def _dequant_v3_values(qs32: jax.Array, k: int, hdr: int = 0x40004000) -> jax.Array:
    """v3 words → bf16 [K, N] of (2 + q/8) via XLA bitcast (fallback /
    reference path; the Pallas kernel does the same with pltpu.bitcast).
    `hdr` selects the decode affine map (0x4200...: 32 + 2q, see q8v3)."""
    w = qs32  # [K/8, N] int32
    n = w.shape[-1]
    hdr = jnp.int32(hdr)
    msk = jnp.int32(0x00780078)
    planes = []
    for s in V3_SHIFTS:
        shifted = (w << s) if s > 0 else (w >> -s)
        v = jax.lax.bitcast_convert_type(
            (shifted & msk) | hdr, jnp.bfloat16
        )  # [K/8, N, 2] halfwords (little-endian: [..., h] = row 2s+h)
        planes.append(jnp.swapaxes(v, -1, -2).reshape(k // 4, n))
    return jnp.concatenate(planes, axis=0)  # natural k order


def promote_qtensor(
    qt: QTensor, kind: str, group: int, with_mins: bool
) -> QTensor:
    """Losslessly re-express a QTensor in a wider container so per-layer
    tensors of mixed GGUF kinds can be stacked (Q4_K_M files mix Q6_K and
    Q4_K for ffn_down/attn_v via llama.cpp's use_more_bits).

    - "q4" → "q8": unpack split-half nibbles to int8 [K, N] (bit-exact, 2x
      the qs bytes). The high half's biased-signed nibbles become signed int8
      values with the /16 scale fold undone (scales multiplied back by 16);
    - group g → finer group g' (g % g' == 0): repeat each scale/min row;
    - symmetric → affine: add zero mins (value = s*q - 0).
    """
    if kind == "q4" and qt.kind == "q8":
        raise ValueError("cannot narrow q8 -> q4")
    if qt.group % group:
        raise ValueError(f"cannot regroup {qt.group} -> {group}")
    qs, scales, mins = qt.qs, qt.scales, qt.mins
    if qt.kind == "q4" and kind == "q8":
        s8 = np.asarray(qs).view(np.int8)
        lo = (s8 & 0x0F).astype(np.int8)  # q_lo (0..15)
        hi = (s8 >> 4).astype(np.int8)  # q_hi - 8 (arithmetic shift)
        sec, n = qt.sections, s8.shape[-1]
        lead = s8.shape[:-2]  # optional stacked-layer axis
        ks2 = qt.k // (2 * sec)
        qs = np.concatenate(
            [
                lo.reshape(*lead, sec, ks2, n),
                hi.reshape(*lead, sec, ks2, n),
            ],
            axis=-2,
        ).reshape(*lead, qt.k, n)
        scales = np.asarray(scales).copy()
        gsec = scales.shape[-2] // sec
        sc = scales.reshape(*lead, sec, gsec, n)
        sc[..., gsec // 2 :, :] *= 16.0  # undo the 4-bit fold
        scales = sc.reshape(*lead, qt.k // qt.group, n)
    rep = qt.group // group
    if rep > 1:
        scales = np.repeat(np.asarray(scales), rep, axis=-2)
        mins = np.repeat(np.asarray(mins), rep, axis=-2) if mins is not None else None
    if with_mins and mins is None:
        mins = np.zeros_like(np.asarray(scales))
    return QTensor(
        qs=qs, scales=scales, mins=mins, kind=kind, k=qt.k, n=qt.n,
        group=group, tp_mode=qt.tp_mode,
    )


def unify_qtensors(items: list["QTensor"]) -> list["QTensor"]:
    """Promote a list of same-shape QTensors to one common (kind, group,
    mins) representation so they can be stacked layer-wise."""
    import math

    kind = "q8" if any(it.kind == "q8" for it in items) else "q4"
    group = math.gcd(*(it.group for it in items))
    with_mins = any(it.mins is not None for it in items)
    return [
        it
        if (it.kind == kind and it.group == group
            and (it.mins is not None) == with_mins)
        else promote_qtensor(it, kind, group, with_mins)
        for it in items
    ]


def concat_qtensors(items: list["QTensor"]) -> "QTensor":
    """Concatenate along the output (N) axis — used to fuse QKV / gate+up
    projections into one kernel launch. Kinds/groups/K must match."""
    first = items[0]
    if not all(
        it.kind == first.kind
        and it.group == first.group
        and it.k == first.k
        and it.sections == first.sections
        for it in items
    ):
        raise ValueError("incompatible QTensors for fusion")
    axis = items[0].qs.ndim - 1
    return QTensor(
        qs=np.concatenate([it.qs for it in items], axis=axis),
        scales=np.concatenate([it.scales for it in items], axis=axis),
        mins=(
            np.concatenate([it.mins for it in items], axis=axis)
            if first.mins is not None
            else None
        ),
        kind=first.kind,
        k=first.k,
        n=sum(it.n for it in items),
        group=first.group,
        sections=first.sections,
        tp_mode=first.tp_mode,
    )


# ---------------------------------------------------------------------------
# dequantization (reference path + embedding gather)


def split_v3m(qt: QTensor) -> QTensor:
    """kind "q4v3m" → an equivalent "q4v3" view with separate scales/mins
    (the merged array holds scale rows [0, K/32) then min rows)."""
    kb = qt.k // qt.group
    return qt.replace(
        scales=qt.scales[..., :kb, :],
        mins=qt.scales[..., kb:, :],
        kind="q4v3",
    )


def dequant_qtensor(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Full dense [K, N] dequantization (reference implementation for tests
    and the XLA fallback path)."""
    if qt.kind in ("q4mlpg", "q4mlpd", "q8v3") and qt.qs.ndim != 2:
        # the branches below assume a 2D per-layer slice; a stacked [L, ...]
        # container would silently reshape L into the wrong axis
        raise ValueError(
            f"dequant_qtensor({qt.kind}) needs a per-layer 2D slice, got "
            f"qs.ndim={qt.qs.ndim}; index the layer axis first"
        )
    if qt.kind == "q4mlpg" and qt.tpi:
        # TP-interleaved: each shard block [gate_c|up_c] dequantizes as a
        # standalone local container; reassemble the logical [gate|up]
        tp = qt.tpi
        colw = qt.qs.shape[-1] // tp
        parts = [
            dequant_qtensor(
                qt.replace(qs=qt.qs[:, c * colw:(c + 1) * colw],
                           scales=qt.scales[:, c * colw:(c + 1) * colw],
                           n=colw, tpi=0, tp_mode=None),
                dtype,
            )
            for c in range(tp)
        ]
        gate = jnp.concatenate([p[:, : colw // 2] for p in parts], axis=1)
        up = jnp.concatenate([p[:, colw // 2:] for p in parts], axis=1)
        return jnp.concatenate([gate, up], axis=1)
    if qt.kind == "q4mlpd" and qt.tpi:
        tp = qt.tpi
        qrows = qt.qs.shape[0] // tp
        srows = qt.scales.shape[0] // tp
        return jnp.concatenate(
            [
                dequant_qtensor(
                    qt.replace(qs=qt.qs[c * qrows:(c + 1) * qrows],
                               scales=qt.scales[c * srows:(c + 1) * srows],
                               k=qt.k // tp, tpi=0, tp_mode=None),
                    dtype,
                )
                for c in range(tp)
            ],
            axis=0,
        )
    if qt.kind == "q4mlpg":
        # merged scales + per-step [gate_j|up_j] column slabs (see
        # to_v3_mlp_stacked): dequantize in physical order, then
        # un-permute the columns
        inv = np.argsort(mlp_gu_col_perm(qt.n // 2, qt.tfb or MLP_TFB))
        w = dequant_qtensor(split_v3m(qt.replace(kind="q4v3m")), dtype)
        return w[:, inv]
    if qt.kind == "q4mlpd":
        # natural v3 words; scale/min rows are permuted AND interleaved per
        # grid step ([sc rows of step j | min rows of step j])
        tfb = qt.tfb or MLP_TFB
        rperm = mlp_col_perm(qt.k, tfb)[:: QBLOCK] // QBLOCK
        inv = np.argsort(rperm)
        kb = qt.k // qt.group
        rps = 4 * tfb // QBLOCK
        h = qt.scales.shape[-1]
        grouped = qt.scales.reshape(-1, 2 * rps, h)
        nj = grouped.shape[0]
        sc = grouped[:, :rps].reshape(nj * rps, h)[inv]
        mn = grouped[:, rps:].reshape(nj * rps, h)[inv]
        qt = qt.replace(scales=sc, mins=mn, kind="q4v3")
    if qt.kind == "q8v3":
        # u0 = (dh − 50) + dl (exact bf16; v ≡ 8·u0), scales hold 8s
        nw = qt.k // 8
        dl = _dequant_v3_values(qt.qs[:nw], qt.k)
        dh = _dequant_v3_values(qt.qs[nw:], qt.k, hdr=V3_HI_HDR)
        u0 = ((dh - jnp.bfloat16(50)) + dl).astype(jnp.float32)
        rep = partial(jnp.repeat, repeats=qt.group, axis=0)
        w = u0 * rep(qt.scales.astype(jnp.float32))
        if qt.mins is not None:
            w = w - rep(qt.mins.astype(jnp.float32))
        if w.shape[-1] != qt.n:
            w = w[..., : qt.n]
        return w.astype(dtype)
    if qt.kind == "q4v3m":
        qt = split_v3m(qt)
    scales = jnp.repeat(qt.scales, qt.group, axis=0)  # [K, N]
    if qt.kind == "q8":
        w = qt.qs.astype(jnp.float32) * scales
    elif qt.kind == "q4v3":
        w = _dequant_v3_values(qt.qs, qt.k).astype(jnp.float32) * scales
    else:
        lo = (qt.qs & 0x0F).astype(jnp.float32)  # q_lo (0..15)
        hi16 = qt.qs.astype(jnp.float32) - lo  # 16*(q_hi - 8), exact
        s, n = qt.sections, qt.qs.shape[-1]
        ks2 = qt.k // (2 * s)  # half-section length
        # per-section split-half order: [lo_c | hi_c] for each K-chunk c
        q = jnp.concatenate(
            [
                lo.reshape(s, ks2, n),
                hi16.reshape(s, ks2, n),
            ],
            axis=1,
        ).reshape(qt.k, n)
        w = q * scales  # high-half scales are pre-divided by 16
    if qt.mins is not None:
        w = w - jnp.repeat(qt.mins, qt.group, axis=0)
    if w.shape[-1] != qt.n:  # N-padded container (pad_qtensor_n)
        w = w[..., : qt.n]
    return w.astype(dtype)


def dequant_gather(qt: QTensor, token_ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Embedding lookup from a head-layout QTensor: rows of W^T, i.e. columns
    of the [K, N] tensor. token_ids [...] → [..., K]. Used when the embedding
    table is stored quantized in LM-head layout (tied weights,
    reference: LlamaModel.cs:64-67)."""
    if qt.sections != 1:
        raise ValueError("dequant_gather expects an unsectioned table")
    cols_q = jnp.take(qt.qs, token_ids, axis=1)  # [K(/2), ...]
    cols_q = jnp.moveaxis(cols_q, 0, -1)  # [..., K(/2)]
    scales = jnp.moveaxis(jnp.take(qt.scales, token_ids, axis=1), 0, -1)
    scales = jnp.repeat(scales, qt.group, axis=-1)  # [..., K]
    if qt.kind == "q8":
        w = cols_q.astype(jnp.float32) * scales
    else:
        lo = (cols_q & 0x0F).astype(jnp.float32)
        hi16 = cols_q.astype(jnp.float32) - lo  # 16*(q_hi - 8)
        w = jnp.concatenate([lo, hi16], axis=-1) * scales
    if qt.mins is not None:
        mins = jnp.moveaxis(jnp.take(qt.mins, token_ids, axis=1), 0, -1)
        w = w - jnp.repeat(mins, qt.group, axis=-1)
    return w.astype(dtype)
