"""Llama-family model: config from GGUF metadata, weight loading, forward pass.

Parity target: ``NFAI.Models.Llama3/LlamaModel.cs`` — hyperparams from metadata
(:23-39), embed → N transformer blocks → final RMSNorm → tied LM head
(:50-67); and ``NFAI.Vulkan.Shaders/TransformerBlock.cs`` (:127-184) for the
per-block op sequence. Unlike the reference, the whole token step (all blocks,
residuals, LM head) is one jitted XLA program — no host round-trips
(quirk ledger: CPU residual adds, TransformerBlock.cs:151-161,174-181).

The forward is written over a layer-stacked params pytree and scanned with
`jax.lax.scan`, keeping compile time O(1) in depth.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFFile, Keys
from ..ops import compute_inv_freq, rms_norm
from ..ops.rope import apply_rope_cs, rope_cos_sin
from ..ops.qmatmul import linear
from ..ops.qtensor import QTensor, dequant_gather

NEG_INF = -1e30


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int
    hidden_size: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    ffn_dim: int
    rms_eps: float = 1e-5
    rope_base: float = 500000.0
    rope_scaling_type: str = "none"
    rope_scaling_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_ctx: int = 8192
    context_length: int = 8192
    tied_embeddings: bool = True
    attn_bias: bool = False  # qwen2-style q/k/v biases
    qk_norm: bool = False  # qwen3-style per-head q/k rmsnorm
    rope_neox: bool = False  # ggml NEOX rope (qwen2/3, gemma) vs NORM (llama)
    activation: str = "silu"  # MLP gate activation ("silu" | "gelu")
    embed_scale: float = 1.0  # gemma multiplies embeddings by sqrt(hidden)
    # runtime parallel modes (static so jit traces the right branch; the
    # mesh objects ride the module globals _SP_CTX/_EP_CTX set by the
    # engine): sp_axis = sequence-parallel S-sharded cache, ep_axis =
    # expert-parallel E-sharded expert stacks
    sp_axis: str = ""
    ep_axis: str = ""

    # gemma2/3 extensions
    attn_softcap: float = 0.0  # gemma2: scores = cap*tanh(scores/cap)
    final_softcap: float = 0.0  # gemma2: same cap on the LM-head logits
    sliding_window: int = 0  # local-attention window (gemma2/3)
    swa_pattern: int = 0  # layer i is LOCAL iff (i+1) % pattern != 0
    post_norms: bool = False  # gemma2/3 post_attention/post_ffw rmsnorms
    attn_scale: float = 0.0  # 0 -> 1/sqrt(head_dim); gemma2 uses
    # 1/sqrt(hidden/n_heads) (query_pre_attn_scalar)
    rope_base_local: float = 0.0  # gemma3 local layers' rope base (10k)
    # mixture-of-experts (qwen3moe): 0 experts = dense FFN
    n_experts: int = 0
    n_experts_used: int = 0
    moe_ffn_dim: int = 0
    norm_topk_prob: bool = True

    def layer_is_local(self, i: int) -> bool:
        """Sliding-window (local) layer per llama.cpp's swa_pattern: every
        `pattern`-th layer is global, the rest are local (gemma2: 2,
        gemma3: 6)."""
        return self.swa_pattern > 0 and (i + 1) % self.swa_pattern != 0

    def layer_windows(self) -> list[int]:
        """Per-layer attention window (0 = unlimited)."""
        return [
            self.sliding_window if self.layer_is_local(i) else 0
            for i in range(self.n_layers)
        ]

    @property
    def query_scale(self) -> float:
        return self.attn_scale or 1.0 / (self.head_dim**0.5)

    @classmethod
    def from_gguf(cls, g: GGUFFile) -> "LlamaConfig":
        """Read hyperparams from metadata (reference: LlamaModel.cs:23-39 —
        which looked `epsilon` up by substring; here keys are exact)."""
        md = g.metadata
        arch = g.architecture

        def key(template, default=None):
            v = md.get(template.format(arch=arch))
            return default if v is None else v

        n_experts = int(key(Keys.EXPERT_COUNT, 0) or 0)
        n_heads = int(key(Keys.HEAD_COUNT))
        hidden = int(key(Keys.EMBEDDING_LENGTH))
        head_dim = int(key(Keys.KEY_LENGTH, hidden // n_heads))
        n_kv = int(key(Keys.HEAD_COUNT_KV, n_heads))
        vocab = key(Keys.VOCAB_SIZE)
        if vocab is None:
            vocab = len(md[Keys.TOKENIZER_TOKENS])
        scaling_type = str(key(Keys.ROPE_SCALING_TYPE, "none"))
        return cls(
            vocab_size=int(vocab),
            hidden_size=hidden,
            n_layers=int(key(Keys.BLOCK_COUNT)),
            n_heads=n_heads,
            n_kv_heads=n_kv,
            head_dim=head_dim,
            ffn_dim=int(key(Keys.FEED_FORWARD_LENGTH)),
            rms_eps=float(key(Keys.LAYERNORM_RMS_EPS, 1e-5)),
            rope_base=float(key(Keys.ROPE_FREQ_BASE, 10000.0)),
            rope_scaling_type=scaling_type,
            rope_scaling_factor=float(key(Keys.ROPE_SCALING_FACTOR, 1.0)),
            rope_low_freq_factor=float(key(Keys.ROPE_SCALING_LOW_FREQ, 1.0)),
            rope_high_freq_factor=float(key(Keys.ROPE_SCALING_HIGH_FREQ, 4.0)),
            rope_original_ctx=int(key(Keys.ROPE_SCALING_ORIG_CTX, 8192)),
            context_length=int(key(Keys.CONTEXT_LENGTH, 8192)),
            tied_embeddings="output.weight" not in g.tensors,
            attn_bias="blk.0.attn_q.bias" in g.tensors,
            qk_norm="blk.0.attn_q_norm.weight" in g.tensors,
            # ggml rope type is per-architecture: llama/mistral GGUFs carry
            # the HF->ggml permutation (NORM, adjacent pairs); qwen-family,
            # gemma, and phi3 checkpoints are unpermuted (NEOX, half-split)
            rope_neox=arch in (
                "qwen2", "qwen3", "gemma", "gemma2", "gemma3", "phi3",
                "qwen3moe",
            ),
            activation="gelu" if arch.startswith("gemma") else "silu",
            embed_scale=(
                float(hidden) ** 0.5 if arch.startswith("gemma") else 1.0
            ),
            # gemma2: tanh softcaps + alternating sliding window + post
            # norms + query_pre_attn_scalar = hidden/n_heads;
            # gemma3: 5-local:1-global window pattern, dual rope bases
            # (local layers 10k), qk-norm, no softcaps
            attn_softcap=float(key("{arch}.attn_logit_softcapping", 0.0) or 0.0),
            final_softcap=float(
                key("{arch}.final_logit_softcapping", 0.0) or 0.0
            ),
            sliding_window=(
                int(key("{arch}.attention.sliding_window", 0) or 0)
                if arch in ("gemma2", "gemma3")
                else 0
            ),
            swa_pattern={"gemma2": 2, "gemma3": 6}.get(arch, 0),
            post_norms="blk.0.post_attention_norm.weight" in g.tensors,
            attn_scale=(
                (float(hidden) / n_heads) ** -0.5 if arch == "gemma2" else 0.0
            ),
            rope_base_local=(
                float(key("{arch}.rope.freq_base_swa", 10000.0) or 10000.0)
                if arch == "gemma3"
                else 0.0
            ),
            n_experts=n_experts,
            n_experts_used=int(key(Keys.EXPERT_USED_COUNT, 0) or 0),
            moe_ffn_dim=int(
                md.get(f"{arch}.expert_feed_forward_length", 0) or 0
            ),
        )


class KVCache(NamedTuple):
    """Dense per-layer KV cache. k/v: [L, B, S_max, KVD] with KVD = H_kv * D
    (head-major columns: column h*D + d is head h, dim d).

    Merged-lane layout: one S-block is a [s_block, KVD] tile holding every
    head's keys for those positions — the fused decode kernel
    (ops.fused_decode) streams it with one contiguous DMA per block and does
    ONE MXU dot for all heads (block-diagonal query trick). Writing a token
    is one contiguous KVD-row write. Per layer, [B, S, KVD] reshapes
    zero-copy to the [B, S, H_kv, D] view the prefill kernel and the einsum
    fallback use, and tensor-parallel sharding splits the KVD axis (whole
    heads per shard, since columns are head-major).

    Quantized cache (EngineConfig.kv_dtype="int8"): k/v are int8 and
    ks/vs hold per-(token, kv-head) f32 scales stored TIME-MINOR as
    [L, B, H_kv, S_max] (a [.., S, Hkv] layout would pad Hkv≈8 lanes to
    128 on TPU — 16x the physical bytes). Halves decode's attention HBM
    traffic; the scale factors out of the D-contraction in both attention
    dots, so the kernels apply it per score column (k) / fold it into the
    softmax weights (v) instead of dequantizing elementwise
    (ops.fused_decode).
    """

    k: jax.Array
    v: jax.Array
    ks: jax.Array | None = None  # [L, B, Hkv, S] f32 (int8 cache only)
    vs: jax.Array | None = None

    @classmethod
    def zeros(
        cls, cfg: LlamaConfig, batch: int, max_seq: int, dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "KVCache":
        shape = (
            cfg.n_layers, batch, max_seq, cfg.n_kv_heads * cfg.head_dim,
        )
        if quantized:
            sshape = (cfg.n_layers, batch, cfg.n_kv_heads, max_seq)
            return cls(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32),
            )
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.ks is not None


def quantize_kv(x: jax.Array, n_heads: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-(…, head) int8 quantization of K/V rows.

    x [..., H*D] (merged-lane) → (int8 [..., H*D], scales f32 [..., H]).
    """
    lead = x.shape[:-1]
    d = x.shape[-1] // n_heads
    xh = x.reshape(*lead, n_heads, d).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xh), axis=-1)  # [..., H]
    scale = jnp.maximum(amax, 1e-20) / 127.0
    q = jnp.clip(jnp.round(xh / scale[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(*lead, n_heads * d), scale


def dequant_kv(
    q: jax.Array,  # [B, S, KVD] int8
    scale: jax.Array,  # [B, H, S] f32 (time-minor)
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Dense dequantization for the XLA attention paths (prefill / fallback)."""
    b, s, kvd = q.shape
    h = scale.shape[1]
    xh = q.reshape(b, s, h, kvd // h).astype(jnp.float32) * (
        scale.transpose(0, 2, 1)[..., None]
    )
    return xh.reshape(b, s, kvd).astype(dtype)


def _write_scales(
    scales_l: jax.Array,  # [B, H, S] f32 time-minor
    new: jax.Array,  # [B, T, H] per-token scales from quantize_kv
    starts: jax.Array,
    uniform_start: bool,
) -> jax.Array:
    """Scale-row writes matching _write_cache's offset semantics."""
    newt = new.transpose(0, 2, 1).astype(scales_l.dtype)  # [B, H, T]
    if uniform_start:
        return jax.lax.dynamic_update_slice(
            scales_l, newt, (0, 0, starts[0])
        )

    def upd(c, n, s):  # c: [H, S], n: [H, T]
        return jax.lax.dynamic_update_slice(c, n, (0, s))

    return jax.vmap(upd)(scales_l, newt, starts)


# ---------------------------------------------------------------------------
# weight loading

_LAYER_TENSORS = {
    "attn_norm": "blk.{i}.attn_norm.weight",
    "wq": "blk.{i}.attn_q.weight",
    "wk": "blk.{i}.attn_k.weight",
    "wv": "blk.{i}.attn_v.weight",
    "wo": "blk.{i}.attn_output.weight",
    "ffn_norm": "blk.{i}.ffn_norm.weight",
    "w_gate": "blk.{i}.ffn_gate.weight",
    "w_up": "blk.{i}.ffn_up.weight",
    "w_down": "blk.{i}.ffn_down.weight",
}

# present only for some architectures (qwen2 biases, qwen3 q/k norms);
# loaded when the config flags say so
_OPTIONAL_LAYER_TENSORS = {
    "wq_bias": ("blk.{i}.attn_q.bias", "attn_bias"),
    "wk_bias": ("blk.{i}.attn_k.bias", "attn_bias"),
    "wv_bias": ("blk.{i}.attn_v.bias", "attn_bias"),
    "q_norm": ("blk.{i}.attn_q_norm.weight", "qk_norm"),
    "k_norm": ("blk.{i}.attn_k_norm.weight", "qk_norm"),
    # gemma2/3 post-block norms (applied to the sub-block output BEFORE the
    # residual add; the GGUF converter folds the +1 into the weights)
    "post_attn_norm": ("blk.{i}.post_attention_norm.weight", "post_norms"),
    "post_ffw_norm": ("blk.{i}.post_ffw_norm.weight", "post_norms"),
}


def load_params(
    g: GGUFFile,
    cfg: LlamaConfig,
    dtype: Any = jnp.bfloat16,
    device_put: bool = True,
    quantized: bool | str = False,
    fuse: bool = True,
    tp: int = 1,
) -> dict:
    """Load GGUF weights into a layer-stacked params pytree.

    With `fuse` (default), the Q/K/V and gate/up projections are concatenated
    along the output dim into single matmuls ("wqkv", "w_gate_up") when their
    quantization kinds allow — one kernel launch instead of three/two. Pass
    ``fuse=False`` for tensor-parallel loading (sharding fused projections
    would interleave sections across devices).

    Dense matmul weights are stored transposed to (in, out) so the forward is
    plain ``x @ w``; norm weights stay float32. With ``quantized="auto"``,
    matmul weights whose GGUF type has a fused-kernel layout stay quantized
    in HBM as `QTensor`s (ops.qtensor) — including the tied embedding/LM-head
    table, which is then stored once in head layout and gathered for lookups.
    With ``device_put=False`` the tree stays in numpy (callers then
    `jax.device_put` onto a sharding pytree).

    ``tp`` > 1 marks quantized weights with their Megatron role
    (``QTensor.tp_mode``) and packs row-parallel 4-bit containers per
    K-section so each chip's shard is self-contained — ops.qmatmul then
    runs the Pallas kernels per-shard under shard_map. Weights whose shape
    does not shard cleanly stay unmarked (GSPMD dequant fallback).
    """
    from ..ops.qtensor import SUPPORTED_QUANT_TYPES, pack_gguf_tensor

    quant_on = bool(quantized)

    # Megatron roles by GGUF tensor name fragment (None -> replicated-ish,
    # handled by GSPMD): row-parallel weights contract over the sharded axis
    _TP_ROLES = (
        ("attn_output", "row"),
        ("ffn_down", "row"),
        ("attn_qkv", "col"),
        ("attn_q", "col"),
        ("attn_k", "col"),
        ("attn_v", "col"),
        ("ffn_gate", "col"),
        ("ffn_up", "col"),
        ("output.weight", "col"),
        ("token_embd", "col"),  # tied LM head in head layout [K, vocab]
    )

    def tp_role(tensor_name: str) -> str | None:
        if tp <= 1 or "_exps" in tensor_name or "ffn_gate_inp" in tensor_name:
            return None
        for frag, role in _TP_ROLES:
            if frag in tensor_name:
                return role
        return None

    def mark_tp(qt: QTensor, role: str | None) -> QTensor:
        """Attach the Megatron role when the per-shard view satisfies the
        kernel layout constraints; otherwise leave unmarked (GSPMD dequant)."""
        from ..ops.qmatmul import kernel_supported

        if role is None:
            return qt
        if role == "col":
            ok = qt.n % tp == 0 and (qt.n // tp) % 128 == 0 and kernel_supported(
                qt.replace(qs=None, scales=None, mins=None, n=qt.n // tp)
            )
        else:
            ok = (
                qt.k % (tp * qt.group) == 0
                and (qt.kind == "q8" or qt.sections == tp)
                and kernel_supported(
                    qt.replace(
                        qs=None, scales=None, mins=None,
                        k=qt.k // tp, sections=1,
                    )
                )
            )
        return qt.replace(tp_mode=role) if ok else qt

    def put(name: str, arr):
        if not device_put or arr is None:
            return arr
        return jax.tree.map(jnp.asarray, arr)

    def quantizable(tensor_name: str) -> bool:
        if not quant_on:
            return False
        desc = g.tensors[tensor_name]
        if desc.ggml_type not in SUPPORTED_QUANT_TYPES:
            return False
        n_out, k_in = desc.shape
        # kernel layout constraints (lane dim 128; 4-bit split halves)
        return k_in % 64 == 0 and n_out % 128 == 0

    def mat3(tensor_name: str):
        """Expert tensor [E, out, in] -> stacked QTensor [E, ...] (weights
        stay quantized in HBM; ggml ships MoE checkpoints quantized, and
        dense-dequantized experts would multiply the footprint ~4x) or a
        dense [E, in, out] array for unsupported kinds."""
        desc = g.tensors[tensor_name]
        e, n_out, k_in = desc.shape
        if (
            quant_on
            and desc.ggml_type in SUPPORTED_QUANT_TYPES
            and k_in % 64 == 0
            and n_out % 128 == 0
        ):
            raw = np.ascontiguousarray(g.tensor_bytes(tensor_name)).view(
                np.uint8
            ).reshape(-1)
            per = raw.size // e  # experts are contiguous (ne[0]=k fastest)
            parts = [
                pack_gguf_tensor(
                    raw[i * per:(i + 1) * per], desc.ggml_type,
                    (n_out, k_in), device_put=False,
                )
                for i in range(e)
            ]
            f = parts[0]
            qt = QTensor(
                np.stack([p.qs for p in parts]),
                np.stack([p.scales for p in parts]),
                np.stack([p.mins for p in parts])
                if f.mins is not None else None,
                f.kind, k_in, n_out, f.group,
            )
            from ..ops.qmatmul import grouped_supported
            from ..ops.qtensor import promote_qtensor

            if not grouped_supported(
                qt.replace(qs=None, scales=None, mins=None)
            ):
                # small-K 4-bit experts (qwen3moe down: K = moe_ffn, often
                # 256..768) fail the kernel's scale-sublane constraint in
                # split-half form; the q8 container keeps whole-k tiles
                # (2x the qs bytes, still 2x under bf16)
                qt = promote_qtensor(qt, "q8", qt.group,
                                     qt.mins is not None)
            if grouped_supported(qt.replace(qs=None, scales=None,
                                            mins=None)):
                return qt
        return np.ascontiguousarray(
            g.tensor_f32(tensor_name).transpose(0, 2, 1)
        ).astype(dtype)

    def mat(tensor_name: str):
        if "_exps" in tensor_name:
            return mat3(tensor_name)
        if quantizable(tensor_name):
            desc = g.tensors[tensor_name]
            role = tp_role(tensor_name)
            n_out, k_in = desc.shape
            sections = 1
            if role == "row" and k_in % tp == 0 and (k_in // tp) % 64 == 0:
                sections = tp  # per-shard split-half packing (4-bit kinds)
            qt = pack_gguf_tensor(
                g.tensor_bytes(tensor_name), desc.ggml_type, desc.shape,
                device_put=False, sections=sections,
            )
            return mark_tp(qt, role)
        # dense fallback: (out, in) -> (in, out); fused native pass when built
        return g.tensor_f32_transposed(tensor_name).astype(dtype)

    def stack(items):
        """Stack per-layer params; QTensors stack leaf-wise (scan slices them
        back per layer). Mixed quant kinds across layers (Q4_K_M files mix
        Q6_K/Q4_K for ffn_down/attn_v) are promoted losslessly to a common
        container; a quantized/dense mix dequantizes the whole stack."""
        from ..ops.qtensor import dequant_qtensor, unify_qtensors

        if any(isinstance(it, QTensor) for it in items):
            if not all(isinstance(it, QTensor) for it in items):
                items = [
                    np.asarray(dequant_qtensor(it), dtype)
                    if isinstance(it, QTensor)
                    else it
                    for it in items
                ]
                return np.stack(items)
            if not all(
                it.kind == items[0].kind
                and it.group == items[0].group
                and (it.mins is None) == (items[0].mins is None)
                for it in items
            ):
                items = unify_qtensors(items)
            modes = {it.tp_mode for it in items}
            return QTensor(
                qs=np.stack([it.qs for it in items]),
                scales=np.stack([it.scales for it in items]),
                mins=(
                    np.stack([it.mins for it in items])
                    if items[0].mins is not None
                    else None
                ),
                kind=items[0].kind,
                k=items[0].k,
                n=items[0].n,
                group=items[0].group,
                sections=items[0].sections,
                # a layer that failed the per-shard layout check forces the
                # whole stack onto the GSPMD fallback (scan needs one mode)
                tp_mode=modes.pop() if len(modes) == 1 else None,
                tpi=items[0].tpi,
            )
        return np.stack(items)

    templates = dict(_LAYER_TENSORS)
    if cfg.n_experts:
        # MoE layers: router + stacked expert tensors replace the dense FFN
        for k in ("w_gate", "w_up", "w_down"):
            templates.pop(k)
        templates["router"] = "blk.{i}.ffn_gate_inp.weight"
        templates["w_gate_exps"] = "blk.{i}.ffn_gate_exps.weight"
        templates["w_up_exps"] = "blk.{i}.ffn_up_exps.weight"
        templates["w_down_exps"] = "blk.{i}.ffn_down_exps.weight"
    # phi3-style checkpoints ship pre-fused projections: map them straight
    # onto the fused keys the forward already understands
    if "blk.0.attn_qkv.weight" in g.tensors:
        for k in ("wq", "wk", "wv"):
            templates.pop(k)
        templates["wqkv"] = "blk.{i}.attn_qkv.weight"
    if "blk.0.ffn_gate.weight" not in g.tensors and "blk.0.ffn_up.weight" in g.tensors:
        up_out = g.tensors["blk.0.ffn_up.weight"].shape[0]
        if up_out == 2 * cfg.ffn_dim:  # fused [gate; up]
            templates.pop("w_gate")
            templates.pop("w_up")
            templates["w_gate_up"] = "blk.{i}.ffn_up.weight"
    for key_name, (template, flag) in _OPTIONAL_LAYER_TENSORS.items():
        if getattr(cfg, flag):
            templates[key_name] = template
    layers: dict[str, list] = {k: [] for k in templates}
    for i in range(cfg.n_layers):
        for key_name, template in templates.items():
            t = template.format(i=i)
            if key_name.endswith(("norm", "bias")):
                layers[key_name].append(g.tensor_f32(t).astype(np.float32))
            else:
                layers[key_name].append(mat(t))
    if not cfg.rope_neox and "wq" in layers:
        # NORM-convention checkpoints (llama/mistral: HF->ggml permutation
        # baked into wq/wk) are converted back to the half-split NEOX layout
        # here, so the hot loop always runs the shuffle-free rope (the
        # adjacent-pair rotation costs lane interleaves on TPU). Scores are
        # invariant: q and k columns permute together. See ops.rope.
        from ..ops.rope import norm_to_neox_perm

        def permute_cols(w, perm):
            if isinstance(w, QTensor):
                return w.replace(
                    qs=w.qs[:, perm], scales=w.scales[:, perm],
                    mins=None if w.mins is None else w.mins[:, perm],
                )
            return np.ascontiguousarray(w[:, perm])

        q_perm = norm_to_neox_perm(cfg.n_heads, cfg.head_dim)
        k_perm = norm_to_neox_perm(cfg.n_kv_heads, cfg.head_dim)
        layers["wq"] = [permute_cols(w, q_perm) for w in layers["wq"]]
        layers["wk"] = [permute_cols(w, k_perm) for w in layers["wk"]]
        if "wq_bias" in layers:
            layers["wq_bias"] = [b[q_perm] for b in layers["wq_bias"]]
            layers["wk_bias"] = [b[k_perm] for b in layers["wk_bias"]]
        if "q_norm" in layers:  # defensive: NORM + qk_norm combination
            within = q_perm[: cfg.head_dim]
            layers["q_norm"] = [w[within] for w in layers["q_norm"]]
            layers["k_norm"] = [w[within] for w in layers["k_norm"]]
    if fuse:
        if tp > 1:
            # per-shard interleaved fusion (only QTensor groups fully
            # marked "col" fuse; the rest stay split for the unfused path)
            _fuse_projections_tp(layers, cfg, tp)
        else:
            _fuse_projections(layers, cfg)
    from ..ops.qtensor import (
        to_q8v3_stacked, to_v3_mlp_stacked, to_v3_mlp_stacked_tp,
        to_v3_stacked,
    )

    # eligible 4-bit layer weights repack to the cast-free v3 bit-decode
    # container (ops.qtensor; ~2.05x -> ~1.6x of the HBM-byte ideal in the
    # decode kernels). No-op for q8/sectioned/row-TP/MoE/odd-K leaves.
    raw = {k: stack(v) for k, v in layers.items()}
    if (
        os.environ.get("NFAI_FUSED_MLP", "1") != "0"
        and isinstance(raw.get("w_gate_up"), QTensor)
        and isinstance(raw.get("w_down"), QTensor)
    ):
        # gate_up/down pairs convert to the one-kernel fused-MLP containers
        # (ops.fused_mlp; no-op when ineligible — odd dims, q8). Under TP
        # the conversion runs per shard (interleaved gate_up + sectioned
        # down), keeping each shard a standalone fused-MLP container.
        if tp > 1:
            raw["w_gate_up"], raw["w_down"] = to_v3_mlp_stacked_tp(
                raw["w_gate_up"], raw["w_down"], tp
            )
        else:
            raw["w_gate_up"], raw["w_down"] = to_v3_mlp_stacked(
                raw["w_gate_up"], raw["w_down"]
            )
    def repack(s):
        # 4-bit → v3 bit-decode; 8-bit stays in the plain q8 container by
        # DEFAULT: the q8v3 cast-free bit-decode measured SLOWER on its
        # target config once the scale-expand dequant landed (3B Q8 b8:
        # 1127 tok/s q8v3 vs 1217 plain, r4 head-to-head on identical
        # kernels elsewhere — the 2-nibble-plane decode costs more VPU than
        # the int8->bf16 cast it removes). NFAI_Q8V3=1 re-enables it.
        s = to_v3_stacked(s)
        if os.environ.get("NFAI_Q8V3", "0") != "0" and getattr(
            s, "qs", None
        ) is not None and s.qs.ndim == 3:
            s = to_q8v3_stacked(s)
        return s

    stacked = {
        k: put(k, repack(s) if isinstance(s, QTensor) else s)
        for k, s in raw.items()
    }

    from ..ops.qtensor import pad_qtensor_n

    if cfg.tied_embeddings:
        if quantizable("token_embd.weight"):
            # one quantized table in head layout [K=hidden, N=vocab]; the
            # forward gathers embedding rows from it (tied weights,
            # reference: LlamaModel.cs:64-67)
            embed = None
            lm_head = pad_qtensor_n(mat("token_embd.weight"))
        else:
            embed = g.tensor_f32("token_embd.weight").astype(dtype)
            lm_head = np.ascontiguousarray(
                g.tensor_f32("token_embd.weight").T
            ).astype(dtype)
    else:
        embed = g.tensor_f32("token_embd.weight").astype(dtype)
        lm_head = mat("output.weight")
        if isinstance(lm_head, QTensor):
            lm_head = pad_qtensor_n(lm_head)
            if lm_head.n > 16384:
                # wide-vocab 4-bit heads repack to the cast-free v3
                # bit-decode container (ops.qtensor.to_v3; no-op for other
                # kinds/shapes). Tied tables stay v2 — dequant_gather needs
                # the nibble layout for embedding lookups.
                from ..ops.qtensor import to_v3

                lm_head = to_v3(lm_head)
            if (
                lm_head.kind == "q8"
                and os.environ.get("NFAI_Q8V3", "0") != "0"
            ):
                # 8-bit heads take the cast-free q8v3 container at any
                # width (same integer grid; no gather consumer to preserve)
                lm_head = to_q8v3_stacked(lm_head)

    if "rope_freqs.weight" in g.tensors:
        # llama.cpp stores per-dim frequency *divisors* (freq_factors,
        # values ~1..scaling_factor) for 3.1+: ggml computes
        # theta = pos * inv_freq[i] / freq_factors[i], so the effective
        # inverse frequency is base_inv_freq / factors (NOT the tensor
        # itself — using it directly would make angles pos*factor).
        factors = g.tensor_f32("rope_freqs.weight").astype(np.float64)
        base_inv = 1.0 / (
            cfg.rope_base
            ** (np.arange(0, cfg.head_dim, 2, dtype=np.float64) / cfg.head_dim)
        )
        inv_freq = (base_inv / factors).astype(np.float32)
    else:
        inv_freq = compute_inv_freq(
            cfg.head_dim,
            cfg.rope_base,
            cfg.rope_scaling_type,
            cfg.rope_scaling_factor,
            cfg.rope_low_freq_factor,
            cfg.rope_high_freq_factor,
            cfg.rope_original_ctx,
        )
    out = {
        "embed": put("embed", embed),
        "layers": stacked,
        "final_norm": put("final_norm", g.tensor_f32("output_norm.weight").astype(np.float32)),
        "lm_head": put("lm_head", lm_head),
        "inv_freq": put("inv_freq", inv_freq),
    }
    if cfg.rope_base_local:
        # gemma3: local (sliding-window) layers rope with their own base,
        # WITHOUT the global layers' linear scaling
        out["inv_freq_local"] = put(
            "inv_freq_local", compute_inv_freq(cfg.head_dim, cfg.rope_base_local)
        )
    return out


# ---------------------------------------------------------------------------
# forward pass


# prefill attention: "auto" uses the flash prefill kernel (no materialized
# [T, S] scores) for chunks >= _FLASH_PREFILL_MIN_T on TPU; "xla" forces the
# masked dense path; "flash" forces the kernel even on CPU (interpret mode).
PREFILL_ATTN_IMPL = "auto"
_FLASH_PREFILL_MIN_T = 128
# flash-prefill block sizes (A/B knobs). With the flat-row GQA layout the
# VMEM budget caps t_block at 128 in "full" kv layout (q/scratch carry all
# kv heads per block); headmajor mode tolerates 256.
_PREFILL_TB = int(os.environ.get("NFAI_PREFILL_TB", "128"))
# SB 1024 measured 2.00 ms vs 2.56 at 512 on the STANDALONE 1B 2x2048
# flash call (r5 probe attn_probe5) but blows the 16 MB scoped-VMEM stack
# limit inside the full prefill program — 512 is the in-model ceiling
_PREFILL_SB = int(os.environ.get("NFAI_PREFILL_SB", "512"))
# "full" feeds the kernel the NATIVE merged-lane [B, S, KVD] cache (no
# per-layer head-major transpose); "headmajor" keeps the transpose path.
_PREFILL_KV_LAYOUT = os.environ.get("NFAI_PREFILL_KV", "full")

# --- sequence-parallel / expert-parallel runtime contexts ------------------
# Set by InferenceEngine when EngineConfig.seq_parallel / expert_parallel
# are on (parallel.seq_parallel / parallel.expert_parallel carry the
# collective math; these globals carry the mesh into the jitted forward,
# following the ops.qmatmul.TP_MESH pattern). SP shards the KV cache over
# its S axis: decode attention runs the stats-merge shard_map
# (sp_decode_attention); prefill falls back to the masked-einsum path,
# which GSPMD partitions over the sharded S axis. EP shards the expert
# stacks over their E axis: _moe_ffn routes through moe_ffn_ep.
_SP_CTX: tuple | None = None  # (mesh, axis_name)
_EP_CTX: tuple | None = None  # (mesh, axis_name)


def set_seq_parallel(mesh, axis: str | None) -> None:
    global _SP_CTX
    _SP_CTX = (mesh, axis) if axis else None


def set_expert_parallel(mesh, axis: str | None) -> None:
    global _EP_CTX
    _EP_CTX = (mesh, axis) if axis else None

PAGE_SIZE = 128  # decode kernel S-block granularity constraint


def _cached_attention(
    q: jax.Array,  # [B, T, Hq, D]
    k_cache: jax.Array,  # [B, S, KVD] merged-lane (KVD = Hkv*D, head-major)
    v_cache: jax.Array,  # [B, S, KVD]
    positions: jax.Array,  # [B, T] absolute positions of q tokens
    *,
    scale: float | None = None,
    softcap: float = 0.0,  # gemma2 tanh score capping
    window: jax.Array | int = 0,  # sliding window (0 = unlimited; traced ok)
    k_scales: jax.Array | None = None,  # [B, Hkv, S] f32: int8 cache
    v_scales: jax.Array | None = None,
    sp: bool = False,  # sequence-parallel cache (cfg.sp_axis, static)
) -> jax.Array:
    """Attention of new tokens against the (just-updated) cache.

    Causal mask against absolute positions: cache slot s is visible to query
    at position p iff s <= p. Slots beyond the written length have s > p for
    every query, so they are masked implicitly. Prefill chunks take the
    flash kernel on TPU; single-token decode normally never reaches here
    (the fused layered kernel handles it) — the einsum path below covers
    CPU tests and the TP/MoE fallbacks. With `k_scales`/`v_scales` the
    cache is int8: the flash kernel applies per-token scales in-kernel
    (no dense dequant materialization); the einsum fallback dequantizes.
    """
    b, t, hq, d = q.shape
    _, s, kvd = k_cache.shape
    hkv = kvd // d
    # sequence-parallel decode: the cache is S-sharded — reassemble full
    # attention from per-shard flash partials (one pmax + two psums,
    # context-length-independent traffic). Softcap/window/int8 stay on
    # the GSPMD einsum fallback (correct, partitioned automatically).
    if (
        sp
        and _SP_CTX is not None
        and t == 1
        and k_scales is None
        and not softcap
        and isinstance(window, int)
        and window == 0
    ):
        from ..parallel.seq_parallel import sp_decode_attention

        mesh, axis = _SP_CTX
        if s % mesh.shape[axis] == 0:
            out = sp_decode_attention(
                q[:, 0],
                k_cache.reshape(b, s, hkv, d),
                v_cache.reshape(b, s, hkv, d),
                positions[:, 0] + 1,
                mesh,
                axis,
                scale=scale,
            )
            return out[:, None].astype(q.dtype)
    # prefill chunks (contiguous positions per row — the only T>1 callers)
    # above the threshold take the flash kernel: no [T, S] scores in HBM
    use_flash_prefill = (
        t > 1
        and not sp  # pallas kernels cannot read an S-sharded cache
        and (t % 256 == 0 or (t <= 256 and t % 64 == 0))
        and s % 128 == 0
        and d % 64 == 0
        and (
            (
                PREFILL_ATTN_IMPL == "auto"
                and jax.default_backend() != "cpu"
                and t >= _FLASH_PREFILL_MIN_T
            )
            or PREFILL_ATTN_IMPL == "flash"
        )
    )
    if use_flash_prefill:
        from ..ops.prefill_attention import flash_prefill_attention


        if _PREFILL_KV_LAYOUT in ("full", "merged"):
            kc, vc = k_cache, v_cache  # native merged-lane [B, S, KVD]
        else:
            # head-major materialized view: see flash_prefill_attention
            kc = k_cache.reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
            vc = v_cache.reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
        # largest divisor of t that fits the TB cap (engine buckets can
        # produce t like 192 that the cap itself does not divide)
        t_block = t
        while t_block > _PREFILL_TB:
            t_block //= 2
        # largest S divisor under the SB cap (cache lengths are bucketed
        # to 128 multiples; e.g. s=1536 takes 512, not a fall-to-128)
        s_block = next(
            sb for sb in (_PREFILL_SB, 512, 256, 128) if s % sb == 0
        )
        return flash_prefill_attention(
            q,
            kc,
            vc,
            positions[:, 0],
            t_block=t_block,
            s_block=s_block,
            kv_layout=_PREFILL_KV_LAYOUT,
            interpret=jax.default_backend() == "cpu",
            scale=scale,
            softcap=softcap,
            window=window,
            k_scales=k_scales,
            v_scales=v_scales,
        ).astype(q.dtype)
    if k_scales is not None:  # einsum fallback: dense dequant
        k_cache = dequant_kv(k_cache, k_scales, q.dtype)
        v_cache = dequant_kv(v_cache, v_scales, q.dtype)
    n_rep = hq // hkv
    if scale is None:
        scale = 1.0 / (d**0.5)
    qg = q.reshape(b, t, hkv, n_rep, d)
    k5 = k_cache.reshape(b, s, hkv, d)
    v5 = v_cache.reshape(b, s, hkv, d)
    logits = jnp.einsum(
        "bthrd,bshd->bhrts", qg, k5, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    span = jnp.arange(s)[None, None, :]
    mask = span <= positions[:, :, None]  # [B,T,S]
    win = jnp.asarray(window, jnp.int32)
    mask &= (win == 0) | (span > positions[:, :, None] - win)
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("bhrts,bshd->bthrd", weights, v5)
    return out.reshape(b, t, hq, d)


def _gather_pages(pages: jax.Array, tables: jax.Array) -> jax.Array:
    """[Hkv, P, ps, D] + [B, NP] -> dense merged-lane [B, NP*ps, Hkv*D] view
    of each sequence's pages (prefill-chunk attention path; decode uses the
    paged kernel without materializing this)."""
    g = jnp.take(pages, tables, axis=1)  # [Hkv, B, NP, ps, D]
    hkv, b, np_, ps, d = g.shape
    return g.transpose(1, 2, 3, 0, 4).reshape(b, np_ * ps, hkv * d)


def _gather_page_scales(spool: jax.Array, tables: jax.Array) -> jax.Array:
    """[Hkv, P, ps] + [B, NP] -> dense [B, Hkv, NP*ps] time-minor scales."""
    g = jnp.take(spool, tables, axis=1)  # [Hkv, B, NP, ps]
    hkv, b, np_, ps = g.shape
    return g.transpose(1, 0, 2, 3).reshape(b, hkv, np_ * ps)


def _paged_attention(
    q: jax.Array,  # [B, T, Hq, D]
    k_pages: jax.Array,  # [Hkv, P, ps, D]
    v_pages: jax.Array,
    tables: jax.Array,  # [B, NP]
    positions: jax.Array,  # [B, T]
    *,
    scale: float | None = None,
    softcap: float = 0.0,
    window: jax.Array | int = 0,
    k_scales: jax.Array | None = None,  # [Hkv, P, ps] (int8 pool)
    v_scales: jax.Array | None = None,
    sp: bool = False,  # accepted for attn_kw symmetry; paged pools are
    # single-device — sequence parallelism applies to the dense cache only
) -> jax.Array:
    """Attention of new tokens against paged KV (already written).

    T == 1 takes the block-table Pallas kernel (page-skip past each
    sequence's length); prefill chunks gather the sequence's pages into a
    dense view and reuse the masked dense path. With `k_scales`/`v_scales`
    the pool is int8: the decode kernel applies scales per score column,
    the prefill path dequantizes the gathered view.
    """
    b, t, hq, d = q.shape
    if t == 1:
        from ..ops.paged_attention import paged_flash_decode_attention

        out = paged_flash_decode_attention(
            q[:, 0],
            k_pages,
            v_pages,
            tables,
            positions[:, 0] + 1,
            interpret=jax.default_backend() == "cpu",
            scale=scale,
            softcap=softcap,
            window=window,
            k_scales=k_scales,
            v_scales=v_scales,
        )
        return out[:, None].astype(q.dtype)
    kd = _gather_pages(k_pages, tables)
    vd = _gather_pages(v_pages, tables)
    if k_scales is not None:
        kd = dequant_kv(kd, _gather_page_scales(k_scales, tables), q.dtype)
        vd = dequant_kv(vd, _gather_page_scales(v_scales, tables), q.dtype)
    return _cached_attention(
        q, kd, vd, positions, scale=scale, softcap=softcap, window=window
    )


def _write_cache(
    cache: jax.Array, new: jax.Array, starts: jax.Array, uniform_start: bool
) -> jax.Array:
    """Write new [B, T, H, D] into cache [B, S, KVD] at per-batch offsets —
    contiguous [T, KVD] row-block writes in the merged-lane layout.

    With `uniform_start` (all sequences at the same position — single-request
    generate, lockstep batches) this is one dynamic_update_slice, which XLA
    reliably performs in place. The per-batch path vmaps the update (a
    scatter; needed for continuous batching where offsets differ).
    """
    b, t, h, d = new.shape
    new = new.astype(cache.dtype).reshape(b, t, h * d)
    if uniform_start:
        return jax.lax.dynamic_update_slice(cache, new, (0, starts[0], 0))

    def upd(c, n, s):  # c: [S, KVD], n: [T, KVD]
        return jax.lax.dynamic_update_slice(c, n, (s, 0))

    return jax.vmap(upd)(cache, new, starts)


# fused decode path: "auto" uses the one-kernel-per-layer fused
# rope-write-attention + layer-indexed weight kernels on TPU; "xla" forces
# the generic scan (CPU tests, debugging); "fused" forces it even on CPU
# (interpret mode, parity tests).
FUSED_DECODE_IMPL = "auto"


def _fused_decode_eligible(params, cfg, t, page_tables, cache) -> str | None:
    """Returns "single" (one-chip fused path), "tp" (whole-scan shard_map
    fused path), or None (generic scan)."""
    from ..ops import qmatmul as _qm

    if t != 1 or page_tables is not None:
        return None
    if cfg.sp_axis or cfg.ep_axis:
        # SP: the cache is S-sharded (generic scan + sp_decode_attention);
        # EP: expert stacks are E-sharded (generic scan + moe_ffn_ep)
        return None
    s = cache.max_seq
    kernels_ok = FUSED_DECODE_IMPL == "fused" or (
        FUSED_DECODE_IMPL == "auto"
        and jax.default_backend() != "cpu"
        and s % 128 == 0
    )
    if not kernels_ok:
        return None
    if cfg.n_experts:
        # MoE joins the fused path single-chip with quantized expert
        # stacks (layer-flattened grouped kernels); dense experts and TP
        # stay on the generic scan
        if _qm.TP_MESH is not None:
            return None
        from ..ops.qmatmul import grouped_supported

        exps = params["layers"].get("w_gate_exps")
        dn = params["layers"].get("w_down_exps")
        if not (
            isinstance(exps, QTensor) and isinstance(dn, QTensor)
            and grouped_supported(exps.replace(qs=None, scales=None,
                                               mins=None))
            and grouped_supported(dn.replace(qs=None, scales=None,
                                             mins=None))
        ):
            return None
        return "single"
    if _qm.TP_MESH is None:
        return "single"
    return "tp" if _fused_tp_eligible(params, cfg, cache) else None


def _decode_forward_fused(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, 1]
    positions: jax.Array,  # [B, 1]
    cache: KVCache,
    activation_dtype,
    h0: jax.Array | None = None,  # [B, 1, H]: skip the embed (TP wrapper)
    psum_axis: str | None = None,  # shard_map axis for row-parallel partials
) -> tuple[jax.Array, KVCache]:
    """Single-token decode with per-layer fused kernels over stacked arrays.

    Replaces the generic scan's per-layer XLA slicing/restacking (measured
    ~0.9 ms/step of weight-slice copies + ~1.7 ms/step of cache copies and
    S-minor dynamic-update-slice rewrites at 1B/b8/S1024 on v5e) with:
    - layer-indexed dequant-matmul kernels reading the stacked weights
      directly (ops.qmatmul.linear_layered), and
    - one fused attention kernel per layer that streams the stacked cache
      read-only and folds the new token in analytically (ops.fused_decode).

    Because the kernel never reads the new rows back from the cache, the
    cache is NOT a scan carry: each layer's new K/V row comes out of the
    scan as a stacked ys output and ONE batched scatter after the scan
    updates every layer at once. (Carrying the cache and scattering per
    layer forced XLA to copy the full stacked cache every layer — ~5x
    slower end-to-end at 1B/b8/S1024.)
    """
    from ..ops.fused_decode import (
        layered_decode_attention,
        layered_decode_attention_slab,
        write_all_layers,
    )
    from ..ops.qmatmul import linear_layered

    b = tokens.shape[0]
    interp = jax.default_backend() == "cpu"
    if h0 is not None:
        h = h0  # TP wrapper computed the (vocab-sharded) embed globally
    elif params["embed"] is None:
        h = dequant_gather(params["lm_head"], tokens, activation_dtype)
    else:
        h = jnp.take(params["embed"], tokens, axis=0).astype(activation_dtype)
    if h0 is None and cfg.embed_scale != 1.0:
        h = (h.astype(jnp.float32) * cfg.embed_scale).astype(activation_dtype)
    cos, sin = rope_cos_sin(positions, params["inv_freq"])
    if "inv_freq_local" in params:  # gemma3 dual rope bases
        cos_l, sin_l = rope_cos_sin(positions, params["inv_freq_local"])
    starts = positions[:, 0]
    layers = params["layers"]
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    s = cache.max_seq
    s_block = int(os.environ.get("NFAI_S_BLOCK", "0")) or (
        256 if s % 256 == 0 else 128
    )
    # batch-slab attention kernel by default: grid cells cost ~0.7 us each
    # on v5e and the (B, S/sb) grid was ~25 us/call of pure sequencing
    # (benchmarks/attn_probe.py). The slab block must fit VMEM: k+v slabs,
    # double-buffered ~ 8*b*sb*kvd bytes (+1 MB scratch).
    if os.environ.get("NFAI_ATTN_IMPL", "slab") == "slab":
        attn_fn = layered_decode_attention_slab
        attn_s_block = s_block
        while attn_s_block > 128 and 8 * b * attn_s_block * kvd > (10 << 20):
            attn_s_block //= 2
        if s % attn_s_block:
            attn_fn, attn_s_block = layered_decode_attention, s_block
    else:
        attn_fn, attn_s_block = layered_decode_attention, s_block
    windows = jnp.asarray(cfg.layer_windows(), jnp.int32)
    is_local = jnp.asarray(
        [cfg.layer_is_local(i) for i in range(cfg.n_layers)], jnp.bool_
    )

    # small per-layer tensors ride the scan as xs (cheap XLA slices); the
    # big weights are closed over and indexed inside the kernels
    small_keys = [
        k for k in (
            "attn_norm", "ffn_norm", "q_norm", "k_norm",
            "post_attn_norm", "post_ffw_norm",
            "wqkv_bias", "wq_bias", "wk_bias", "wv_bias",
            "router",  # MoE: [H, E] per layer (tiny)
        ) if k in layers
    ]
    smalls = {k: layers[k] for k in small_keys}
    if cfg.n_experts:
        # layer-flatten the quantized expert stacks ([L, E, ...] ->
        # [L*E, ...]) so the grouped kernels index experts with
        # lidx*E + expert straight from HBM — no per-layer XLA slices
        def flat_exps(qt):
            return qt.replace(
                qs=qt.qs.reshape((-1,) + qt.qs.shape[2:]),
                scales=qt.scales.reshape((-1,) + qt.scales.shape[2:]),
                mins=None if qt.mins is None
                else qt.mins.reshape((-1,) + qt.mins.shape[2:]),
            )

        exps_flat = {
            k: flat_exps(layers[k])
            for k in ("w_gate_exps", "w_up_exps", "w_down_exps")
        }

    def layer_step(h, xs):
        lidx, sm, win, local = xs
        if "inv_freq_local" in params:
            lcos = jnp.where(local, cos_l, cos)
            lsin = jnp.where(local, sin_l, sin)
        else:
            lcos, lsin = cos, sin
        x = rms_norm(h, sm["attn_norm"], cfg.rms_eps)
        if "wqkv" in layers:
            qkv = linear_layered(x, layers["wqkv"], lidx)
            if cfg.attn_bias:
                qkv = qkv + sm["wqkv_bias"].astype(qkv.dtype)
            q = qkv[..., :qd]
            k = qkv[..., qd : qd + kvd]
            v = qkv[..., qd + kvd :]
        else:
            q = linear_layered(x, layers["wq"], lidx)
            k = linear_layered(x, layers["wk"], lidx)
            v = linear_layered(x, layers["wv"], lidx)
            if cfg.attn_bias:
                q = q + sm["wq_bias"].astype(q.dtype)
                k = k + sm["wk_bias"].astype(k.dtype)
                v = v + sm["wv_bias"].astype(v.dtype)
        q = q.reshape(b, 1, cfg.n_heads, cfg.head_dim)
        k = k.reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = rms_norm(q, sm["q_norm"], cfg.rms_eps)
            k = rms_norm(k, sm["k_norm"], cfg.rms_eps)
        q = apply_rope_cs(q, lcos, lsin, neox=True)
        k = apply_rope_cs(k, lcos, lsin, neox=True)
        kn = k[:, 0].reshape(b, kvd)  # merged-lane new rows [B, KVD]
        vn = v[:, 0].reshape(b, kvd)
        attn = attn_fn(
            q[:, 0], kn, vn, cache.k, cache.v, lidx, starts,
            s_block=attn_s_block, interpret=interp,
            scale=cfg.query_scale, softcap=cfg.attn_softcap,
            window=win if cfg.swa_pattern else 0,
            k_scales=cache.ks, v_scales=cache.vs,
        )
        attn = attn.reshape(b, 1, qd)
        attn_out = linear_layered(attn, layers["wo"], lidx)
        if psum_axis is not None:
            # row-parallel wo: per-shard partial sums reduce over tp
            attn_out = jax.lax.psum(
                attn_out.astype(jnp.float32), psum_axis
            ).astype(attn_out.dtype)
        if cfg.post_norms:
            attn_out = rms_norm(attn_out, sm["post_attn_norm"], cfg.rms_eps)
        h = (h + attn_out).astype(activation_dtype)
        x = rms_norm(h, sm["ffn_norm"], cfg.rms_eps)
        act = jax.nn.silu if cfg.activation == "silu" else partial(
            jax.nn.gelu, approximate=True
        )
        if cfg.n_experts:
            lp_moe = dict(exps_flat)
            lp_moe["router"] = sm["router"]
            ffn_out = _moe_ffn_grouped_q(
                x, lp_moe, cfg, act, expert_base=lidx * cfg.n_experts
            )
        elif (
            isinstance(layers.get("w_gate_up"), QTensor)
            and layers["w_gate_up"].kind == "q4mlpg"
        ):
            # one-kernel MLP (ops.fused_mlp): gate, up AND down tiles stream
            # through a single sequential grid; the [B, F] activation never
            # leaves VMEM and the pair pays one pipeline fill instead of two
            from ..ops.fused_mlp import fused_mlp_layered

            ffn_out = fused_mlp_layered(
                x, layers["w_gate_up"], layers["w_down"], lidx,
                act=cfg.activation,
            )
        elif "w_gate_up" in layers:
            gu = linear_layered(x, layers["w_gate_up"], lidx)
            ffn_out = linear_layered(
                act(gu[..., : cfg.ffn_dim]) * gu[..., cfg.ffn_dim :],
                layers["w_down"],
                lidx,
            )
        else:
            gated = act(linear_layered(x, layers["w_gate"], lidx)) * (
                linear_layered(x, layers["w_up"], lidx)
            )
            ffn_out = linear_layered(gated, layers["w_down"], lidx)
        if psum_axis is not None:
            # row-parallel w_down: per-shard partial sums reduce over tp
            ffn_out = jax.lax.psum(
                ffn_out.astype(jnp.float32), psum_axis
            ).astype(ffn_out.dtype)
        if cfg.post_norms:
            ffn_out = rms_norm(ffn_out, sm["post_ffw_norm"], cfg.rms_eps)
        h = (h + ffn_out).astype(activation_dtype)
        return h, (kn, vn)

    h, (k_rows, v_rows) = jax.lax.scan(
        layer_step,
        h,
        (jnp.arange(cfg.n_layers, dtype=jnp.int32), smalls, windows, is_local),
    )
    if cache.quantized:
        # quantize the new rows for STORAGE only — attention folded the
        # full-precision rows in analytically above
        from ..ops.fused_decode import write_all_layers_t

        kq, ksc = quantize_kv(k_rows, cfg.n_kv_heads)  # [L,B,KVD],[L,B,Hkv]
        vq, vsc = quantize_kv(v_rows, cfg.n_kv_heads)
        new_cache = KVCache(
            write_all_layers(cache.k, kq, starts, interpret=interp),
            write_all_layers(cache.v, vq, starts, interpret=interp),
            write_all_layers_t(cache.ks, ksc, starts, interpret=interp),
            write_all_layers_t(cache.vs, vsc, starts, interpret=interp),
        )
    else:
        new_cache = type(cache)(
            write_all_layers(cache.k, k_rows, starts, interpret=interp),
            write_all_layers(cache.v, v_rows, starts, interpret=interp),
        )
    h = rms_norm(h, params["final_norm"], cfg.rms_eps)
    return h, new_cache


# layer-weight Megatron roles for the TP fused decode path (column-parallel
# weights shard their output axis; row-parallel their input axis and psum)
_TP_COL_KEYS = frozenset(
    {"wq", "wk", "wv", "w_gate", "w_up", "wqkv", "w_gate_up"}
)
_TP_ROW_KEYS = frozenset({"wo", "w_down"})


def _fused_tp_eligible(params, cfg, cache) -> bool:
    """The whole-layer-scan shard_map decode path needs every matmul weight
    to be per-shard CONSUMABLE: a contiguous shard must decode standalone.
    Column-parallel leaves always qualify when N divides (both the v2
    nibble and v3 word packings are column-independent); row-parallel 4-bit
    leaves need per-shard split-half sections (QTensor.sections == tp).
    Leaves that additionally pass the kernel layout checks (tp_mode marked
    at load) run the layered Pallas kernels per shard; the rest take the
    local XLA dequant fallback inside the same shard_map — still no GSPMD
    resharding or per-layer weight-slice copies."""
    from ..ops import qmatmul as _qm
    from ..parallel.mesh import TP_AXIS

    mesh = _qm.TP_MESH
    tp = mesh.shape[TP_AXIS]
    if cfg.n_heads % tp or cfg.n_kv_heads % tp or cfg.ffn_dim % tp:
        return False
    for key, leaf in params["layers"].items():
        role = "col" if key in _TP_COL_KEYS else (
            "row" if key in _TP_ROW_KEYS else None
        )
        if role is None:
            continue
        if key in ("wqkv", "w_gate_up", "w_down"):
            # fused keys: a contiguous shard must be a LOCAL fused
            # projection, which only the TP-interleaved load layout
            # guarantees (phi3 pre-fused / single-chip-fused layouts have
            # logical column order — their shards straddle q/k/v)
            tpi = getattr(leaf, "tpi", 0)
            if key == "w_down" and isinstance(leaf, QTensor) and (
                leaf.kind == "q4mlpd" and tpi != tp
            ):
                return False
            if key in ("wqkv", "w_gate_up") and (
                not isinstance(leaf, QTensor) or tpi != tp
            ):
                return False
        if not isinstance(leaf, QTensor):
            continue  # dense [L, K, N]: head/ffn divisibility checked above
        n_phys = leaf.qs.shape[-1]
        if n_phys != leaf.n:  # N-padded container: shards would straddle pad
            return False
        if role == "col":
            if leaf.n % tp:
                return False
        else:
            if leaf.kind in ("q4",):
                if leaf.sections != tp:
                    return False
            elif leaf.k % tp or (leaf.k // tp) % leaf.group:
                return False
    return True


def _decode_forward_fused_tp(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, 1]
    positions: jax.Array,  # [B, 1]
    cache: KVCache,
    activation_dtype,
) -> tuple[jax.Array, KVCache]:
    """Tensor-parallel fused decode: the ENTIRE layer scan runs per-shard
    under ONE shard_map — each chip executes the same layer-indexed Pallas
    kernels (v3 bit-decode matmuls, fused MLP-ready seams, slab attention,
    batched cache write) as the single-chip fused path on its local head /
    ffn / KV shard, with exactly two psums per layer (after the
    row-parallel wo and w_down). This replaces the per-matmul shard_map +
    GSPMD scan path, whose per-layer XLA weight slices and 7 launches/layer
    were measured ~0.9 ms/step on 1B (round-2 profile) — the reason TP
    decode previously forfeited the fused kernels entirely.

    The embedding gather stays OUTSIDE (global): a tied quantized table is
    vocab-sharded, and GSPMD handles the cross-shard gather. The LM head
    also stays outside (logits_for on the replicated hidden state)."""
    import dataclasses as _dc

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import qmatmul as _qm
    from ..parallel.mesh import DP_AXIS, TP_AXIS

    mesh = _qm.TP_MESH
    tp = mesh.shape[TP_AXIS]
    dp = mesh.shape[DP_AXIS]
    b = tokens.shape[0]
    bax = DP_AXIS if (dp > 1 and b % dp == 0) else None

    # global embed (handles the tied quantized vocab-sharded table)
    if params["embed"] is None:
        h0 = dequant_gather(params["lm_head"], tokens, activation_dtype)
    else:
        h0 = jnp.take(params["embed"], tokens, axis=0).astype(activation_dtype)
    if cfg.embed_scale != 1.0:
        h0 = (h0.astype(jnp.float32) * cfg.embed_scale).astype(activation_dtype)

    lcfg = _dc.replace(
        cfg,
        n_heads=cfg.n_heads // tp,
        n_kv_heads=cfg.n_kv_heads // tp,
        ffn_dim=cfg.ffn_dim // tp,
    )

    def leaf_spec(key, leaf):
        if key in _TP_COL_KEYS:
            sp = P(None, None, TP_AXIS)
        elif key in _TP_ROW_KEYS:
            sp = P(None, TP_AXIS, None)
        elif key.endswith("_bias"):
            return P(None, TP_AXIS)  # rides the fused col projections
        else:
            return P(None, None)  # norms (replicated)
        if isinstance(leaf, QTensor):
            return leaf.replace(
                qs=sp, scales=sp,
                mins=sp if leaf.mins is not None else None,
            )
        return sp

    layers = params["layers"]
    layer_specs = {k: leaf_spec(k, v) for k, v in layers.items()}

    def localize(key, leaf):
        """Fix the (meta-only) logical dims of the per-shard QTensor view."""
        if not isinstance(leaf, QTensor):
            return leaf
        if key in _TP_COL_KEYS:
            return leaf.replace(n=leaf.n // tp, tp_mode=None, tpi=0)
        if key in _TP_ROW_KEYS:
            return leaf.replace(
                k=leaf.k // tp, sections=1, tp_mode=None, tpi=0
            )
        return leaf

    cache_spec = type(cache)(
        P(None, bax, None, TP_AXIS),
        P(None, bax, None, TP_AXIS),
        P(None, bax, TP_AXIS, None) if cache.ks is not None else None,
        P(None, bax, TP_AXIS, None) if cache.vs is not None else None,
    )
    sub_params_spec = {
        "layers": layer_specs,
        "final_norm": P(None),
        "inv_freq": P(None),
    }
    sub_params = {
        "layers": layers,
        "final_norm": params["final_norm"],
        "inv_freq": params["inv_freq"],
    }
    if "inv_freq_local" in params:
        sub_params["inv_freq_local"] = params["inv_freq_local"]
        sub_params_spec["inv_freq_local"] = P(None)

    def local_fn(sp_local, tokens_l, positions_l, h0_l, cache_l):
        lp = dict(sp_local)
        lp["layers"] = {
            k: localize(k, v) for k, v in sp_local["layers"].items()
        }
        lp["embed"] = None  # unused: h0 provided
        lp["lm_head"] = None
        return _decode_forward_fused(
            lp, lcfg, tokens_l, positions_l, cache_l, activation_dtype,
            h0=h0_l, psum_axis=TP_AXIS,
        )

    h, new_cache = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            sub_params_spec,
            P(bax, None),
            P(bax, None),
            P(bax, None, None),
            cache_spec,
        ),
        out_specs=(P(bax, None, None), cache_spec),
        check_vma=False,
    )(sub_params, tokens, positions, h0, cache)
    return h, new_cache


def forward(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T] int32
    positions: jax.Array,  # [B, T] int32 absolute positions
    cache: KVCache,
    *,
    activation_dtype=None,
    uniform_start: bool = True,
    attend_len: int | None = None,
    page_tables: jax.Array | None = None,
    h0: jax.Array | None = None,
    final_norm: bool = True,
) -> tuple[jax.Array, KVCache]:
    """Run the transformer stack; returns (hidden [B,T,H], updated cache).

    `h0`/`final_norm` are the pipeline-parallel stage seams
    (parallel.pipeline_parallel): a non-first stage receives the previous
    stage's hidden state via `h0` (skipping embedding), a non-last stage
    passes `final_norm=False` (the final rms_norm belongs to the last
    stage only). Single-stage callers never set either.

    `attend_len` (static) bounds how many leading cache slots attention
    scans — callers pass a bucket covering every valid position so short
    prefixes in a long cache don't pay O(S_max) attention.

    Used for both prefill (T = chunk) and decode (T = 1). K/V for the new
    tokens are written into the cache at ``positions[:, 0]`` (contiguous
    per-sequence layout), then attention runs against the whole cache.
    `activation_dtype` defaults to the weight dtype.

    With `page_tables` [B, max_pages], `cache` is a paged pool
    (runtime.paged_cache.PagedKVCache: [L, Hkv, P, ps, D]) and each
    sequence's positions map onto pages through its table row — writes
    scatter through the table and attention runs the block-table kernel.
    """
    b, t = tokens.shape
    if activation_dtype is None:
        activation_dtype = (
            params["embed"].dtype
            if params.get("embed") is not None
            else (h0.dtype if h0 is not None else jnp.bfloat16)
        )
    fused_mode = (
        None
        if h0 is not None or not final_norm
        else _fused_decode_eligible(params, cfg, t, page_tables, cache)
    )
    if fused_mode == "single":
        return _decode_forward_fused(
            params, cfg, tokens, positions, cache, activation_dtype
        )
    if fused_mode == "tp":
        return _decode_forward_fused_tp(
            params, cfg, tokens, positions, cache, activation_dtype
        )
    if h0 is not None:
        h = h0.astype(activation_dtype)  # pipeline stage input
    elif params["embed"] is None:
        # tied quantized table stored once in head layout; gather columns
        h = dequant_gather(params["lm_head"], tokens, activation_dtype)
    else:
        h = jnp.take(params["embed"], tokens, axis=0).astype(activation_dtype)
    if h0 is None and cfg.embed_scale != 1.0:
        # gemma scales embeddings by sqrt(hidden) (in the model, not the file)
        h = (h.astype(jnp.float32) * cfg.embed_scale).astype(activation_dtype)
    # rope angles are identical in every layer: compute cos/sin once per step
    # (load_params converts NORM checkpoints to the NEOX layout, so rotation
    # is always the shuffle-free half-split form — see ops.rope). gemma3
    # additionally ropes its local (sliding-window) layers with a second
    # base, selected per layer inside the scan.
    cos, sin = rope_cos_sin(positions, params["inv_freq"])
    # barrier: without it XLA sinks the (positions * inv_freq) trig into
    # the layer while-loop and bounces the small f32 operands VMEM<->HBM
    # every iteration (profiled ~37 ms of copy-start stalls per 2x2048
    # prefill); materializing the tables once keeps them loop constants
    cos, sin = jax.lax.optimization_barrier((cos, sin))
    if "inv_freq_local" in params:
        cos_l, sin_l = rope_cos_sin(positions, params["inv_freq_local"])
        cos_l, sin_l = jax.lax.optimization_barrier((cos_l, sin_l))
    starts = positions[:, 0]
    # per-layer sliding window (0 = unlimited) rides the scan as xs
    windows = jnp.asarray(cfg.layer_windows(), jnp.int32)
    is_local = jnp.asarray(
        [cfg.layer_is_local(i) for i in range(cfg.n_layers)], jnp.bool_
    )

    quant = getattr(cache, "ks", None) is not None

    def layer_step(h, layer_in):
        if quant:
            lp, k_cache_l, v_cache_l, ks_l, vs_l, win, local = layer_in
        else:
            lp, k_cache_l, v_cache_l, win, local = layer_in
            ks_l = vs_l = None
        if "inv_freq_local" in params:
            lcos = jnp.where(local, cos_l, cos)
            lsin = jnp.where(local, sin_l, sin)
        else:
            lcos, lsin = cos, sin
        x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        qd = cfg.n_heads * cfg.head_dim
        kvd = cfg.n_kv_heads * cfg.head_dim
        if "wqkv" in lp:  # fused projection: one kernel launch
            qkv = linear(x, lp["wqkv"])
            if cfg.attn_bias:
                qkv = qkv + lp["wqkv_bias"].astype(qkv.dtype)
            if isinstance(lp["wqkv"], QTensor) and lp["wqkv"].tpi:
                # TP-interleaved fused columns -> logical [q|k|v] order
                from ..ops.qtensor import tp_fused_inv_perm

                qkv = qkv[..., tp_fused_inv_perm(
                    [qd, kvd, kvd], lp["wqkv"].tpi
                )]
            q = qkv[..., :qd]
            k = qkv[..., qd : qd + kvd]
            v = qkv[..., qd + kvd :]
        else:
            q = linear(x, lp["wq"])
            k = linear(x, lp["wk"])
            v = linear(x, lp["wv"])
            if cfg.attn_bias:
                q = q + lp["wq_bias"].astype(q.dtype)
                k = k + lp["wk_bias"].astype(k.dtype)
                v = v + lp["wv_bias"].astype(v.dtype)
        q = q.reshape(b, t, cfg.n_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
        q = apply_rope_cs(q, lcos, lsin, neox=True)
        k = apply_rope_cs(k, lcos, lsin, neox=True)
        attn_kw = dict(
            scale=cfg.query_scale,
            softcap=cfg.attn_softcap,
            # static 0 when the model has no sliding window: the kernels
            # compile the window logic out entirely
            window=win if cfg.swa_pattern else 0,
            sp=bool(cfg.sp_axis),
        )
        if page_tables is not None:
            from ..runtime.paged_cache import write_paged, write_paged_scales

            if quant:
                hkv, hd = cfg.n_kv_heads, cfg.head_dim
                kq, ksc = quantize_kv(k.reshape(b, t, kvd), hkv)
                vq, vsc = quantize_kv(v.reshape(b, t, kvd), hkv)
                k_cache_l = write_paged(
                    k_cache_l, kq.reshape(b, t, hkv, hd), page_tables, positions
                )
                v_cache_l = write_paged(
                    v_cache_l, vq.reshape(b, t, hkv, hd), page_tables, positions
                )
                ks_l = write_paged_scales(ks_l, ksc, page_tables, positions)
                vs_l = write_paged_scales(vs_l, vsc, page_tables, positions)
                attn = _paged_attention(
                    q, k_cache_l, v_cache_l, page_tables, positions,
                    k_scales=ks_l, v_scales=vs_l, **attn_kw,
                )
            else:
                k_cache_l = write_paged(k_cache_l, k, page_tables, positions)
                v_cache_l = write_paged(v_cache_l, v, page_tables, positions)
                attn = _paged_attention(
                    q, k_cache_l, v_cache_l, page_tables, positions, **attn_kw
                )
        elif quant:
            hkv, hd = cfg.n_kv_heads, cfg.head_dim
            kq, ksc = quantize_kv(k.reshape(b, t, kvd), hkv)
            vq, vsc = quantize_kv(v.reshape(b, t, kvd), hkv)
            k_cache_l = _write_cache(
                k_cache_l, kq.reshape(b, t, hkv, hd), starts, uniform_start
            )
            v_cache_l = _write_cache(
                v_cache_l, vq.reshape(b, t, hkv, hd), starts, uniform_start
            )
            ks_l = _write_scales(ks_l, ksc, starts, uniform_start)
            vs_l = _write_scales(vs_l, vsc, starts, uniform_start)
            al = (
                attend_len
                if attend_len is not None
                and attend_len < k_cache_l.shape[1]
                else k_cache_l.shape[1]
            )
            attn = _cached_attention(
                q,
                k_cache_l[:, :al],
                v_cache_l[:, :al],
                positions,
                k_scales=ks_l[:, :, :al],
                v_scales=vs_l[:, :, :al],
                **attn_kw,
            )
        elif attend_len is not None and attend_len < k_cache_l.shape[1]:
            k_cache_l = _write_cache(k_cache_l, k, starts, uniform_start)
            v_cache_l = _write_cache(v_cache_l, v, starts, uniform_start)
            attn = _cached_attention(
                q,
                k_cache_l[:, :attend_len],
                v_cache_l[:, :attend_len],
                positions,
                **attn_kw,
            )
        else:
            k_cache_l = _write_cache(k_cache_l, k, starts, uniform_start)
            v_cache_l = _write_cache(v_cache_l, v, starts, uniform_start)
            attn = _cached_attention(
                q, k_cache_l, v_cache_l, positions, **attn_kw
            )
        attn = attn.reshape(b, t, cfg.n_heads * cfg.head_dim)
        attn_out = linear(attn, lp["wo"])
        if cfg.post_norms:
            attn_out = rms_norm(attn_out, lp["post_attn_norm"], cfg.rms_eps)
        h = (h + attn_out).astype(activation_dtype)
        x = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        act = jax.nn.silu if cfg.activation == "silu" else partial(
            jax.nn.gelu, approximate=True
        )
        if cfg.n_experts:
            ffn_out = _moe_ffn(x, lp, cfg, act)
        elif (
            isinstance(lp.get("w_gate_up"), QTensor)
            and lp["w_gate_up"].kind == "q4mlpg"
        ):
            from ..ops.fused_mlp import (
                MLP_FUSED_MAX_ROWS, fused_mlp, mlp_prefill, mlp_tp,
            )

            if lp["w_gate_up"].tpi:
                # TP-interleaved containers: per-shard fused MLP + psum
                ffn_out = mlp_tp(x, lp["w_gate_up"], lp["w_down"],
                                 act=cfg.activation)
            else:
                # the fused kernel re-streams the MLP weights once per
                # 128-row batch tile — a decode-shaped win that loses on
                # long prefill chunks; large row counts dequantize once
                rows = x.size // x.shape[-1]
                if rows > MLP_FUSED_MAX_ROWS:
                    ffn_out = mlp_prefill(x, lp["w_gate_up"], lp["w_down"],
                                          act=cfg.activation)
                else:
                    ffn_out = fused_mlp(x, lp["w_gate_up"], lp["w_down"],
                                        act=cfg.activation)
        elif "w_gate_up" in lp:  # fused projection: one kernel launch
            gu = linear(x, lp["w_gate_up"])
            if isinstance(lp["w_gate_up"], QTensor) and lp["w_gate_up"].tpi:
                from ..ops.qtensor import tp_fused_inv_perm

                gu = gu[..., tp_fused_inv_perm(
                    [cfg.ffn_dim, cfg.ffn_dim], lp["w_gate_up"].tpi
                )]
            ffn_out = linear(
                act(gu[..., : cfg.ffn_dim]) * gu[..., cfg.ffn_dim :],
                lp["w_down"],
            )
        else:
            gated = act(linear(x, lp["w_gate"])) * linear(x, lp["w_up"])
            ffn_out = linear(gated, lp["w_down"])
        if cfg.post_norms:
            ffn_out = rms_norm(ffn_out, lp["post_ffw_norm"], cfg.rms_eps)
        h = (h + ffn_out).astype(activation_dtype)
        if quant:
            return h, (k_cache_l, v_cache_l, ks_l, vs_l)
        return h, (k_cache_l, v_cache_l)

    if quant:
        h, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
            layer_step, h,
            (params["layers"], cache.k, cache.v, cache.ks, cache.vs,
             windows, is_local),
        )
        new_cache = type(cache)(new_k, new_v, new_ks, new_vs)
    else:
        h, (new_k, new_v) = jax.lax.scan(
            layer_step, h,
            (params["layers"], cache.k, cache.v, windows, is_local),
        )
        new_cache = type(cache)(new_k, new_v)
    if final_norm:
        h = rms_norm(h, params["final_norm"], cfg.rms_eps)
    return h, new_cache


def logits_for(
    params: dict, hidden: jax.Array, cfg: LlamaConfig | None = None
) -> jax.Array:
    """LM head (tied to embeddings when output.weight is absent,
    reference: LlamaModel.cs:64-67). Applies gemma2's final logit softcap
    when `cfg` carries one."""
    logits = linear(hidden, params["lm_head"]).astype(jnp.float32)
    if cfg is not None and cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits


@partial(
    jax.jit, static_argnames=("cfg", "attend_len"), donate_argnames=("cache",)
)
def prefill_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T_chunk]
    positions: jax.Array,  # [B, T_chunk]
    last_index: jax.Array,  # [B] index of last real token within the chunk
    cache: KVCache,
    attend_len: int | None = None,
) -> tuple[jax.Array, KVCache]:
    """Process a (padded) prompt chunk; returns logits at each seq's last
    real token. The reference fed prompt tokens one-by-one through the full
    stack incl. LM head (LlamaModel.cs:103-126) — here a whole chunk is one
    batched MXU-friendly call and the LM head runs once."""
    h, cache = forward(params, cfg, tokens, positions, cache, attend_len=attend_len)
    h_last = jnp.take_along_axis(h, last_index[:, None, None], axis=1)  # [B,1,H]
    return logits_for(params, h_last, cfg)[:, 0, :], cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def verify_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T] candidate tokens (first = committed next)
    positions: jax.Array,  # [B, T]
    cache: KVCache,
) -> tuple[jax.Array, KVCache]:
    """Speculative-decoding verification: feed T candidate tokens through the
    stack in ONE forward and return logits at EVERY position [B, T, V]. K/V
    for all T candidates are written; rejected positions' slots are simply
    overwritten by later steps (attention masks by absolute position, so
    stale future slots are never visible). Greedy acceptance happens on the
    host (runtime.engine prompt-lookup loop)."""
    h, cache = forward(params, cfg, tokens, positions, cache)
    return logits_for(params, h, cfg), cache


def _ngram_draft_device(
    hist: jax.Array,  # [B, S] int32 (tokens 0..hlen-1 valid, incl. pending)
    hlen: jax.Array,  # [B]
    n: int,
    gamma: int,
) -> tuple[jax.Array, jax.Array]:
    """On-device prompt-lookup draft: most recent position whose n-gram
    equals the trailing n-gram; the following `gamma` tokens are the draft.
    Returns (draft [B, gamma], found [B]). On a miss (or a continuation
    running past the history) the draft repeats the last token — the
    verify step rejects bad drafts, so a miss only costs acceptance."""
    b, s = hist.shape
    qidx = hlen[:, None] + jnp.arange(-n, 0, dtype=jnp.int32)[None]
    q = jnp.take_along_axis(hist, jnp.clip(qidx, 0, s - 1), axis=1)  # [B, n]
    pad = jnp.full((b, n), -1, hist.dtype)  # -1 never matches a real token
    hp = jnp.concatenate([hist, pad], axis=1)
    win = jnp.stack([hp[:, i:i + s] for i in range(n)], axis=-1)  # [B, S, n]
    match = jnp.all(win == q[:, None, :], axis=-1)  # [B, S]
    posr = jnp.arange(s, dtype=jnp.int32)[None]
    valid = match & (posr < hlen[:, None] - n)  # exclude the query itself
    best = jnp.max(jnp.where(valid, posr, -1), axis=1)  # [B]
    found = (best >= 0) & (hlen >= n + 1)
    didx = best[:, None] + n + jnp.arange(gamma, dtype=jnp.int32)[None]
    last = jnp.take_along_axis(hist, jnp.clip(hlen[:, None] - 1, 0, s - 1), 1)
    cont = jnp.take_along_axis(hist, jnp.clip(didx, 0, s - 1), 1)
    draft = jnp.where(
        found[:, None] & (didx < hlen[:, None]), cont, last
    )
    return draft, found


@partial(
    jax.jit,
    static_argnames=("cfg", "n_rounds", "gamma", "ngram", "top_k"),
    donate_argnames=("cache", "hist"),
)
def spec_decode_rounds(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B] pending (sampled, not yet emitted) token ids
    positions: jax.Array,  # [B] their absolute positions
    cache: KVCache,
    hist: jax.Array,  # [B, S] token history incl. the pending token
    hist_len: jax.Array,  # [B] valid entries in hist
    eos_ids: jax.Array,  # [E] int32 (pad with -1)
    active: jax.Array,  # [B] bool
    n_rounds: int,
    gamma: int,
    ngram: int,
    page_tables: jax.Array | None = None,  # [B, NP]: paged-pool verify
    key: jax.Array | None = None,  # sampled acceptance (None = greedy)
    temps: jax.Array | None = None,  # [B] per-lane temperature
    top_k: int = 64,
    top_ps: jax.Array | None = None,  # [B]
    top_k_rows: jax.Array | None = None,  # [B]
    min_ps: jax.Array | None = None,  # [B]
) -> tuple:
    """Fused speculative decoding: `n_rounds` of (on-device n-gram draft →
    ONE verify forward of gamma+1 tokens → accept) in a single jitted call —
    the host-loop version pays the full dispatch latency per verify (~26 ms
    on a tunneled chip), this pays it once per `n_rounds`.

    Acceptance: with `temps`/`key` unset, greedy longest-argmax-prefix
    (matches plain argmax decoding exactly). With them set, REJECTION
    SAMPLING (ops.sampling.spec_verify_sample): draft token d accepted with
    probability p(d) under the lane's full sampling pipeline, residual
    resample on rejection — token-by-token the output law equals plain
    sampling, so temperature>0 lanes (and mixed greedy/sampled batches)
    speculate too; greedy lanes inside a sampled batch reduce to the exact
    argmax rule.

    A lane deactivates when its pending token is EOS, an accepted draft
    hits EOS, or the cache lacks room for a full round; its state freezes
    (pos/hist stop advancing, verify writes are redirected to its frozen
    positions, mirroring `decode_loop`'s inactive-lane convention).

    Returns (out_tokens [B, n_rounds*(gamma+1)], out_counts [B],
    next_tokens [B], next_pos [B], cache, hist, hist_len, active [B],
    drafted [B], accepted [B]). out_tokens[b, :out_counts[b]] are the
    emitted tokens in order (EOS excluded — a lane stops before it)."""
    from ..ops.sampling import spec_verify_sample

    b = tokens.shape[0]
    s_cache = cache.max_seq if hasattr(cache, "max_seq") else hist.shape[1]
    t = gamma + 1
    n_out = n_rounds * t
    jt = jnp.arange(t, dtype=jnp.int32)[None]  # [1, T]
    sampled = temps is not None
    if key is None:
        key = jax.random.PRNGKey(0)  # unused in the greedy path

    def is_eos(x):  # x [...]: True where token is one of eos_ids
        return jnp.any(x[..., None] == eos_ids[None], axis=-1)

    def round_body(carry, _):
        (tok, pos, cache, hist, hlen, outs, ocnt, act, drafted, accepted,
         key) = carry
        act = act & ~is_eos(tok) & (pos + t <= s_cache)
        draft, _found = _ngram_draft_device(hist, hlen, ngram, gamma)
        tin = jnp.concatenate([tok[:, None], draft], axis=1)  # [B, T]
        posv = jnp.where(act[:, None], pos[:, None] + jt, pos[:, None])
        posv = jnp.clip(posv, 0, s_cache - 1)
        h, cache = forward(
            params, cfg, tin, posv, cache, uniform_start=False,
            page_tables=page_tables,
        )
        logits3 = logits_for(params, h, cfg).astype(jnp.float32)  # [B, T, V]
        if sampled:
            key, sub = jax.random.split(key)
            n_acc, new_tok = spec_verify_sample(
                logits3, draft, sub, temps, top_k,
                1.0 if top_ps is None else top_ps, top_k_rows,
                0.0 if min_ps is None else min_ps,
            )
        else:
            nxt = jnp.argmax(logits3, axis=-1).astype(jnp.int32)  # [B, T]
            ok = (draft == nxt[:, :-1]).astype(jnp.int32)  # [B, gamma]
            n_acc = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)  # [B] 0..gamma
            new_tok = jnp.take_along_axis(nxt, n_acc[:, None], axis=1)[:, 0]
        e = n_acc + 1  # tokens this round: tin[:, :e] ([tok] + accepted)
        # truncate at the first EOS among the emitted tokens (excluded)
        emit_eos = is_eos(tin) & (jt < e[:, None])
        first_eos = jnp.min(
            jnp.where(emit_eos, jt, n_out), axis=1
        )  # T sentinel
        hit_eos = first_eos < e
        e = jnp.where(hit_eos, first_eos, e)
        e = jnp.where(act, e, 0)
        # next pending token: continuation after the accepted prefix
        new_tok = jnp.where(act & ~hit_eos, new_tok, tok)
        # scatter emitted tokens into the output buffer
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        oidx = jnp.where(jt < e[:, None], ocnt[:, None] + jt, n_out)
        outs = outs.at[bidx, oidx].set(tin, mode="drop")
        # append [accepted drafts, new pending] to the history (hist already
        # ends with `tok`); frozen / EOS-terminated lanes write nothing
        entries = jnp.concatenate(
            [tin[:, 1:], jnp.zeros((b, 1), tin.dtype)], axis=1
        )  # entries[j] = tin[j+1]
        entries = jnp.where(jt == (e - 1)[:, None], new_tok[:, None], entries)
        write = act[:, None] & ~hit_eos[:, None] & (jt < e[:, None])
        hidx = jnp.where(write, hlen[:, None] + jt, hist.shape[1])
        hist = hist.at[bidx, hidx].set(entries, mode="drop")
        adv = jnp.where(act, e, 0)
        drafted = drafted + jnp.where(act, gamma, 0)
        accepted = accepted + jnp.where(act, n_acc, 0)
        act = act & ~hit_eos
        return (
            new_tok, pos + adv, cache, hist, hlen + adv, outs, ocnt + adv,
            act, drafted, accepted, key,
        ), None

    outs0 = jnp.zeros((b, n_out), jnp.int32)
    zero = jnp.zeros((b,), jnp.int32)
    (tok, pos, cache, hist, hlen, outs, ocnt, act, drafted, accepted, _), _ = (
        jax.lax.scan(
            round_body,
            (tokens, positions, cache, hist, hist_len, outs0, zero,
             active, zero, zero, key),
            None,
            length=n_rounds,
        )
    )
    return outs, ocnt, tok, pos, cache, hist, hlen, act, drafted, accepted


@partial(
    jax.jit,
    static_argnames=("cfg", "dcfg", "n_rounds", "gamma", "top_k"),
    donate_argnames=("cache", "dcache"),
)
def draft_spec_rounds(
    params: dict,
    cfg: LlamaConfig,
    dparams: dict,
    dcfg: LlamaConfig,
    tokens: jax.Array,  # [B] pending (sampled, not yet emitted) token ids
    positions: jax.Array,  # [B]
    cache: KVCache,  # target model cache
    dcache: KVCache,  # draft model cache (same prompt prefilled)
    eos_ids: jax.Array,  # [E] int32 (pad with -1)
    active: jax.Array,  # [B] bool
    n_rounds: int,
    gamma: int,
    key: jax.Array | None = None,  # sampled acceptance (None = greedy)
    temps: jax.Array | None = None,  # [B]
    top_k: int = 64,
    top_ps: jax.Array | None = None,
    min_ps: jax.Array | None = None,
) -> tuple:
    """Fused draft-model speculative decoding: per round, the draft model
    rolls out gamma+1 greedy steps (the +1 step writes the last draft's KV
    so the draft cache never develops a hole on full acceptance), the
    target verifies all gamma drafts in ONE forward, and the accepted
    prefix commits. Greedy requests (temps unset) use longest
    argmax-prefix acceptance — output EXACTLY the target's greedy sequence
    regardless of draft quality. Sampled requests use rejection-sampling
    acceptance against the GREEDY draft rollout (a point-mass proposal, so
    ops.sampling.spec_verify_sample applies unchanged and the output law
    equals plain sampling). Same lane conventions as spec_decode_rounds.

    Returns (out_tokens [B, n_rounds*(gamma+1)], out_counts [B],
    next_tokens, next_pos, cache, dcache, active, drafted, accepted)."""
    from ..ops.sampling import spec_verify_sample

    b = tokens.shape[0]
    s_cache = cache.max_seq
    t = gamma + 1
    n_out = n_rounds * t
    jt = jnp.arange(t, dtype=jnp.int32)[None]
    sampled = temps is not None
    if key is None:
        key = jax.random.PRNGKey(0)  # unused in the greedy path

    def is_eos(x):
        return jnp.any(x[..., None] == eos_ids[None], axis=-1)

    def round_body(carry, _):
        tok, pos, cache, dcache, outs, ocnt, act, drafted, accepted, key = carry
        act = act & ~is_eos(tok) & (pos + t <= s_cache)
        posc = jnp.where(act, pos, jnp.minimum(pos, s_cache - t))

        # draft rollout: greedy gamma+1 steps, frozen lanes re-feed tok
        def droll(c, j):
            dtok, dc = c
            dpos = jnp.where(act, posc + j, posc)
            logits, dc = _decode_one(
                dparams, dcfg, dtok, dpos, dc, uniform_start=False
            )
            nxt = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(
                jnp.int32
            )
            nxt = jnp.where(act, nxt, dtok)
            return (nxt, dc), nxt

        (_, dcache), dout = jax.lax.scan(
            droll, (tok, dcache), jnp.arange(t, dtype=jnp.int32)
        )
        draft = jnp.moveaxis(dout, 0, 1)[:, :gamma]  # [B, gamma]
        tin = jnp.concatenate([tok[:, None], draft], axis=1)  # [B, T]
        posv = jnp.where(act[:, None], posc[:, None] + jt, posc[:, None])
        posv = jnp.clip(posv, 0, s_cache - 1)
        h, cache = forward(params, cfg, tin, posv, cache, uniform_start=False)
        logits3 = logits_for(params, h, cfg).astype(jnp.float32)
        if sampled:
            key, sub = jax.random.split(key)
            n_acc, new_tok = spec_verify_sample(
                logits3, draft, sub, temps, top_k,
                1.0 if top_ps is None else top_ps, None,
                0.0 if min_ps is None else min_ps,
            )
        else:
            nxt = jnp.argmax(logits3, axis=-1).astype(jnp.int32)
            ok = (draft == nxt[:, :-1]).astype(jnp.int32)
            n_acc = jnp.sum(jnp.cumprod(ok, axis=1), axis=1)
            new_tok = jnp.take_along_axis(nxt, n_acc[:, None], axis=1)[:, 0]
        e = n_acc + 1
        emit_eos = is_eos(tin) & (jt < e[:, None])
        first_eos = jnp.min(jnp.where(emit_eos, jt, n_out), axis=1)
        hit_eos = first_eos < e
        e = jnp.where(hit_eos, first_eos, e)
        e = jnp.where(act, e, 0)
        new_tok = jnp.where(act & ~hit_eos, new_tok, tok)
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        oidx = jnp.where(jt < e[:, None], ocnt[:, None] + jt, n_out)
        outs = outs.at[bidx, oidx].set(tin, mode="drop")
        adv = jnp.where(act, e, 0)
        drafted = drafted + jnp.where(act, gamma, 0)
        accepted = accepted + jnp.where(act, n_acc, 0)
        act = act & ~hit_eos
        return (
            new_tok, pos + adv, cache, dcache, outs, ocnt + adv, act,
            drafted, accepted, key,
        ), None

    outs0 = jnp.zeros((b, n_out), jnp.int32)
    zero = jnp.zeros((b,), jnp.int32)
    (tok, pos, cache, dcache, outs, ocnt, act, drafted, accepted, _), _ = (
        jax.lax.scan(
            round_body,
            (tokens, positions, cache, dcache, outs0, zero, active,
             zero, zero, key),
            None,
            length=n_rounds,
        )
    )
    return outs, ocnt, tok, pos, cache, dcache, act, drafted, accepted


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def decode_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B] current token ids
    positions: jax.Array,  # [B] their absolute positions
    cache: KVCache,
) -> tuple[jax.Array, KVCache]:
    """One decode token for every sequence in the batch; returns [B, V] logits."""
    h, cache = forward(params, cfg, tokens[:, None], positions[:, None], cache)
    return logits_for(params, h, cfg)[:, 0, :], cache


@partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "top_k", "uniform_start", "n_logprobs"),
    donate_argnames=("cache",),
)
def decode_loop(
    params: dict,
    cfg: LlamaConfig,
    first_tokens: jax.Array,  # [B] token ids to start from
    start_pos: jax.Array,  # [B] their absolute positions
    cache: KVCache,
    key: jax.Array,
    n_steps: int,
    temperature: jax.Array | float = 0.0,
    top_k: int = 40,
    top_p: jax.Array | float = 0.95,
    uniform_start: bool = True,
    active: jax.Array | None = None,  # [B] bool; inactive slots emit pad
    top_k_rows: jax.Array | None = None,  # [B] per-row top-k within top_k
    min_p: jax.Array | float = 0.0,  # per-row min-p floor
    bias_ids: jax.Array | None = None,  # [B, W] logit-bias token ids
    bias_vals: jax.Array | None = None,  # [B, W] additive biases
    presence: jax.Array | float | None = None,  # [B] presence penalty
    frequency: jax.Array | float | None = None,  # [B] frequency penalty
    counts: jax.Array | None = None,  # [B, V] int32 output-token counts
    n_logprobs: int | None = None,  # static: OpenAI logprobs (0=chosen only)
    allowed_mask: jax.Array | None = None,  # [B, V] bool: legal next tokens
) -> tuple:
    """Generate `n_steps` tokens fully on device (no host sync per token).

    Returns (tokens [B, n_steps], next_tokens [B], cache, key) — plus the
    updated `counts` when penalties are active (pass `counts` to enable
    presence/frequency penalties; they count OUTPUT tokens, vLLM semantics),
    plus (chosen_lp [B, n], top_ids [B, n, k], top_lps [B, n, k]) when
    `n_logprobs` is set (aligned with toks[:, 1:] + next_tokens — each
    step's logprobs describe the token it SAMPLED).
    The emitted tokens all have their K/V written; `next_tokens` is sampled
    but not yet fed through the model. The host checks EOS between chunks —
    one sync per `n_steps` tokens instead of per token.
    """
    from ..ops.sampling import (
        apply_logit_bias,
        apply_penalties,
        sample_logits,
        token_logprobs,
    )

    use_counts = counts is not None

    def body(carry, _):
        if use_counts:
            tok, pos, cache, key, cnt = carry
        else:
            tok, pos, cache, key = carry
            cnt = None
        logits, cache = _decode_one(params, cfg, tok, pos, cache, uniform_start)
        if bias_ids is not None:
            logits = apply_logit_bias(logits, bias_ids, bias_vals)
        if use_counts:
            logits = apply_penalties(
                logits, cnt,
                0.0 if presence is None else presence,
                0.0 if frequency is None else frequency,
            )
        if allowed_mask is not None:
            # grammar-constrained slots: illegal continuations go to -inf
            # (the host recomputes per-slot masks between chunks, so
            # constrained batches run n_steps=1; unconstrained rows pass
            # an all-True mask)
            logits = jnp.where(allowed_mask, logits, -jnp.inf)
        key, sub = jax.random.split(key)
        nxt = sample_logits(
            logits, sub, temperature, top_k, top_p, top_k_rows, min_p
        ).astype(tok.dtype)
        if active is not None:
            # frozen slots keep emitting their token and never advance
            nxt = jnp.where(active, nxt, tok)
            pos_next = jnp.where(active, pos + 1, pos)
        else:
            pos_next = pos + 1
        ys = tok
        if n_logprobs is not None:
            # logprob of the token sampled THIS step (emitted as toks[i+1]
            # or as next_tokens): [n_steps] ys align 1:1 with
            # toks[:, 1:] + next_tokens on the host
            ys = (tok, *token_logprobs(logits, nxt, n_logprobs))
        if use_counts:
            inc = (
                active.astype(jnp.int32) if active is not None
                else jnp.ones_like(nxt)
            )
            cnt = cnt.at[jnp.arange(nxt.shape[0]), nxt].add(inc)
            return (nxt, pos_next, cache, key, cnt), ys
        return (nxt, pos_next, cache, key), ys

    if use_counts:
        (next_tok, _, cache, key, counts), ys = jax.lax.scan(
            body, (first_tokens, start_pos, cache, key, counts),
            length=n_steps,
        )
        tail = (counts,)
    else:
        (next_tok, _, cache, key), ys = jax.lax.scan(
            body, (first_tokens, start_pos, cache, key), length=n_steps
        )
        tail = ()
    if n_logprobs is not None:
        toks, lp, tid, tlp = ys
        tail = tail + (
            jnp.moveaxis(lp, 0, 1),  # [B, n_steps]
            jnp.moveaxis(tid, 0, 1),  # [B, n_steps, k]
            jnp.moveaxis(tlp, 0, 1),
        )
    else:
        toks = ys
    return (jnp.moveaxis(toks, 0, 1), next_tok, cache, key) + tail


def _decode_one(params, cfg, tokens, positions, cache, uniform_start=True):
    h, cache = forward(
        params, cfg, tokens[:, None], positions[:, None], cache,
        uniform_start=uniform_start,
    )
    return logits_for(params, h, cfg)[:, 0, :], cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill_slot_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [1, T_chunk]
    positions: jax.Array,  # [1, T_chunk]
    last_index: jax.Array,  # [1]
    cache: KVCache,  # full batched cache [L, B, S, KVD]
    slot: jax.Array,  # scalar: which batch slot to prefill into
) -> tuple[jax.Array, KVCache]:
    """Prefill one sequence into batch slot `slot` of a shared cache.

    Continuous batching admits requests one at a time while other slots keep
    their decoded state: the slot's cache lane is sliced out, the chunk runs
    as a batch-1 forward, and the lane is written back.
    """
    def lane(a):
        return (
            jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)
            if a is not None
            else None
        )

    h, slot_cache = forward(
        params, cfg, tokens, positions,
        KVCache(lane(cache.k), lane(cache.v), lane(cache.ks), lane(cache.vs)),
    )
    h_last = jnp.take_along_axis(h, last_index[:, None, None], axis=1)
    logits = logits_for(params, h_last, cfg)[:, 0, :]

    def back(a, s):
        return (
            jax.lax.dynamic_update_slice_in_dim(a, s, slot, axis=1)
            if a is not None
            else None
        )

    return logits, KVCache(
        back(cache.k, slot_cache.k), back(cache.v, slot_cache.v),
        back(cache.ks, slot_cache.ks), back(cache.vs, slot_cache.vs),
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def paged_prefill_step(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [1, T_chunk]
    positions: jax.Array,  # [1, T_chunk]
    last_index: jax.Array,  # [1]
    cache,  # PagedKVCache pool [L, Hkv, P, ps, D]
    tables: jax.Array,  # [1, max_pages] the slot's block table
) -> tuple[jax.Array, Any]:
    """Prefill one sequence's (padded) chunk through its block table; returns
    logits at the chunk's last real token + the updated pool. Unlike the
    dense `prefill_slot_step` there is no per-slot cache lane to slice — the
    pool is shared and the table isolates the slot's pages."""
    h, cache = forward(
        params, cfg, tokens, positions, cache, page_tables=tables
    )
    h_last = jnp.take_along_axis(h, last_index[:, None, None], axis=1)
    return logits_for(params, h_last, cfg)[:, 0, :], cache


@partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "top_k", "n_logprobs"),
    donate_argnames=("cache",),
)
def paged_decode_loop(
    params: dict,
    cfg: LlamaConfig,
    first_tokens: jax.Array,  # [B]
    start_pos: jax.Array,  # [B]
    cache,  # PagedKVCache pool
    tables: jax.Array,  # [B, max_pages]
    key: jax.Array,
    n_steps: int,
    temperature: jax.Array | float = 0.0,
    top_k: int = 40,
    top_p: jax.Array | float = 0.95,
    active: jax.Array | None = None,
    top_k_rows: jax.Array | None = None,
    min_p: jax.Array | float = 0.0,
    bias_ids: jax.Array | None = None,
    bias_vals: jax.Array | None = None,
    presence: jax.Array | float | None = None,
    frequency: jax.Array | float | None = None,
    counts: jax.Array | None = None,
    n_logprobs: int | None = None,
    allowed_mask: jax.Array | None = None,  # [B, V] bool: legal next tokens
) -> tuple:
    """`decode_loop` over the paged pool: same fused-chunk semantics, with
    KV writes scattered through the block tables and attention via the
    block-table flash kernel. Sampling extensions (incl. `n_logprobs`
    outputs) as in `decode_loop`."""
    from ..ops.sampling import (
        apply_logit_bias,
        apply_penalties,
        sample_logits,
        token_logprobs,
    )

    use_counts = counts is not None

    def body(carry, _):
        if use_counts:
            tok, pos, cache, key, cnt = carry
        else:
            tok, pos, cache, key = carry
            cnt = None
        h, cache = forward(
            params, cfg, tok[:, None], pos[:, None], cache,
            page_tables=tables,
        )
        logits = logits_for(params, h, cfg)[:, 0, :]
        if bias_ids is not None:
            logits = apply_logit_bias(logits, bias_ids, bias_vals)
        if use_counts:
            logits = apply_penalties(
                logits, cnt,
                0.0 if presence is None else presence,
                0.0 if frequency is None else frequency,
            )
        if allowed_mask is not None:
            logits = jnp.where(allowed_mask, logits, -jnp.inf)
        key, sub = jax.random.split(key)
        nxt = sample_logits(
            logits, sub, temperature, top_k, top_p, top_k_rows, min_p
        ).astype(tok.dtype)
        if active is not None:
            nxt = jnp.where(active, nxt, tok)
            pos_next = jnp.where(active, pos + 1, pos)
        else:
            pos_next = pos + 1
        ys = tok
        if n_logprobs is not None:
            ys = (tok, *token_logprobs(logits, nxt, n_logprobs))
        if use_counts:
            inc = (
                active.astype(jnp.int32) if active is not None
                else jnp.ones_like(nxt)
            )
            cnt = cnt.at[jnp.arange(nxt.shape[0]), nxt].add(inc)
            return (nxt, pos_next, cache, key, cnt), ys
        return (nxt, pos_next, cache, key), ys

    if use_counts:
        (next_tok, _, cache, key, counts), ys = jax.lax.scan(
            body, (first_tokens, start_pos, cache, key, counts),
            length=n_steps,
        )
        tail = (counts,)
    else:
        (next_tok, _, cache, key), ys = jax.lax.scan(
            body, (first_tokens, start_pos, cache, key), length=n_steps
        )
        tail = ()
    if n_logprobs is not None:
        toks, lp, tid, tlp = ys
        tail = tail + (
            jnp.moveaxis(lp, 0, 1),
            jnp.moveaxis(tid, 0, 1),
            jnp.moveaxis(tlp, 0, 1),
        )
    else:
        toks = ys
    return (jnp.moveaxis(toks, 0, 1), next_tok, cache, key) + tail


def _fuse_projections(layers: dict, cfg: LlamaConfig) -> None:
    """Fuse per-layer [wq|wk|wv] -> wqkv and [w_gate|w_up] -> w_gate_up when
    every layer's parts are compatible (same quant kind/group, or all dense).
    Mutates `layers` in place; reduces kernel launches per layer from 7 to 4
    (Q4_K_M files mix Q6_K attn_v tensors — those layers stay split)."""
    from ..ops.qtensor import concat_qtensors

    def fuse_group(names: list[str], out_name: str, bias_names=None, bias_out=None):
        if not all(n in layers for n in names):
            return  # checkpoint shipped this group pre-fused
        cols = [layers[n] for n in names]
        fused = []
        for parts in zip(*cols):
            if all(isinstance(p, QTensor) for p in parts):
                first = parts[0]
                if not all(
                    p.kind == first.kind
                    and p.group == first.group
                    and p.k == first.k
                    for p in parts
                ):
                    return  # mixed kinds somewhere: keep everything split
                fused.append(concat_qtensors(list(parts)))
            elif all(isinstance(p, np.ndarray) for p in parts):
                fused.append(np.concatenate(parts, axis=-1))
            else:
                return  # quantized/dense mix: keep split
        layers[out_name] = fused
        for n in names:
            del layers[n]
        if bias_names and all(b in layers for b in bias_names):
            layers[bias_out] = [
                np.concatenate(parts, axis=-1)
                for parts in zip(*[layers[b] for b in bias_names])
            ]
            for b in bias_names:
                del layers[b]

    fuse_group(
        ["wq", "wk", "wv"],
        "wqkv",
        ["wq_bias", "wk_bias", "wv_bias"] if cfg.attn_bias else None,
        "wqkv_bias",
    )
    fuse_group(["w_gate", "w_up"], "w_gate_up")


def _fuse_projections_tp(layers: dict, cfg: LlamaConfig, tp: int) -> None:
    """TP-aware fusion: like _fuse_projections, but the fused columns are
    INTERLEAVED per shard ([q_c|k_c|v_c] / [gate_c|up_c] for shard c, see
    ops.qtensor.tp_fused_col_perm) so each contiguous column shard is
    itself a fused local projection — the whole-scan shard_map decode path
    (_decode_forward_fused_tp) then launches ONE fused kernel per shard.
    Consumers outside shard_map un-permute the OUTPUT columns. Only fuses
    groups where every layer's parts are column-markable QTensors of one
    kind; everything else stays split (the unfused TP path still works)."""
    from ..ops.qtensor import (
        concat_qtensors, permute_qtensor_cols, tp_fused_col_perm,
    )

    def fuse_group(names, widths, out_name, bias_names=None, bias_out=None):
        if not all(n in layers for n in names):
            return
        if any(w % tp for w in widths):
            return
        cols = [layers[n] for n in names]
        perm = tp_fused_col_perm(widths, tp)
        fused = []
        for parts in zip(*cols):
            first = parts[0]
            if not all(
                isinstance(p, QTensor)
                and p.kind == first.kind
                and p.kind in ("q4", "q8")
                and p.group == first.group
                and p.k == first.k
                and p.sections == 1
                and p.tp_mode == "col"
                for p in parts
            ):
                return  # unmarked / mixed parts: keep split
            f = permute_qtensor_cols(concat_qtensors(list(parts)), perm)
            fused.append(f.replace(tp_mode="col", tpi=tp))
        layers[out_name] = fused
        for n in names:
            del layers[n]
        if bias_names and all(b in layers for b in bias_names):
            layers[bias_out] = [
                np.concatenate(parts, axis=-1)[perm]
                for parts in zip(*[layers[b] for b in bias_names])
            ]
            for b in bias_names:
                del layers[b]

    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    fuse_group(
        ["wq", "wk", "wv"], [qd, kvd, kvd], "wqkv",
        ["wq_bias", "wk_bias", "wv_bias"] if cfg.attn_bias else None,
        "wqkv_bias",
    )
    fuse_group(
        ["w_gate", "w_up"], [cfg.ffn_dim, cfg.ffn_dim], "w_gate_up"
    )


# "grouped": sort (token, expert) pairs by expert and run ragged matmuls —
# compute scales with the experts actually USED (top-k), not all E.
# "dense": compute every expert and mix (O(E/k) overcompute; reference
# semantics in its simplest form — kept as the parity oracle in tests).
MOE_IMPL = "grouped"


def _moe_route(x, lp, cfg):
    """Router softmax + top-k (qwen3moe semantics). Returns [N, used] weights
    and expert ids over the flattened token axis."""
    n = x.shape[0]
    router_logits = jnp.einsum(
        "nh,he->ne", x.astype(jnp.float32), lp["router"].astype(jnp.float32)
    )
    probs = jax.nn.softmax(router_logits, axis=-1)  # [N, E]
    top_vals, top_idx = jax.lax.top_k(probs, cfg.n_experts_used)
    if cfg.norm_topk_prob:
        top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    return top_vals, top_idx


def _moe_ffn_dense(x: jax.Array, lp: dict, cfg: LlamaConfig, act) -> jax.Array:
    """All-expert dense compute + sparse mix (exact, O(E/k) overcompute)."""
    b, t, hdim = x.shape
    e = cfg.n_experts
    xf = x.reshape(b * t, hdim)
    top_vals, top_idx = _moe_route(xf, lp, cfg)
    # scatter the top-k weights back to a dense [N, E] mixing vector
    mix = jnp.sum(
        jax.nn.one_hot(top_idx, e, dtype=jnp.float32) * top_vals[..., None],
        axis=-2,
    )
    xe = xf.astype(lp["w_gate_exps"].dtype)
    gate = jnp.einsum("nh,ehf->nef", xe, lp["w_gate_exps"])
    up = jnp.einsum("nh,ehf->nef", xe, lp["w_up_exps"])
    inner = act(gate) * up  # [N,E,F]
    down = jnp.einsum("nef,efh->neh", inner, lp["w_down_exps"])
    out = jnp.einsum("neh,ne->nh", down.astype(jnp.float32), mix)
    return out.reshape(b, t, hdim).astype(x.dtype)


def _moe_ffn_grouped(x: jax.Array, lp: dict, cfg: LlamaConfig, act) -> jax.Array:
    """Grouped-matmul MoE: FLOPs scale with top-k, not with E.

    The (token, expert-slot) pairs are sorted by expert id so each expert's
    rows are contiguous, then the three expert matmuls run as
    `jax.lax.ragged_dot` (XLA's grouped matmul — the megablox contract) over
    the stacked [E, K, N] weights. Results are weighted by the routing
    probabilities and segment-summed back per token. Static shapes
    throughout ([N*k] rows regardless of routing), so one compiled program
    serves every routing pattern.

    Replaces the reference's per-expert dense loop semantics
    (the reference has no MoE; HF Qwen3MoeSparseMoeBlock is the parity
    oracle via tests/test_moe.py) at serving-grade cost.
    """
    b, t, hdim = x.shape
    e, used = cfg.n_experts, cfg.n_experts_used
    n = b * t
    xf = x.reshape(n, hdim)
    top_vals, top_idx = _moe_route(xf, lp, cfg)
    flat_expert = top_idx.reshape(-1)  # [N*used]
    flat_weight = top_vals.reshape(-1)
    order = jnp.argsort(flat_expert)  # stable: ties keep token order
    token_of = order // used  # originating token of each sorted row
    group_sizes = jnp.bincount(flat_expert, length=e).astype(jnp.int32)
    wdt = lp["w_gate_exps"].dtype
    xs = xf[token_of].astype(wdt)  # [N*used, H] expert-sorted rows

    def rdot(lhs, w):
        return jax.lax.ragged_dot(
            lhs, w, group_sizes, preferred_element_type=jnp.float32
        )

    gate = rdot(xs, lp["w_gate_exps"])
    up = rdot(xs, lp["w_up_exps"])
    inner = (act(gate) * up).astype(wdt)  # [N*used, F]
    down = rdot(inner, lp["w_down_exps"])  # [N*used, H] f32
    down = down * flat_weight[order][:, None]
    out = jnp.zeros((n, hdim), jnp.float32).at[token_of].add(down)
    return out.reshape(b, t, hdim).astype(x.dtype)


def _moe_group_layout(flat_expert, n_rows: int, e: int, tm: int):
    """Group-aligned padded row layout for the quantized grouped kernels:
    sorted (token, slot) rows are scattered so each expert's rows start at
    a tm-aligned offset — every tm-row block then belongs to exactly ONE
    expert (ops.qmatmul.qmatmul_grouped contract). Returns (order, dst
    [rows] padded positions, block_group [M_pad/tm], m_pad)."""
    order = jnp.argsort(flat_expert)  # stable: ties keep token order
    sorted_expert = flat_expert[order]
    sizes = jnp.bincount(flat_expert, length=e).astype(jnp.int32)
    padded = ((sizes + tm - 1) // tm) * tm
    offs = jnp.cumsum(padded) - padded  # start offset per expert
    csizes = jnp.cumsum(sizes) - sizes
    within = jnp.arange(n_rows, dtype=jnp.int32) - csizes[sorted_expert]
    dst = offs[sorted_expert] + within
    # static worst case: every active expert wastes < tm padding rows
    m_pad = -(-(n_rows + (tm - 1) * min(e, n_rows)) // tm) * tm
    ends = offs + padded
    block_start = jnp.arange(m_pad // tm, dtype=jnp.int32) * tm
    block_group = jnp.clip(
        jnp.searchsorted(ends, block_start, side="right"), 0, e - 1
    ).astype(jnp.int32)
    return order, dst, block_group, m_pad


def _moe_ffn_grouped_q(
    x: jax.Array, lp: dict, cfg: LlamaConfig, act,
    expert_base: jax.Array | None = None,
) -> jax.Array:
    """Quantized grouped MoE: expert weights stay in their 4/8-bit
    containers in HBM (ggml ships MoE checkpoints quantized — dense
    dequant at load would multiply the footprint ~4x) and the three expert
    matmuls run the grouped quantized Pallas kernels over group-aligned
    padded rows (see qmatmul.qmatmul_grouped). `expert_base` (fused decode
    path) offsets expert ids into [L*E]-flattened containers."""
    from ..ops.qmatmul import qmatmul_grouped

    b, t, hdim = x.shape
    e, used = cfg.n_experts, cfg.n_experts_used
    n = b * t
    xf = x.reshape(n, hdim)
    top_vals, top_idx = _moe_route(xf, lp, cfg)
    flat_expert = top_idx.reshape(-1)
    flat_weight = top_vals.reshape(-1)
    rows = n * used
    # decode keeps tm minimal (one weight fetch per hit expert); prefill
    # raises it so each expert's weight tiles amortize over more rows
    tm = 8 if rows <= 512 else (32 if rows <= 4096 else 128)
    order, dst, block_group, m_pad = _moe_group_layout(flat_expert, rows, e, tm)
    token_of = order // used
    if expert_base is not None:
        block_group = block_group + expert_base
    x_pad = jnp.zeros((m_pad, hdim), jnp.bfloat16).at[dst].set(
        xf[token_of].astype(jnp.bfloat16)
    )
    gate = qmatmul_grouped(x_pad, lp["w_gate_exps"], block_group, tm)
    up = qmatmul_grouped(x_pad, lp["w_up_exps"], block_group, tm)
    inner = (
        act(gate.astype(jnp.float32)) * up.astype(jnp.float32)
    ).astype(jnp.bfloat16)
    down = qmatmul_grouped(inner, lp["w_down_exps"], block_group, tm)
    dsel = down[dst].astype(jnp.float32) * flat_weight[order][:, None]
    out = jnp.zeros((n, hdim), jnp.float32).at[token_of].add(dsel)
    return out.reshape(b, t, hdim).astype(x.dtype)


def _moe_ffn(x: jax.Array, lp: dict, cfg: LlamaConfig, act) -> jax.Array:
    """Mixture-of-experts FFN (qwen3moe): softmax router, top-k dispatch with
    optionally renormalized weights. Quantized expert stacks take the
    grouped quantized kernels; dense stacks dispatch on MOE_IMPL."""
    if cfg.ep_axis and _EP_CTX is not None:
        from ..parallel.expert_parallel import moe_ffn_ep

        mesh, axis = _EP_CTX
        if cfg.n_experts % mesh.shape[axis] == 0:
            b, t, hdim = x.shape
            out = moe_ffn_ep(
                x.reshape(b * t, hdim), lp, cfg, act, mesh, axis=axis
            )
            return out.reshape(b, t, hdim).astype(x.dtype)
    if isinstance(lp.get("w_gate_exps"), QTensor):
        return _moe_ffn_grouped_q(x, lp, cfg, act)
    if MOE_IMPL == "grouped":
        return _moe_ffn_grouped(x, lp, cfg, act)
    return _moe_ffn_dense(x, lp, cfg, act)
