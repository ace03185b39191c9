"""GGUF / GGML constants: magic numbers, metadata value types, tensor dtypes.

Parity target: the reference's dtype-id table (``NFAI.GGUF/Parser.cs:262-293``)
covers GGML ids 0..29 by *name* only; this module additionally records the real
block layouts (elements per block, bytes per block) that the reference ignored
(it treated Q8_0 as raw bytes + one trailing scale, ``Parser.cs:93-100``).
"""
from __future__ import annotations

import enum
from dataclasses import dataclass

GGUF_MAGIC = 0x46554747  # b"GGUF" little-endian
GGUF_VERSION = 3
GGUF_DEFAULT_ALIGNMENT = 32  # reference: Parser.cs:14 (general.alignment default)


class GGUFValueType(enum.IntEnum):
    """Metadata value types (reference: Parser.cs:145-236 switch arms)."""

    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


class GGMLType(enum.IntEnum):
    """GGML tensor dtypes (reference dtype-id table: Parser.cs:262-293)."""

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    # ids 4 and 5 (Q4_2 / Q4_3) were removed from ggml
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    Q8_K = 15
    IQ2_XXS = 16
    IQ2_XS = 17
    IQ3_XXS = 18
    IQ1_S = 19
    IQ4_NL = 20
    IQ3_S = 21
    IQ2_S = 22
    IQ4_XS = 23
    I8 = 24
    I16 = 25
    I32 = 26
    I64 = 27
    F64 = 28
    IQ1_M = 29
    BF16 = 30


@dataclass(frozen=True)
class BlockLayout:
    """Block quantization layout: `block_size` elements stored in `type_size` bytes."""

    block_size: int  # elements per block
    type_size: int  # bytes per block


QK_K = 256  # super-block size for K-quants

GGML_BLOCK_LAYOUT: dict[GGMLType, BlockLayout] = {
    GGMLType.F32: BlockLayout(1, 4),
    GGMLType.F16: BlockLayout(1, 2),
    GGMLType.Q4_0: BlockLayout(32, 18),  # f16 d + 16B nibbles
    GGMLType.Q4_1: BlockLayout(32, 20),  # f16 d, f16 m + 16B nibbles
    GGMLType.Q5_0: BlockLayout(32, 22),  # f16 d, u32 qh + 16B nibbles
    GGMLType.Q5_1: BlockLayout(32, 24),  # f16 d, f16 m, u32 qh + 16B nibbles
    GGMLType.Q8_0: BlockLayout(32, 34),  # f16 d + 32 int8
    GGMLType.Q8_1: BlockLayout(32, 36),  # f16 d, f16 s + 32 int8
    GGMLType.Q2_K: BlockLayout(QK_K, 84),
    GGMLType.Q3_K: BlockLayout(QK_K, 110),
    GGMLType.Q4_K: BlockLayout(QK_K, 144),
    GGMLType.Q5_K: BlockLayout(QK_K, 176),
    GGMLType.Q6_K: BlockLayout(QK_K, 210),
    GGMLType.Q8_K: BlockLayout(QK_K, 292),
    GGMLType.IQ2_XXS: BlockLayout(QK_K, 66),
    GGMLType.IQ2_XS: BlockLayout(QK_K, 74),
    GGMLType.IQ3_XXS: BlockLayout(QK_K, 98),
    GGMLType.IQ1_S: BlockLayout(QK_K, 50),
    GGMLType.IQ4_NL: BlockLayout(32, 18),
    GGMLType.IQ3_S: BlockLayout(QK_K, 110),
    GGMLType.IQ2_S: BlockLayout(QK_K, 82),
    GGMLType.IQ4_XS: BlockLayout(QK_K, 136),
    GGMLType.I8: BlockLayout(1, 1),
    GGMLType.I16: BlockLayout(1, 2),
    GGMLType.I32: BlockLayout(1, 4),
    GGMLType.I64: BlockLayout(1, 8),
    GGMLType.F64: BlockLayout(1, 8),
    GGMLType.IQ1_M: BlockLayout(QK_K, 56),
    GGMLType.BF16: BlockLayout(1, 2),
}


def tensor_nbytes(n_elements: int, ggml_type: GGMLType) -> int:
    """Byte size of a tensor with `n_elements` elements stored as `ggml_type`."""
    layout = GGML_BLOCK_LAYOUT[ggml_type]
    if n_elements % layout.block_size != 0:
        raise ValueError(
            f"{ggml_type.name}: element count {n_elements} not a multiple of "
            f"block size {layout.block_size}"
        )
    return (n_elements // layout.block_size) * layout.type_size


# Well-known metadata keys (subset used by the model layer; reference reads
# these by string in LlamaModel.cs:23-39 and Tokenizer.cs:16-58).
class Keys:
    ARCHITECTURE = "general.architecture"
    NAME = "general.name"
    ALIGNMENT = "general.alignment"
    QUANTIZATION_VERSION = "general.quantization_version"
    FILE_TYPE = "general.file_type"

    # {arch}-prefixed keys
    CONTEXT_LENGTH = "{arch}.context_length"
    EMBEDDING_LENGTH = "{arch}.embedding_length"
    BLOCK_COUNT = "{arch}.block_count"
    FEED_FORWARD_LENGTH = "{arch}.feed_forward_length"
    HEAD_COUNT = "{arch}.attention.head_count"
    HEAD_COUNT_KV = "{arch}.attention.head_count_kv"
    LAYERNORM_RMS_EPS = "{arch}.attention.layer_norm_rms_epsilon"
    KEY_LENGTH = "{arch}.attention.key_length"
    VALUE_LENGTH = "{arch}.attention.value_length"
    ROPE_FREQ_BASE = "{arch}.rope.freq_base"
    ROPE_DIMENSION_COUNT = "{arch}.rope.dimension_count"
    ROPE_SCALING_TYPE = "{arch}.rope.scaling.type"
    ROPE_SCALING_FACTOR = "{arch}.rope.scaling.factor"
    ROPE_SCALING_LOW_FREQ = "{arch}.rope.scaling.low_freq_factor"
    ROPE_SCALING_HIGH_FREQ = "{arch}.rope.scaling.high_freq_factor"
    ROPE_SCALING_ORIG_CTX = "{arch}.rope.scaling.original_context_length"
    VOCAB_SIZE = "{arch}.vocab_size"
    EXPERT_COUNT = "{arch}.expert_count"
    EXPERT_USED_COUNT = "{arch}.expert_used_count"

    TOKENIZER_MODEL = "tokenizer.ggml.model"
    TOKENIZER_PRE = "tokenizer.ggml.pre"
    TOKENIZER_TOKENS = "tokenizer.ggml.tokens"
    TOKENIZER_TOKEN_TYPE = "tokenizer.ggml.token_type"
    TOKENIZER_MERGES = "tokenizer.ggml.merges"
    TOKENIZER_BOS = "tokenizer.ggml.bos_token_id"
    TOKENIZER_EOS = "tokenizer.ggml.eos_token_id"
    TOKENIZER_PAD = "tokenizer.ggml.padding_token_id"
    TOKENIZER_ADD_BOS = "tokenizer.ggml.add_bos_token"
    TOKENIZER_ADD_EOS = "tokenizer.ggml.add_eos_token"
    TOKENIZER_CHAT_TEMPLATE = "tokenizer.chat_template"
