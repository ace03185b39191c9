"""Tokenization: byte-level BPE, SentencePiece-style SPM, chat templates."""
from .bpe import (  # noqa: F401
    BPETokenizer,
    StreamDetokenizer,
    TokenType,
    bytes_to_unicode,
    unicode_to_bytes,
)
from .chat_template import (  # noqa: F401
    DEFAULT_SYSTEM_PROMPT,
    LLAMA3_FALLBACK_TEMPLATE,
    ChatTemplate,
    Message,
)
from .spm import SPMTokenizer  # noqa: F401


def tokenizer_from_gguf(metadata: dict):
    """Dispatch on ``tokenizer.ggml.model``: "gpt2" → byte-level BPE
    (llama-3, qwen), "llama" → SPM (llama-2, gemma, mistral-v0.1)."""
    from ..gguf.constants import Keys

    model = str(metadata.get(Keys.TOKENIZER_MODEL, "gpt2"))
    if model == "llama":
        return SPMTokenizer.from_gguf_metadata(metadata)
    return BPETokenizer.from_gguf_metadata(metadata)
