"""Tokenization: byte-level BPE + chat templates."""
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
