"""Model families: configs, weight loading, forward passes, factory registry."""
from .llama import (  # noqa: F401
    KVCache,
    LlamaConfig,
    decode_step,
    forward,
    load_params,
    logits_for,
    prefill_step,
)
from .registry import ModelFamily, register_family, resolve  # noqa: F401
