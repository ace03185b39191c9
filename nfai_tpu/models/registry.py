"""Model factory registry: architecture sniffing → model family dispatch.

Parity target: ``NFAI.Models/AbstractModelFactory.cs:9`` (TryCreate chain) and
``NFAI.GGUF/Parser.cs:36-44`` (try each factory in turn). Here factories
register by architecture string; `resolve` picks the first that accepts the
file, so new families (qwen2, mistral, ...) plug in without touching the
loader.
"""
from __future__ import annotations

from typing import Callable, Protocol

from ..gguf import GGUFFile


class ModelFamily(Protocol):
    """What the engine needs from a model family."""

    def config_from_gguf(self, g: GGUFFile): ...

    def load_params(self, g: GGUFFile, cfg, **kw): ...

    def forward(self, params, cfg, tokens, positions, cache, **kw): ...


_REGISTRY: list[tuple[Callable[[GGUFFile], bool], Callable[[], ModelFamily]]] = []


def register_family(accepts: Callable[[GGUFFile], bool]):
    """Class decorator: register a model family with its acceptance test."""

    def deco(cls):
        _REGISTRY.append((accepts, cls))
        return cls

    return deco


def resolve(g: GGUFFile) -> ModelFamily:
    """Find the family for a GGUF file (reference: Parser.cs:36-44 loop)."""
    for accepts, cls in _REGISTRY:
        if accepts(g):
            return cls()
    raise ValueError(
        f"no registered model family accepts architecture "
        f"{g.architecture!r} (registered: {len(_REGISTRY)})"
    )


# -- built-in families -------------------------------------------------------

# architectures whose GGUF tensor schema is the llama layout, plus optional
# per-arch extras handled by config flags (qwen2 attn biases, qwen3 q/k norms)
LLAMA_LIKE_ARCHS = frozenset(
    {
        "llama", "mistral", "qwen2", "qwen3", "gemma", "gemma2", "gemma3",
        "phi3", "qwen3moe",
    }
)


@register_family(lambda g: g.architecture in LLAMA_LIKE_ARCHS)
class LlamaFamily:
    """Llama 2/3.x + Mistral + Qwen2/3 + Gemma 1/2/3 dense models
    (reference scope was llama-only: LlamaModelFactory.cs:36-41)."""

    def config_from_gguf(self, g: GGUFFile):
        from .llama import LlamaConfig

        return LlamaConfig.from_gguf(g)

    def load_params(self, g: GGUFFile, cfg, **kw):
        from .llama import load_params

        return load_params(g, cfg, **kw)

    def forward(self, params, cfg, tokens, positions, cache, **kw):
        from .llama import forward

        return forward(params, cfg, tokens, positions, cache, **kw)
