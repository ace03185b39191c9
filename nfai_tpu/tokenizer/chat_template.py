"""Chat template rendering.

Parity target: the reference hardcodes the Llama-3 chat format with a fixed
system prompt (``NFAI.Models.Llama3/Tokenizer.cs:70-91``). Here the template is
read from GGUF ``tokenizer.chat_template`` (a Jinja2 string, rendered in a
sandbox the way HF transformers does) with a built-in Llama-3 fallback, and the
system prompt is configurable.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

DEFAULT_SYSTEM_PROMPT = "You are a helpful assistant."

# Built-in fallback equivalent to the Llama-3 instruct format the reference
# hardcodes (Tokenizer.cs:70-91).
LLAMA3_FALLBACK_TEMPLATE = (
    "{{- bos_token }}"
    "{%- for message in messages %}"
    "{{- '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n' "
    "+ message['content'] | trim + '<|eot_id|>' }}"
    "{%- endfor %}"
    "{%- if add_generation_prompt %}"
    "{{- '<|start_header_id|>assistant<|end_header_id|>\n\n' }}"
    "{%- endif %}"
)


@dataclass
class Message:
    role: str
    content: str

    def asdict(self) -> dict[str, str]:
        return {"role": self.role, "content": self.content}


def _normalize(messages: Sequence[Any]) -> list[dict[str, str]]:
    out = []
    for m in messages:
        if isinstance(m, Message):
            out.append(m.asdict())
        elif isinstance(m, dict):
            out.append({"role": str(m["role"]), "content": str(m["content"])})
        else:
            raise TypeError(f"bad message {m!r}")
    return out


class ChatTemplate:
    """Renders a message list into the model's prompt string."""

    def __init__(self, template: str | None, bos_token: str = "", eos_token: str = ""):
        import jinja2
        from jinja2.sandbox import ImmutableSandboxedEnvironment

        self.source = template or LLAMA3_FALLBACK_TEMPLATE
        env = ImmutableSandboxedEnvironment(
            trim_blocks=True, lstrip_blocks=True, extensions=[]
        )

        def raise_exception(msg):
            raise jinja2.exceptions.TemplateError(msg)

        def strftime_now(fmt):
            import datetime

            return datetime.datetime.now().strftime(fmt)

        env.globals["raise_exception"] = raise_exception
        env.globals["strftime_now"] = strftime_now
        env.filters["tojson"] = __import__("json").dumps
        self._template = env.from_string(self.source)
        self.bos_token = bos_token
        self.eos_token = eos_token

    def render(
        self,
        messages: Sequence[Any],
        add_generation_prompt: bool = True,
        **extra: Any,
    ) -> str:
        return self._template.render(
            messages=_normalize(messages),
            add_generation_prompt=add_generation_prompt,
            bos_token=self.bos_token,
            eos_token=self.eos_token,
            **extra,
        )
