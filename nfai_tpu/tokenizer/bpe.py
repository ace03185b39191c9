"""Byte-level BPE tokenizer (GPT-2 / Llama-3 style), built from GGUF metadata.

Parity target: ``NFAI.Models.Llama3/Tokenizer.cs`` — vocab/merges from
``tokenizer.ggml.tokens``/``.merges`` (:16-58), special-token splitting
(:93-107), GPT-2 pre-tokenization regex (:109-111), greedy lowest-rank merge
loop (:130-166), Ġ/Ċ byte-alias detokenization (:432-462).

Differences from the reference (deliberate):
- full GPT-2 ``bytes_to_unicode`` alias table instead of the reference's
  hand-rolled ``0xC4 + offset`` hack for space/newline only (:242-267);
- rank-dict merge loop, O(len·log) per word instead of O(len·merges) scans;
- special tokens discovered from ``tokenizer.ggml.token_type`` (CONTROL /
  USER_DEFINED) instead of a ``<|...|>`` regex.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Iterable

import regex

from ..gguf.constants import Keys

# llama.cpp "llama-bpe" pre-tokenizer regex (Llama-3 family); also the
# reference's metaTokenPattern (Tokenizer.cs:109-111).
LLAMA3_PRETOKENIZE = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

# GPT-2 pre-tokenizer (used by "gpt-2"-pre models)
GPT2_PRETOKENIZE = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)

# llama.cpp "qwen2" pre-tokenizer (single-digit \p{N} split)
QWEN2_PRETOKENIZE = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

_PRETOKENIZERS = {
    "llama3": LLAMA3_PRETOKENIZE,
    "llama-bpe": LLAMA3_PRETOKENIZE,
    "gpt-2": GPT2_PRETOKENIZE,
    "qwen2": QWEN2_PRETOKENIZE,
    "deepseek-r1-qwen": QWEN2_PRETOKENIZE,
    "default": LLAMA3_PRETOKENIZE,
}


class TokenType:
    """``tokenizer.ggml.token_type`` values (llama.cpp llama_token_type)."""

    NORMAL = 1
    UNKNOWN = 2
    CONTROL = 3
    USER_DEFINED = 4
    UNUSED = 5
    BYTE = 6


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte → printable-unicode-char alias table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


@functools.lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {v: k for k, v in bytes_to_unicode().items()}


@dataclass
class BPETokenizer:
    """Vocabulary + merges; encode/decode between text and token ids."""

    vocab: dict[str, int]  # token string (byte-alias space) → id
    merges: dict[tuple[str, str], int]  # pair → rank
    token_types: list[int]
    bos_id: int | None = None
    eos_id: int | None = None
    pad_id: int | None = None
    add_bos: bool = True
    add_eos: bool = False
    pre: str = "default"
    eos_ids: set[int] = field(default_factory=set)  # all stop ids (eot etc.)

    def __post_init__(self):
        self.id_to_token = {i: t for t, i in self.vocab.items()}
        self._special: dict[str, int] = {
            tok: i
            for tok, i in self.vocab.items()
            if 0 <= i < len(self.token_types)
            and self.token_types[i] in (TokenType.CONTROL, TokenType.USER_DEFINED)
        }
        if self._special:
            # longest-first alternation so overlapping specials match greedily
            pattern = "|".join(
                regex.escape(t) for t in sorted(self._special, key=len, reverse=True)
            )
            self._special_re = regex.compile(f"({pattern})")
        else:
            self._special_re = None
        self._pretok_re = regex.compile(_PRETOKENIZERS.get(self.pre, LLAMA3_PRETOKENIZE))
        if self.eos_id is not None:
            self.eos_ids.add(self.eos_id)
        # Llama-3 instruct stops on <|eot_id|>/<|eom_id|> as well as <|end_of_text|>
        for name in ("<|eot_id|>", "<|eom_id|>", "<|im_end|>", "</s>"):
            if name in self.vocab:
                self.eos_ids.add(self.vocab[name])

    # -- construction ------------------------------------------------------
    @classmethod
    def from_gguf_metadata(cls, md: dict[str, Any]) -> "BPETokenizer":
        tokens: list[str] = md[Keys.TOKENIZER_TOKENS]
        vocab = {t: i for i, t in enumerate(tokens)}
        merges_list: Iterable[str] = md.get(Keys.TOKENIZER_MERGES, [])
        merges = {}
        for rank, m in enumerate(merges_list):
            left, _, right = m.partition(" ")
            merges[(left, right)] = rank
        token_types = md.get(Keys.TOKENIZER_TOKEN_TYPE)
        if token_types is None:
            token_types = [TokenType.NORMAL] * len(tokens)
        return cls(
            vocab=vocab,
            merges=merges,
            token_types=[int(t) for t in token_types],
            bos_id=md.get(Keys.TOKENIZER_BOS),
            eos_id=md.get(Keys.TOKENIZER_EOS),
            pad_id=md.get(Keys.TOKENIZER_PAD),
            add_bos=bool(md.get(Keys.TOKENIZER_ADD_BOS, True)),
            add_eos=bool(md.get(Keys.TOKENIZER_ADD_EOS, False)),
            pre=str(md.get(Keys.TOKENIZER_PRE, "default")),
        )

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    # -- BPE ---------------------------------------------------------------
    def _bpe_word(self, word: str) -> list[str]:
        """Merge a single pre-token (in byte-alias space) by lowest rank first."""
        parts = list(word)
        if len(parts) < 2:
            return parts
        while True:
            best_rank = None
            best_idx = -1
            for j in range(len(parts) - 1):
                rank = self.merges.get((parts[j], parts[j + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank = rank
                    best_idx = j
            if best_rank is None:
                return parts
            parts[best_idx : best_idx + 2] = [parts[best_idx] + parts[best_idx + 1]]

    def _encode_ordinary(self, text: str) -> list[int]:
        """Encode text containing no special tokens."""
        b2u = bytes_to_unicode()
        ids: list[int] = []
        for match in self._pretok_re.finditer(text):
            word = "".join(b2u[b] for b in match.group().encode("utf-8"))
            for piece in self._bpe_word(word):
                tid = self.vocab.get(piece)
                if tid is not None:
                    ids.append(tid)
                else:  # unmergeable byte fallback
                    u2b = unicode_to_bytes()
                    for ch in piece:
                        byte_tok = f"<0x{u2b.get(ch, ord(ch)):02X}>"
                        if byte_tok in self.vocab:
                            ids.append(self.vocab[byte_tok])
        return ids

    def encode(
        self,
        text: str,
        add_bos: bool | None = None,
        add_eos: bool | None = None,
        parse_special: bool = True,
    ) -> list[int]:
        ids: list[int] = []
        if add_bos if add_bos is not None else self.add_bos:
            if self.bos_id is not None:
                ids.append(self.bos_id)
        if parse_special and self._special_re is not None:
            pos = 0
            for m in self._special_re.finditer(text):
                ids.extend(self._encode_ordinary(text[pos : m.start()]))
                ids.append(self._special[m.group()])
                pos = m.end()
            ids.extend(self._encode_ordinary(text[pos:]))
        else:
            ids.extend(self._encode_ordinary(text))
        if add_eos if add_eos is not None else self.add_eos:
            if self.eos_id is not None:
                ids.append(self.eos_id)
        return ids

    # -- decode ------------------------------------------------------------
    def decode_token_bytes(self, token_id: int) -> bytes:
        """Raw bytes for one token (special tokens → their literal text)."""
        tok = self.id_to_token.get(token_id)
        if tok is None:
            return b""
        ttype = (
            self.token_types[token_id]
            if 0 <= token_id < len(self.token_types)
            else TokenType.NORMAL
        )
        if ttype == TokenType.BYTE and tok.startswith("<0x") and tok.endswith(">"):
            return bytes([int(tok[3:-1], 16)])
        if ttype in (TokenType.CONTROL, TokenType.USER_DEFINED, TokenType.UNKNOWN):
            return tok.encode("utf-8")
        u2b = unicode_to_bytes()
        return bytes(u2b.get(ch, ord(ch) & 0xFF) for ch in tok)

    def decode(self, ids: Iterable[int], skip_special: bool = False) -> str:
        out = bytearray()
        for i in ids:
            if skip_special and (
                0 <= i < len(self.token_types)
                and self.token_types[i] == TokenType.CONTROL
            ):
                continue
            out += self.decode_token_bytes(i)
        return out.decode("utf-8", errors="replace")

    def is_eos(self, token_id: int) -> bool:
        return token_id in self.eos_ids


class StreamDetokenizer:
    """Incremental detokenizer that holds back incomplete UTF-8 sequences.

    The reference detokenizes token-by-token and can emit broken multi-byte
    characters (Tokenizer.cs:432-462); this buffers partial codepoints.
    """

    def __init__(self, tokenizer: BPETokenizer, skip_special: bool = True):
        self.tok = tokenizer
        self.skip_special = skip_special
        self._buf = bytearray()

    def push(self, token_id: int) -> str:
        if self.skip_special and (
            0 <= token_id < len(self.tok.token_types)
            and self.tok.token_types[token_id] == TokenType.CONTROL
        ):
            return ""
        self._buf += self.tok.decode_token_bytes(token_id)
        try:
            text = self._buf.decode("utf-8")
            self._buf.clear()
            return text
        except UnicodeDecodeError as e:
            if e.start > 0:  # emit the complete prefix, keep the tail
                text = self._buf[: e.start].decode("utf-8")
                del self._buf[: e.start]
                return text
            return ""

    def flush(self) -> str:
        text = self._buf.decode("utf-8", errors="replace")
        self._buf.clear()
        return text
