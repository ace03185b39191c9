"""Tokenizer tests: BPE merge order, byte-alias round-trips, special-token
splitting, streaming UTF-8 detokenization, chat template rendering
(SURVEY.md §4: tokenizer round-trip + golden vectors)."""
import numpy as np
import pytest

from nfai_tpu.gguf.constants import Keys
from nfai_tpu.tokenizer import (
    BPETokenizer,
    ChatTemplate,
    Message,
    StreamDetokenizer,
    TokenType,
    bytes_to_unicode,
)


def make_toy_tokenizer() -> BPETokenizer:
    """Tiny vocab: all 256 byte-alias singles + a few merges + specials."""
    b2u = bytes_to_unicode()
    tokens = [b2u[b] for b in range(256)]
    types = [TokenType.NORMAL] * 256

    def add(tok, ttype=TokenType.NORMAL):
        tokens.append(tok)
        types.append(ttype)
        return len(tokens) - 1

    # merges build "he", "ll", "hell", "hello", "Ġhello" ("Ġ"=space alias);
    # interleaved like a real bottom-up table so Ġ-variants stay reachable
    merges = ["Ġ h", "h e", "l l", "Ġh e", "he ll", "Ġhe ll", "hell o", "Ġhell o"]
    for m in merges:
        a, b = m.split(" ")
        add(a + b)
    bos = add("<|begin_of_text|>", TokenType.CONTROL)
    eot = add("<|eot_id|>", TokenType.CONTROL)
    add("<|start_header_id|>", TokenType.CONTROL)
    add("<|end_header_id|>", TokenType.CONTROL)
    md = {
        Keys.TOKENIZER_TOKENS: tokens,
        Keys.TOKENIZER_TOKEN_TYPE: types,
        Keys.TOKENIZER_MERGES: merges,
        Keys.TOKENIZER_BOS: bos,
        Keys.TOKENIZER_EOS: eot,
        Keys.TOKENIZER_PRE: "llama-bpe",
    }
    return BPETokenizer.from_gguf_metadata(md)


def test_merge_order_lowest_rank_first():
    tok = make_toy_tokenizer()
    ids = tok.encode("hello", add_bos=False)
    assert [tok.id_to_token[i] for i in ids] == ["hello"]


def test_space_prefix_merges():
    tok = make_toy_tokenizer()
    ids = tok.encode("hello hello", add_bos=False)
    assert [tok.id_to_token[i] for i in ids] == ["hello", "Ġhello"]


def test_bos_and_special_splitting():
    tok = make_toy_tokenizer()
    ids = tok.encode("<|begin_of_text|>hello<|eot_id|>", add_bos=False)
    toks = [tok.id_to_token[i] for i in ids]
    assert toks == ["<|begin_of_text|>", "hello", "<|eot_id|>"]
    # with parse_special off, the special text is split into pieces
    ids2 = tok.encode("<|eot_id|>", add_bos=False, parse_special=False)
    assert tok.vocab["<|eot_id|>"] not in ids2


def test_roundtrip_arbitrary_bytes():
    tok = make_toy_tokenizer()
    for text in ["hello world", "héllo ✓ 日本語", "a\nb\tc", "  leading spaces"]:
        ids = tok.encode(text, add_bos=False)
        assert tok.decode(ids) == text, text


def test_decode_skip_special():
    tok = make_toy_tokenizer()
    ids = tok.encode("<|begin_of_text|>hello<|eot_id|>", add_bos=False)
    assert tok.decode(ids, skip_special=True) == "hello"


def test_eos_detection():
    tok = make_toy_tokenizer()
    assert tok.is_eos(tok.vocab["<|eot_id|>"])
    assert not tok.is_eos(tok.vocab["hello"])


def test_stream_detokenizer_partial_utf8():
    tok = make_toy_tokenizer()
    # "日" encodes to 3 UTF-8 bytes across 3 single-byte tokens
    ids = tok.encode("日", add_bos=False)
    assert len(ids) >= 2
    sd = StreamDetokenizer(tok)
    pieces = [sd.push(i) for i in ids]
    assert "".join(pieces) + sd.flush() == "日"
    # nothing emitted until the codepoint completes
    assert pieces[0] == ""


def test_stream_detokenizer_skips_control():
    tok = make_toy_tokenizer()
    sd = StreamDetokenizer(tok)
    assert sd.push(tok.vocab["<|eot_id|>"]) == ""


def test_chat_template_llama3_fallback():
    t = ChatTemplate(None, bos_token="<|begin_of_text|>")
    out = t.render(
        [Message("system", "You are a helpful assistant."), Message("user", "hi")],
        add_generation_prompt=True,
    )
    assert out == (
        "<|begin_of_text|>"
        "<|start_header_id|>system<|end_header_id|>\n\n"
        "You are a helpful assistant.<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\n"
        "hi<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )


def test_chat_template_custom_jinja():
    t = ChatTemplate(
        "{% for m in messages %}[{{ m.role }}]{{ m.content }}{% endfor %}"
    )
    out = t.render([{"role": "user", "content": "x"}])
    assert out == "[user]x"


def test_chat_template_blocks_unsafe_attributes():
    # the sandbox must not let templates reach dunder attributes; jinja either
    # raises SecurityError or resolves them to undefined (empty output)
    import jinja2

    t = ChatTemplate("{{ messages.__class__ }}{{ messages.__globals__ }}")
    try:
        out = t.render([{"role": "user", "content": "x"}])
    except jinja2.exceptions.SecurityError:
        return
    assert "class" not in out and out.strip() == ""


def test_text_stopper():
    from nfai_tpu.tokenizer import TextStopper

    s = TextStopper(["STOP"])
    assert s.feed("hello ST") == ("hello", False)  # holds back possible prefix
    assert s.feed("OP world") == (" ", True)  # stop found across pieces
    assert s.done

    s2 = TextStopper([])
    assert s2.feed("abc") == ("abc", False)
    s3 = TextStopper(["xy"])
    out = []
    for piece in ("a", "b", "x", "q"):
        e, d = s3.feed(piece)
        out.append(e)
        assert not d
    assert "".join(out) + s3.flush() == "abxq"
