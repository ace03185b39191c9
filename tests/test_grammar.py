"""GBNF / regex / JSON-schema constrained decoding (nfai_tpu.grammar).

Machine-level tests run without JAX; the end-to-end test drives the engine
on a tiny synthetic checkpoint (CPU backend via conftest)."""
import json

import numpy as np
import pytest

from nfai_tpu.grammar import (
    GrammarError,
    GrammarMachine,
    json_schema_to_grammar,
    parse_gbnf,
    regex_to_grammar,
)


def accepts(g, s: str, *, prefix=False) -> bool:
    m = GrammarMachine(g)
    if not m.advance_bytes(s.encode("utf-8")):
        return False
    return True if prefix else m.complete


# ---------------------------------------------------------------------------
# GBNF parsing + matching


def test_gbnf_literals_and_alternates():
    g = parse_gbnf('root ::= "yes" | "no"')
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe")
    assert not accepts(g, "ye")  # incomplete
    assert accepts(g, "ye", prefix=True)


def test_gbnf_repetition_and_classes():
    g = parse_gbnf('root ::= [a-z]+ ("-" [0-9]{2,3})?')
    assert accepts(g, "abc")
    assert accepts(g, "abc-12")
    assert accepts(g, "abc-123")
    assert not accepts(g, "abc-1")
    assert not accepts(g, "abc-1234")
    assert not accepts(g, "ABC")
    assert not accepts(g, "")


def test_gbnf_nested_rules_and_recursion():
    g = parse_gbnf(
        """
        # s-expressions
        root ::= expr
        expr ::= atom | "(" expr (" " expr)* ")"
        atom ::= [a-z]+
        """
    )
    assert accepts(g, "(add (mul a b) c)")
    assert accepts(g, "x")
    assert not accepts(g, "(add")
    assert accepts(g, "(add", prefix=True)
    assert not accepts(g, "(add))")


def test_gbnf_escapes_and_unicode():
    g = parse_gbnf(r'root ::= "\t" [\x41-\x43]+ "é"')
    assert accepts(g, "\tABCé")
    assert not accepts(g, "\tDé")


def test_gbnf_errors():
    with pytest.raises(GrammarError):
        parse_gbnf('start ::= "x"')  # no root
    with pytest.raises(GrammarError):
        parse_gbnf('root ::= undefined-rule')
    # unterminated literal
    with pytest.raises(GrammarError):
        parse_gbnf('root ::= "abc')


def test_gbnf_utf8_byte_split():
    """Multibyte codepoints fed one byte at a time (BPE tokens split
    UTF-8); partial prefixes must be accepted iff completable in-range."""
    g = parse_gbnf('root ::= [à-ÿ]+')
    m = GrammarMachine(g)
    enc = "é".encode("utf-8")  # 2 bytes
    assert m.advance(enc[0])
    assert not m.complete  # pending byte
    assert m.advance(enc[1])
    assert m.complete
    # a lead byte whose whole interval is out of class -> rejected at once
    m2 = GrammarMachine(g)
    assert not m2.advance(0xE4)  # 3-byte lead: U+4000.. out of [e0-ff]
    # invalid continuation
    m3 = GrammarMachine(g)
    assert m3.advance(0xC3)
    assert not m3.advance(0x41)  # not a continuation byte


def test_closing_string():
    g = parse_gbnf('root ::= "(" [a-z]+ ")" "!"')
    m = GrammarMachine(g)
    assert m.advance_bytes(b"(ab")
    close = m.closing_string()
    m2 = m.copy()
    assert m2.advance_bytes(close) and m2.complete
    assert close == b")!"
    # from scratch the shortest completion includes one class char
    m3 = GrammarMachine(g)
    c3 = m3.closing_string()
    assert GrammarMachine(g).advance_bytes(c3)
    assert len(c3) == 4  # ( x ) !


def test_stable_ranges_string_body():
    g = parse_gbnf('root ::= "\\"" [^"]* "\\""')
    m = GrammarMachine(g)
    assert m.advance_bytes(b'"')
    rngs = m.stable_ranges()
    # body chars self-loop; the quote (0x22) must NOT be in any range
    assert rngs
    assert not any(lo <= 0x22 <= hi for lo, hi in rngs)
    assert any(lo <= ord("a") <= hi for lo, hi in rngs)


# ---------------------------------------------------------------------------
# regex


def test_regex_basics():
    g = regex_to_grammar(r"[a-c]+x?")
    assert accepts(g, "abc")
    assert accepts(g, "abx")
    assert not accepts(g, "x")
    g2 = regex_to_grammar(r"(foo|bar)\d{2,4}")
    assert accepts(g2, "foo12")
    assert accepts(g2, "bar1234")
    assert not accepts(g2, "foo1")
    assert not accepts(g2, "baz12")


def test_regex_escapes_classes_anchors():
    g = regex_to_grammar(r"^\w+@\w+\.(com|org)$")
    assert accepts(g, "a_b@host.com")
    assert not accepts(g, "a b@host.com")
    assert not accepts(g, "a@host.net")
    g2 = regex_to_grammar(r"\s*-?\d+(\.\d+)?\s*")
    assert accepts(g2, " -3.14 ")
    assert accepts(g2, "42")
    assert not accepts(g2, "4.")


def test_regex_dot_excludes_newline():
    g = regex_to_grammar(r"a.b")
    assert accepts(g, "axb")
    assert accepts(g, "aéb")
    assert not accepts(g, "a\nb")


def test_regex_unsupported():
    with pytest.raises(GrammarError):
        regex_to_grammar(r"(?=lookahead)x")
    with pytest.raises(GrammarError):
        regex_to_grammar(r"a(b")


# ---------------------------------------------------------------------------
# JSON schema


def check_schema(schema, good, bad):
    g = json_schema_to_grammar(schema)
    for s in good:
        assert accepts(g, s), s
    for s in bad:
        assert not accepts(g, s), s


def test_schema_object_required_optional():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tag": {"type": "string"},
        },
        "required": ["name"],
    }
    check_schema(
        schema,
        good=[
            '{"name":"bob"}',
            '{"name":"bob","age":3}',
            '{"name":"bob","age":-1,"tag":"x"}',
            '{"name": "bob", "age": 3}',
        ],
        bad=[
            "{}",  # missing required
            '{"age":3}',
            '{"name":3}',  # wrong type
            '{"age":3,"name":"bob"}',  # order is fixed (schema order)
            '{"name":"bob","other":1}',  # additionalProperties false
            '{"name":"bob",}',
        ],
    )


def test_schema_enum_const_anyof():
    check_schema(
        {"enum": ["red", 3, None, True]},
        good=['"red"', "3", "null", "true"],
        bad=['"blue"', "4", "false"],
    )
    check_schema(
        {"anyOf": [{"type": "integer"}, {"type": "boolean"}]},
        good=["-7", "true"],
        bad=['"x"', "3.5"],
    )
    check_schema({"const": {"k": [1, 2]}}, good=['{"k":[1,2]}'],
                 bad=['{"k":[1,2,3]}'])


def test_schema_array_bounds_and_items():
    check_schema(
        {"type": "array", "items": {"type": "integer"}, "minItems": 1,
         "maxItems": 3},
        good=["[1]", "[1,2]", "[1, 2, 3]"],
        bad=["[]", "[1,2,3,4]", '["x"]'],
    )
    check_schema(
        {"type": "array", "items": {"type": "string"}},
        good=["[]", '["a","b"]'],
        bad=['["a",]', "[,]"],
    )


def test_schema_nested_and_refs():
    schema = {
        "type": "object",
        "properties": {
            "tree": {"$ref": "#/$defs/node"},
        },
        "required": ["tree"],
        "$defs": {
            "node": {
                "type": "object",
                "properties": {
                    "v": {"type": "number"},
                    "kids": {"type": "array",
                             "items": {"$ref": "#/$defs/node"}},
                },
                "required": ["v"],
            }
        },
    }
    check_schema(
        schema,
        good=[
            '{"tree":{"v":1}}',
            '{"tree":{"v":1,"kids":[{"v":2},{"v":3.5,"kids":[]}]}}',
        ],
        bad=['{"tree":{}}', '{"tree":{"kids":[]}}'],
    )


def test_schema_string_pattern():
    schema = {"type": "string", "pattern": "^[A-Z]{2}-\\d{3}$"}
    check_schema(schema, good=['"AB-123"'], bad=['"ab-123"', '"AB-12"', '"AB123"'])


def test_schema_unconstrained_value():
    g = json_schema_to_grammar({})
    for s in ('"x"', "3.5", "null", '{"a":[1,{"b":false}]}', "[[]]"):
        assert accepts(g, s), s
    assert not accepts(g, "{,}")


def test_schema_closing_string_valid_json():
    g = json_schema_to_grammar(
        {"type": "object",
         "properties": {"a": {"type": "integer"},
                        "b": {"type": "string"}},
         "required": ["a", "b"]}
    )
    m = GrammarMachine(g)
    assert m.advance_bytes(b'{"a": 12')
    close = m.closing_string()
    full = b'{"a": 12' + close
    json.loads(full)  # must parse
    m2 = GrammarMachine(g)
    assert m2.advance_bytes(full) and m2.complete


# ---------------------------------------------------------------------------
# TokenConstraint integration (vocab masks over a grammar machine)


def test_token_constraint_with_grammar():
    from nfai_tpu.constrained import TokenConstraint

    toks = [b"", b"yes", b"no", b"y", b"es", b"maybe", b"<eos>"]
    cons = TokenConstraint(toks, eos_ids={6})
    g = parse_gbnf('root ::= "yes" | "no"')
    m = GrammarMachine(g)
    mask = cons.allowed(m)
    assert list(np.nonzero(mask)[0]) == [1, 2, 3]
    assert m.advance_bytes(b"yes")
    mask2 = cons.allowed(m)
    assert list(np.nonzero(mask2)[0]) == [6]  # only EOS once complete


def test_token_constraint_stable_fast_path():
    """A 'string body' state must accept multi-codepoint tokens through the
    stable-ranges fast path, identically to the slow walk."""
    from nfai_tpu.constrained import TokenConstraint

    g = parse_gbnf('root ::= "\\"" [^"]* "\\""')
    toks = [b"", b"hello", b'"', b'a"b', "café".encode("utf-8"),
            b"x" * 40, b"<eos>"]
    cons = TokenConstraint(toks, eos_ids={6})
    m = GrammarMachine(g)
    assert m.advance_bytes(b'"')
    mask = cons.allowed(m)
    got = set(np.nonzero(mask)[0].tolist())
    # b'a"b' (id 3) is illegal: the quote CLOSES the string, then 'b'
    # trails the completed match
    assert got == {1, 2, 4, 5}


def test_engine_grammar_end_to_end(tmp_path):
    """SamplingParams(grammar=...) forces output into the grammar."""
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.gguf.quants import GGMLType
    from nfai_tpu.runtime.engine import InferenceEngine
    from nfai_tpu.config import EngineConfig, SamplingParams

    path = make_tiny_llama_gguf(
        tmp_path / "g.gguf", hidden=128, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=256, vocab_size=512, quant=GGMLType.F16,
        seed=11,
    )
    eng = InferenceEngine(path, EngineConfig(max_seq_len=64))
    sp = SamplingParams(
        temperature=0.8, max_new_tokens=24, seed=5,
        grammar='root ::= "val=" [0-9]{1,3} ";"',
    )
    text = eng.generate_text("x", sp)
    import re

    assert re.fullmatch(r"val=[0-9]{1,3};", text), repr(text)


def test_engine_json_schema_end_to_end(tmp_path):
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.gguf.quants import GGMLType
    from nfai_tpu.runtime.engine import InferenceEngine
    from nfai_tpu.config import EngineConfig, SamplingParams

    path = make_tiny_llama_gguf(
        tmp_path / "s.gguf", hidden=128, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=256, vocab_size=512, quant=GGMLType.F16,
        seed=12,
    )
    eng = InferenceEngine(path, EngineConfig(max_seq_len=96))
    schema = {
        "type": "object",
        "properties": {"ok": {"type": "boolean"},
                       "n": {"type": "integer"}},
        "required": ["ok", "n"],
    }
    sp = SamplingParams(temperature=0.9, max_new_tokens=48, seed=7,
                        response_format="json_schema", json_schema=schema)
    text = eng.generate_text("x", sp)
    obj = json.loads(text)
    assert isinstance(obj["ok"], bool) and isinstance(obj["n"], int)


def test_engine_regex_end_to_end(tmp_path):
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.gguf.quants import GGMLType
    from nfai_tpu.runtime.engine import InferenceEngine
    from nfai_tpu.config import EngineConfig, SamplingParams

    path = make_tiny_llama_gguf(
        tmp_path / "r.gguf", hidden=128, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=256, vocab_size=512, quant=GGMLType.F16,
        seed=13,
    )
    eng = InferenceEngine(path, EngineConfig(max_seq_len=64))
    sp = SamplingParams(temperature=0.8, max_new_tokens=16, seed=3,
                        regex=r"[ab]{3}-[0-9]{2}")
    text = eng.generate_text("x", sp)
    import re

    assert re.fullmatch(r"[ab]{3}-[0-9]{2}", text), repr(text)
