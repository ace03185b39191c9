"""JSON-constrained decoding: automaton, token masks, engine e2e."""
import json

import numpy as np
import pytest

from nfai_tpu.constrained import JsonMachine, TokenConstraint


def accepts(text: str, require_object: bool = False) -> bool:
    m = JsonMachine(require_object=require_object)
    return m.advance_bytes(text.encode()) and m.complete


def prefix_ok(text: str, require_object: bool = False) -> bool:
    m = JsonMachine(require_object=require_object)
    return m.advance_bytes(text.encode())


class TestJsonMachine:
    def test_complete_values(self):
        for t in ['{}', '{"a": 1}', '[1, 2, 3]', '"hi"', 'true', 'false',
                  'null', '0', '-1.5e+10', '{"a": {"b": [null, "x\\n"]}}',
                  ' { "k" : [ 1.0E2 , {} ] } ']:
            assert accepts(t), t
            # cross-check against the stdlib parser
            json.loads(t)

    def test_rejects(self):
        for t in ['{', '{"a" 1}', '[1,]', "{'a': 1}", '01', '1.', '+1',
                  '{"a": }', 'tru', '"\\x"', '{"a":1}}', '[1 2]', '{,}',
                  'nul!', '--1', '1e', '"unterminated', '{"a":1,}']:
            m = JsonMachine(require_object=False)
            ok = m.advance_bytes(t.encode()) and m.complete
            assert not ok, t
            with pytest.raises(Exception):
                json.loads(t)

    def test_require_object(self):
        assert accepts('{"a": 1}', require_object=True)
        assert not prefix_ok('[1]', require_object=True)
        assert not prefix_ok('"str"', require_object=True)

    def test_prefixes_stay_legal(self):
        for t in ['{"key": [1, {"n": nu', '{"s": "ab\\u00', '{"x": -1.5e']:
            assert prefix_ok(t), t

    def test_nothing_after_top_level(self):
        m = JsonMachine(require_object=True)
        assert m.advance_bytes(b'{"a":1} ')
        assert m.complete
        assert not m.copy().advance(ord("{"))

    def test_closing_string(self):
        cases = [
            ('{"a": [1, {"b": "x', '"}]}'),
            ('{"a"', ':0}'),
            ('{"a": tr', 'ue}'),
            ('{"a": -', '0}'),
            ('{"a": 1,', '"":0}'),
            ('{"a": "\\', 'n"}'),
            ('{', '}'),
        ]
        for prefix, _ in cases:
            m = JsonMachine(require_object=True)
            assert m.advance_bytes(prefix.encode()), prefix
            close = m.closing_string()
            full = prefix.encode() + close
            json.loads(full)  # must parse
            m2 = JsonMachine(require_object=True)
            assert m2.advance_bytes(full) and m2.complete


def toy_constraint():
    vocab = [b'{', b'}', b'"', b'ab', b':', b' ', b'1', b',', b'"a":',
             b'x"y', b'\\n', b'[', b']', b'true', b'<eos>', b'{"',
             b'1}', b'e5']
    # id 14 = eos (empty would be banned; give it bytes but register as eos)
    return TokenConstraint(vocab, eos_ids={14}), vocab


class TestTokenConstraint:
    def test_start_mask(self):
        cons, vocab = toy_constraint()
        m = JsonMachine(require_object=True)
        mask = cons.allowed(m)
        allowed = {vocab[i] for i in np.nonzero(mask)[0]}
        assert b'{' in allowed and b'{"' in allowed
        assert b'}' not in allowed and b'1' not in allowed
        assert b'<eos>' not in allowed  # not complete yet

    def test_string_interior(self):
        cons, vocab = toy_constraint()
        m = JsonMachine(require_object=True)
        assert m.advance_bytes(b'{"')
        mask = cons.allowed(m)
        allowed = {vocab[i] for i in np.nonzero(mask)[0]}
        assert b'ab' in allowed  # string-safe
        assert b'x"y' not in allowed  # quote mid-token -> key ends, 'y' illegal
        assert b'\\n' in allowed  # legal escape
        assert b'"a":' not in allowed  # would close key then need colon... ':' follows, actually legal? no: '"' closes key -> OBJ_COLON, 'a' illegal

    def test_multistate_token(self):
        cons, vocab = toy_constraint()
        m = JsonMachine(require_object=True)
        assert m.advance_bytes(b'{')
        mask = cons.allowed(m)
        allowed = {vocab[i] for i in np.nonzero(mask)[0]}
        # '"a":' crosses key-start, string, close, colon in one token
        assert b'"a":' in allowed
        assert b'}' in allowed
        assert b'1' not in allowed

    def test_eos_only_when_complete(self):
        cons, vocab = toy_constraint()
        m = JsonMachine(require_object=True)
        assert m.advance_bytes(b'{"a": 1}'.replace(b' ', b''))  # {"a":1}
        assert m.complete
        mask = cons.allowed(m)
        assert mask[14]  # eos allowed
        assert not mask[0]  # no second top-level object

    def test_number_delimiter_token(self):
        cons, vocab = toy_constraint()
        m = JsonMachine(require_object=True)
        assert m.advance_bytes(b'{"a":')
        mask = cons.allowed(m)
        allowed = {vocab[i] for i in np.nonzero(mask)[0]}
        assert b'1' in allowed and b'1}' in allowed  # number + close fused
        assert b'e5' not in allowed

    def test_closing_mask_makes_progress(self):
        cons, vocab = toy_constraint()
        m = JsonMachine(require_object=True)
        assert m.advance_bytes(b'{"a": [1')
        mask = cons.closing_allowed(m)
        allowed = {vocab[i] for i in np.nonzero(mask)[0]}
        assert b']' in allowed
        assert b',' not in allowed  # would grow the completion


def test_engine_json_mode(tmp_path):
    """End-to-end: a random-weight tiny model forced into JSON mode must
    emit text that json.loads accepts (the budget-aware closing masks
    guarantee termination with valid JSON)."""
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    from nfai_tpu.config import EngineConfig, SamplingParams
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.runtime.engine import InferenceEngine

    path = make_tiny_llama_gguf(
        tmp_path / "json.gguf", hidden=64, n_layers=2, n_heads=4,
        n_kv_heads=2, ffn_dim=128, seed=11,
    )
    eng = InferenceEngine(path, EngineConfig(max_seq_len=160, dtype="float32"))
    for seed, temp in [(0, 0.9), (1, 0.0), (2, 1.3)]:
        sp = SamplingParams(
            temperature=temp, max_new_tokens=48, seed=seed,
            response_format="json",
        )
        text = eng.generate_text("emit json", sp)
        obj = json.loads(text)
        assert isinstance(obj, dict), text
