"""HTTP server integration tests: health, chat (blocking + SSE streaming),
completions, error paths — the full reference capability surface over HTTP."""
import json
import threading
import urllib.error
import urllib.request

import pytest

from nfai_tpu.config import EngineConfig
from nfai_tpu.models.testing import make_tiny_llama_gguf
from nfai_tpu.server import serve


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = make_tiny_llama_gguf(
        tmp_path_factory.mktemp("srv") / "tiny.gguf", n_layers=2, context_length=512
    )
    httpd = serve(
        str(path),
        host="127.0.0.1",
        port=0,  # ephemeral
        engine_config=EngineConfig(
            max_seq_len=256, dtype="float32", prefill_chunk=64
        ),
        max_batch=2,
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()
    httpd.state.batch.close()


def _post(base, path, body, timeout=300):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=timeout)


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["model"] == "tiny-llama-test"


def test_models(server):
    with urllib.request.urlopen(server + "/v1/models", timeout=30) as r:
        body = json.loads(r.read())
    assert body["data"][0]["id"] == "tiny-llama-test"


def test_chat_completion_blocking(server):
    with _post(
        server,
        "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hi"}],
            "temperature": 0,
            "max_tokens": 6,
        },
    ) as r:
        body = json.loads(r.read())
    assert body["object"] == "chat.completion"
    assert body["choices"][0]["message"]["role"] == "assistant"
    assert body["usage"]["prompt_tokens"] > 0
    assert body["usage"]["completion_tokens"] <= 6


def test_chat_completion_streaming(server):
    with _post(
        server,
        "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hello"}],
            "temperature": 0,
            "max_tokens": 6,
            "stream": True,
        },
    ) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        events = []
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(line[6:])
    assert events[-1] == "[DONE]"
    parsed = [json.loads(e) for e in events[:-1]]
    assert parsed[-1]["choices"][0]["finish_reason"] == "stop"
    text = "".join(
        p["choices"][0].get("delta", {}).get("content", "") for p in parsed
    )
    assert isinstance(text, str)


def test_completions_endpoint(server):
    with _post(
        server,
        "/v1/completions",
        {"prompt": "abc", "temperature": 0, "max_tokens": 4},
    ) as r:
        body = json.loads(r.read())
    assert body["object"] == "text_completion"
    assert "text" in body["choices"][0]


def test_error_paths(server):
    # empty messages
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/chat/completions", {"messages": []})
    assert e.value.code == 400
    # bad route
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/nope", {})
    assert e.value.code == 404
    # malformed json
    req = urllib.request.Request(
        server + "/v1/chat/completions",
        data=b"{not json",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_concurrent_requests(server):
    results = {}

    def hit(i):
        with _post(
            server,
            "/v1/chat/completions",
            {
                "messages": [{"role": "user", "content": f"msg {i}"}],
                "temperature": 0,
                "max_tokens": 4,
            },
        ) as r:
            results[i] = json.loads(r.read())

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 3
    for body in results.values():
        assert body["choices"][0]["finish_reason"] == "stop"


def test_stop_sequences(server):
    # with stop=["\n"], the first newline truncates the reply (the tiny model
    # mostly emits newlines, so this reliably triggers)
    with _post(
        server,
        "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hi"}],
            "temperature": 0,
            "max_tokens": 8,
            "stop": "\n",
        },
    ) as r:
        body = json.loads(r.read())
    assert "\n" not in body["choices"][0]["message"]["content"]


def test_json_schema_response_format(server):
    schema = {
        "type": "object",
        "properties": {"a": {"type": "integer"},
                       "b": {"type": "boolean"}},
        "required": ["a", "b"],
    }
    with _post(
        server,
        "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "emit"}],
            "temperature": 0.8,
            "seed": 4,
            "max_tokens": 48,
            "response_format": {"type": "json_schema",
                                "json_schema": {"name": "t",
                                                "schema": schema}},
        },
    ) as r:
        body = json.loads(r.read())
    obj = json.loads(body["choices"][0]["message"]["content"])
    assert isinstance(obj["a"], int) and isinstance(obj["b"], bool)


def test_grammar_body_param(server):
    with _post(
        server,
        "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "emit"}],
            "temperature": 0.8,
            "seed": 9,
            "max_tokens": 24,
            "grammar": 'root ::= "ok:" [0-9]+',
        },
    ) as r:
        body = json.loads(r.read())
    text = body["choices"][0]["message"]["content"]
    assert text.startswith("ok:") and text[3:].isdigit(), text


def test_bad_grammar_rejected(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(
            server,
            "/v1/chat/completions",
            {
                "messages": [{"role": "user", "content": "x"}],
                "grammar": 'root ::= "unterminated',
            },
        )
    assert ei.value.code == 400


def test_n_choices(server):
    with _post(
        server,
        "/v1/chat/completions",
        {
            "messages": [{"role": "user", "content": "hi"}],
            "temperature": 0.9,
            "seed": 3,
            "max_tokens": 6,
            "n": 3,
        },
    ) as r:
        body = json.loads(r.read())
    assert [c["index"] for c in body["choices"]] == [0, 1, 2]
    assert all(isinstance(c["message"]["content"], str)
               for c in body["choices"])
    # distinct seeds: at least two choices should differ (sampled)
    texts = {c["message"]["content"] for c in body["choices"]}
    assert len(texts) >= 1  # (tiny model may still collide; smoke only)


def test_n_stream_rejected(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "x"}],
            "n": 2, "stream": True,
        })
    assert ei.value.code == 400
