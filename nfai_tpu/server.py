"""HTTP inference server (OpenAI-style API) over the continuous-batching engine.

Parity target: the reference's only host is a console REPL
(``NFAI/ChatService.cs``); its streaming contract is
``IInferenceProvider.GetStreamingResponseAsync`` (``IInferenceProvider.cs:12``).
This server exposes that capability over HTTP for production serving:

- ``POST /v1/chat/completions`` — messages in, completion out; with
  ``"stream": true`` responds with SSE chunks (OpenAI wire format)
- ``POST /v1/completions`` — raw prompt in, text out
- ``GET  /healthz`` — liveness + model info
- ``GET  /v1/models`` — model listing

Stdlib-only (ThreadingHTTPServer); concurrency comes from the BatchEngine's
continuous batching, not from model-per-thread.

Usage:
    python -m nfai_tpu.server --gguf model.gguf --port 8000
"""
from __future__ import annotations

import argparse
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .config import EngineConfig, SamplingParams
from .runtime.engine import InferenceEngine
from .runtime.scheduler import BatchEngine
from .tokenizer import Message, StreamDetokenizer, TextStopper
from .utils.logging import get_logger

log = get_logger(__name__)


class ServerState:
    def __init__(self, engine: InferenceEngine, batch: BatchEngine):
        self.engine = engine
        self.batch = batch
        self.started_at = time.time()
        self.requests_served = 0
        self.lock = threading.Lock()


def _sampling_from_body(body: dict) -> SamplingParams:
    stop = body.get("stop") or ()
    if isinstance(stop, str):
        stop = (stop,)
    # OpenAI logit_bias comes as {"token_id": bias}; values clamped to the
    # OpenAI range [-100, 100]
    bias = body.get("logit_bias") or {}
    logit_bias = tuple(
        (int(k), max(-100.0, min(100.0, float(v)))) for k, v in bias.items()
    )
    # OpenAI response_format: {"type": "json_object"} -> JSON-constrained;
    # {"type": "json_schema", "json_schema": {"schema": {...}}} -> schema-
    # constrained (strict structured outputs). Extension body params
    # (llama.cpp-compatible): "grammar" (GBNF text), "regex" (full match).
    rf = body.get("response_format") or {}
    rf_type = rf.get("type") if isinstance(rf, dict) else str(rf)
    json_schema = None
    if rf_type in (None, "text"):
        response_format = None
    elif rf_type in ("json_object", "json"):
        response_format = "json"
    elif rf_type == "json_schema":
        wrapper = rf.get("json_schema") if isinstance(rf, dict) else None
        if not isinstance(wrapper, dict):
            raise ValueError("response_format json_schema needs a "
                             '"json_schema" object')
        json_schema = wrapper.get("schema", wrapper)
        if not isinstance(json_schema, (dict, bool)):
            raise ValueError("json_schema.schema must be an object")
        response_format = "json_schema"
    else:
        raise ValueError(f"unsupported response_format type {rf_type!r}")
    # OpenAI logprobs: chat sends `"logprobs": true` + `"top_logprobs": N`;
    # the legacy completions endpoint sends `"logprobs": N`
    lp_raw = body.get("logprobs")
    logprobs = None
    if isinstance(lp_raw, bool):
        if lp_raw:
            logprobs = int(body.get("top_logprobs") or 0)
    elif lp_raw is not None:
        logprobs = int(lp_raw)
    if logprobs is not None and not 0 <= logprobs <= 20:
        raise ValueError("logprobs/top_logprobs must be in [0, 20]")
    grammar = body.get("grammar")
    regex = body.get("regex")
    if sum(x is not None for x in (grammar, regex, json_schema)) > 1:
        raise ValueError("at most one of grammar/regex/json_schema")
    if grammar is not None or regex is not None:
        from .grammar import parse_gbnf, regex_to_grammar

        # validate at request time so bad grammars 400 instead of killing
        # the generation worker
        if grammar is not None:
            parse_gbnf(str(grammar))
        if regex is not None:
            regex_to_grammar(str(regex))
    if json_schema is not None:
        from .grammar import json_schema_to_grammar

        json_schema_to_grammar(json_schema)
    return SamplingParams(
        temperature=float(body.get("temperature", 0.5)),
        top_k=int(body.get("top_k", 40)),
        top_p=float(body.get("top_p", 0.95)),
        min_p=float(body.get("min_p", 0.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        logit_bias=logit_bias,
        seed=body.get("seed"),
        max_new_tokens=int(
            body.get("max_tokens") or body.get("max_completion_tokens") or 512
        ),
        stop=tuple(str(s) for s in stop),
        response_format=response_format,
        grammar=str(grammar) if grammar is not None else None,
        regex=str(regex) if regex is not None else None,
        json_schema=json_schema,
        logprobs=logprobs,
    )


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route to our logger
            log.debug("%s " + fmt, self.address_string(), *args)

        # -- helpers -------------------------------------------------------
        def _json(self, code: int, obj: dict):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _error(self, code: int, message: str):
            self._json(code, {"error": {"message": message, "code": code}})

        def _body(self) -> dict:
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                raise ValueError("empty request body")
            raw = self.rfile.read(length)
            return json.loads(raw)

        # -- routes --------------------------------------------------------
        def do_GET(self):
            if self.path == "/healthz":
                eng = state.engine
                self._json(
                    200,
                    {
                        "status": "ok",
                        "model": eng.model_name,
                        "uptime_s": round(time.time() - state.started_at, 1),
                        "requests_served": state.requests_served,
                        "max_batch": state.batch.max_batch,
                        "max_seq_len": eng.max_seq_len,
                    },
                )
            elif self.path == "/v1/models":
                self._json(
                    200,
                    {
                        "object": "list",
                        "data": [
                            {
                                "id": state.engine.model_name,
                                "object": "model",
                                "owned_by": "nfai_tpu",
                            }
                        ],
                    },
                )
            else:
                self._error(404, f"no route {self.path}")

        def do_POST(self):
            try:
                if self.path == "/v1/chat/completions":
                    self._chat()
                elif self.path == "/v1/completions":
                    self._completions()
                else:
                    self._error(404, f"no route {self.path}")
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._error(400, f"bad request: {e}")
            except BrokenPipeError:
                pass
            except Exception as e:  # noqa: BLE001 - report, don't kill server
                log.exception("request failed")
                try:
                    self._error(500, str(e))
                except Exception:
                    pass

        # -- endpoints -----------------------------------------------------
        def _chat(self):
            body = self._body()
            messages = [
                Message(str(m["role"]), str(m["content"]))
                for m in body.get("messages", [])
            ]
            if not messages:
                raise ValueError("messages must be a non-empty list")
            eng = state.engine
            prompt = eng.chat_template.render(messages, add_generation_prompt=True)
            ids = eng.tokenizer.encode(prompt, add_bos=False)
            self._generate(body, ids, chat=True)

        def _completions(self):
            body = self._body()
            prompt = body.get("prompt")
            if not isinstance(prompt, str):
                raise ValueError("prompt must be a string")
            ids = state.engine.tokenizer.encode(prompt)
            self._generate(body, ids, chat=False)

        def _generate(self, body: dict, prompt_ids: list[int], chat: bool):
            eng = state.engine
            sampling = _sampling_from_body(body)
            n = int(body.get("n") or 1)
            if not 1 <= n <= 8:
                raise ValueError("n must be between 1 and 8")
            if n > 1 and body.get("stream"):
                raise ValueError("streaming with n > 1 is not supported")

            def make_req(sp):
                # constrained (grammar/JSON/regex) requests run INSIDE the
                # batch engine: per-slot vocab masks in the fused step
                # (runtime.scheduler), concurrent with plain requests
                return state.batch.submit(prompt_ids, sp)

            import dataclasses as _dc

            try:
                reqs = [
                    make_req(
                        sampling if i == 0 or sampling.seed is None
                        else _dc.replace(sampling, seed=sampling.seed + i)
                    )
                    for i in range(n)
                ]
            except RuntimeError as e:  # bounded queue: shed load
                self._error(503, str(e))
                return
            with state.lock:
                state.requests_served += n
            try:
                if n == 1:
                    self._respond(body, reqs[0], chat)
                else:
                    self._respond_multi(body, reqs, chat)
            except (BrokenPipeError, ConnectionResetError):
                # client went away mid-stream: stop generating server-side
                # (the reference kept computing to EOS with nobody listening)
                for r in reqs:
                    r.cancel()
                raise

        def _tok_repr(self, token_id: int) -> tuple[str, list[int]]:
            try:
                bs = state.engine.tokenizer.decode_token_bytes(token_id)
            except Exception:  # noqa: BLE001 - special/malformed ids
                bs = b""
            return bs.decode("utf-8", errors="replace"), list(bs)

        def _logprobs_block(self, entries: list[dict], chat: bool) -> dict:
            """OpenAI logprobs payload: chat uses the structured `content`
            list; legacy completions uses parallel arrays."""
            if chat:
                content = []
                for e in entries:
                    s, bs = self._tok_repr(e["id"])
                    content.append({
                        "token": s,
                        "logprob": e["logprob"],
                        "bytes": bs,
                        "top_logprobs": [
                            {
                                "token": self._tok_repr(i)[0],
                                "logprob": lp,
                                "bytes": self._tok_repr(i)[1],
                            }
                            for i, lp in e["top"]
                        ],
                    })
                return {"content": content}
            toks, lps, tops, offs = [], [], [], []
            off = 0
            for e in entries:
                s, _ = self._tok_repr(e["id"])
                toks.append(s)
                lps.append(e["logprob"])
                tops.append(
                    {self._tok_repr(i)[0]: lp for i, lp in e["top"]}
                )
                offs.append(off)
                off += len(s)
            return {
                "tokens": toks,
                "token_logprobs": lps,
                "top_logprobs": tops,
                "text_offset": offs,
            }

        def _respond(self, body: dict, req, chat: bool):
            eng = state.engine
            sampling = req.sampling
            rid = f"{'chatcmpl' if chat else 'cmpl'}-{uuid.uuid4().hex[:16]}"
            created = int(time.time())
            obj = "chat.completion" if chat else "text_completion"
            if body.get("stream"):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                # SSE body is delimited by connection close (no chunked framing)
                self.send_header("Connection", "close")
                self.close_connection = True
                self.end_headers()
                detok = StreamDetokenizer(eng.tokenizer)
                stopper = TextStopper(sampling.stop)
                want_lp = sampling.logprobs is not None
                lp_cursor = 0
                for tok in req.stream(timeout=600):
                    raw = detok.push(tok)
                    if not raw:
                        continue
                    piece, stopped = stopper.feed(raw)
                    if not piece and not stopped:
                        continue
                    if stopped and not piece:
                        break
                    delta = (
                        {"delta": {"content": piece}}
                        if chat
                        else {"text": piece}
                    )
                    choice = {"index": 0, **delta, "finish_reason": None}
                    if want_lp:
                        # attach entries for the tokens consumed since the
                        # last emitted piece (detok may buffer several)
                        entries = req.logprob_data
                        new = entries[lp_cursor:]
                        lp_cursor = len(entries)
                        choice["logprobs"] = self._logprobs_block(new, chat)
                    chunk = {
                        "id": rid,
                        "object": obj + ".chunk" if chat else obj,
                        "created": created,
                        "model": eng.model_name,
                        "choices": [choice],
                    }
                    self._sse(chunk)
                    if stopped:
                        break
                if stopper.done:
                    req.cancel()  # stop string hit: free the slot now
                tail = detok.flush() + stopper.flush() if not stopper.done else ""
                if tail:
                    delta = {"delta": {"content": tail}} if chat else {"text": tail}
                    self._sse(
                        {
                            "id": rid,
                            "object": obj + ".chunk" if chat else obj,
                            "created": created,
                            "model": eng.model_name,
                            "choices": [{"index": 0, **delta, "finish_reason": None}],
                        }
                    )
                self._sse(
                    {
                        "id": rid,
                        "object": obj + ".chunk" if chat else obj,
                        "created": created,
                        "model": eng.model_name,
                        "choices": [
                            {
                                "index": 0,
                                **({"delta": {}} if chat else {"text": ""}),
                                "finish_reason": "stop",
                            }
                        ],
                    }
                )
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()
            else:
                tokens = list(req.stream(timeout=600))
                text = eng.tokenizer.decode(tokens, skip_special=True)
                for s in sampling.stop:
                    idx = text.find(s)
                    if idx != -1:
                        text = text[:idx]
                content = (
                    {"message": {"role": "assistant", "content": text}}
                    if chat
                    else {"text": text}
                )
                choice = {"index": 0, **content, "finish_reason": "stop"}
                if sampling.logprobs is not None:
                    choice["logprobs"] = self._logprobs_block(
                        list(req.logprob_data)[: len(tokens)], chat
                    )
                self._json(
                    200,
                    {
                        "id": rid,
                        "object": obj,
                        "created": created,
                        "model": eng.model_name,
                        "choices": [choice],
                        "usage": {
                            "prompt_tokens": len(req.prompt_ids),
                            "completion_tokens": len(tokens),
                            "total_tokens": len(req.prompt_ids) + len(tokens),
                        },
                    },
                )

        def _respond_multi(self, body: dict, reqs, chat: bool):
            """OpenAI `n` > 1: one choice per request (blocking only)."""
            eng = state.engine
            rid = f"{'chatcmpl' if chat else 'cmpl'}-{uuid.uuid4().hex[:16]}"
            obj = "chat.completion" if chat else "text_completion"
            choices = []
            total_completion = 0
            for idx, req in enumerate(reqs):
                sampling = req.sampling
                tokens = list(req.stream(timeout=600))
                total_completion += len(tokens)
                text = eng.tokenizer.decode(tokens, skip_special=True)
                for s in sampling.stop:
                    cut = text.find(s)
                    if cut != -1:
                        text = text[:cut]
                content = (
                    {"message": {"role": "assistant", "content": text}}
                    if chat
                    else {"text": text}
                )
                choice = {"index": idx, **content, "finish_reason": "stop"}
                if sampling.logprobs is not None:
                    choice["logprobs"] = self._logprobs_block(
                        list(req.logprob_data)[: len(tokens)], chat
                    )
                choices.append(choice)
            n_prompt = len(reqs[0].prompt_ids)
            self._json(
                200,
                {
                    "id": rid,
                    "object": obj,
                    "created": int(time.time()),
                    "model": eng.model_name,
                    "choices": choices,
                    "usage": {
                        "prompt_tokens": n_prompt,
                        "completion_tokens": total_completion,
                        "total_tokens": n_prompt + total_completion,
                    },
                },
            )

        def _sse(self, obj: dict):
            data = f"data: {json.dumps(obj)}\n\n".encode()
            self.wfile.write(data)
            self.wfile.flush()

    return Handler


def serve(
    gguf: str,
    host: str = "127.0.0.1",
    port: int = 8000,
    engine_config: EngineConfig | None = None,
    max_batch: int = 8,
) -> ThreadingHTTPServer:
    engine = InferenceEngine(gguf, engine_config or EngineConfig(gguf_path=gguf))
    batch = BatchEngine(engine, max_batch=max_batch)
    batch.start()
    state = ServerState(engine, batch)
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    httpd.state = state  # for tests
    log.info("serving %s on http://%s:%d", engine.model_name, host, port)
    return httpd


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nfai_tpu.server")
    p.add_argument("--gguf", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-seq", type=int, default=512)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mesh", default="",
                   help="device mesh, e.g. 'dp=2,tp=4' (empty = 1 device)")
    p.add_argument("--seq-parallel", action="store_true")
    p.add_argument("--expert-parallel", action="store_true")
    args = p.parse_args(argv)
    from .utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    httpd = serve(
        args.gguf,
        args.host,
        args.port,
        EngineConfig(
            gguf_path=args.gguf, max_seq_len=args.max_seq, dtype=args.dtype,
            mesh_shape=__import__(
                "nfai_tpu.cli", fromlist=["parse_mesh"]
            ).parse_mesh(args.mesh),
            seq_parallel=args.seq_parallel,
            expert_parallel=args.expert_parallel,
        ),
        args.max_batch,
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.state.batch.close()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
