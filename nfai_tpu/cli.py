"""Chat CLI: console REPL streaming assistant tokens.

Parity target: ``NFAI/ChatService.cs:8-23`` (read line, stream tokens, "quit"
to exit) + ``NFAI/Program.cs:10-29`` (config binding, one model instance).

Usage:
    python -m nfai_tpu.cli --gguf model.gguf [--max-seq 512] [--temp 0.5] ...
    echo "hello" | python -m nfai_tpu.cli --gguf model.gguf   # piped mode
"""
from __future__ import annotations

import argparse
import sys

from .config import EngineConfig, SamplingParams
from .runtime.engine import ChatSession, InferenceEngine


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="nfai_tpu", description="TPU GGUF chat")
    p.add_argument("--gguf", required=True, help="path to the GGUF model file")
    p.add_argument("--max-seq", type=int, default=512,
                   help="KV cache length (reference default 512)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "float16"])
    p.add_argument("--temp", type=float, default=0.5)
    p.add_argument("--top-k", type=int, default=40)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--system", default="You are a helpful assistant.",
                   help="system prompt (reference hardcoded this)")
    p.add_argument("--metrics", action="store_true",
                   help="print TTFT / tokens-per-second after each reply")
    p.add_argument("--mesh", default="",
                   help="device mesh, e.g. 'dp=2,tp=4' or 'sp=8' "
                        "(empty = single device)")
    p.add_argument("--seq-parallel", action="store_true",
                   help="shard the KV cache over the mesh's sp axis "
                        "(long contexts; needs --mesh sp=N)")
    p.add_argument("--expert-parallel", action="store_true",
                   help="shard MoE expert stacks over the tp axis")
    return p


def parse_mesh(spec: str) -> dict[str, int]:
    """'dp=2,tp=4' -> {"dp": 2, "tp": 4}."""
    if not spec:
        return {}
    out = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        out[k.strip()] = int(v)
    return out


def main(argv: list[str] | None = None) -> int:
    args = build_arg_parser().parse_args(argv)
    from .utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    engine = InferenceEngine(
        args.gguf,
        EngineConfig(
            gguf_path=args.gguf,
            max_seq_len=args.max_seq,
            dtype=args.dtype,
            system_prompt=args.system,
            mesh_shape=parse_mesh(args.mesh),
            seq_parallel=args.seq_parallel,
            expert_parallel=args.expert_parallel,
        ),
    )
    sampling = SamplingParams(
        temperature=args.temp,
        top_k=args.top_k,
        top_p=args.top_p,
        seed=args.seed,
        max_new_tokens=args.max_new_tokens,
    )
    session = ChatSession(engine, sampling)
    interactive = sys.stdin.isatty()
    if interactive:
        print(f"{engine.model_name} ready — type a message ('quit' to exit)")
    while True:
        if interactive:
            try:
                line = input("> ")
            except EOFError:
                break
        else:
            line = sys.stdin.readline()
            if not line:
                break
        line = line.strip()
        if not line:
            continue
        if line.lower() in ("quit", "exit"):
            break
        for piece in session.stream(line):
            print(piece, end="", flush=True)
        print()
        if args.metrics:
            m = session.last_metrics
            print(
                f"[{m.prompt_tokens} prompt tok, {m.new_tokens} new | "
                f"ttft {m.ttft_s*1000:.0f} ms | {m.decode_tokens_per_s:.1f} tok/s]",
                file=sys.stderr,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
