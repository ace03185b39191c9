"""Inspection / maintenance tools.

    python -m nfai_tpu.tools inspect model.gguf [--tensors] [--metadata]
    python -m nfai_tpu.tools requantize in.gguf out.gguf --type q8_0
"""
from __future__ import annotations

import argparse
import json
import sys


def cmd_inspect(args) -> int:
    from .gguf import GGUFFile
    from .gguf.constants import GGML_BLOCK_LAYOUT

    with GGUFFile.open(args.path) as g:
        total_bytes = sum(d.nbytes for d in g.tensors.values())
        total_params = sum(d.n_elements for d in g.tensors.values())
        print(f"file:      {args.path}")
        print(f"version:   {g.version}")
        print(f"arch:      {g.architecture}")
        print(f"alignment: {g.alignment}")
        print(f"tensors:   {len(g.tensors)} ({total_params/1e9:.3f}B params, "
              f"{total_bytes/1e9:.2f} GB)")
        types = {}
        for d in g.tensors.values():
            types[d.ggml_type.name] = types.get(d.ggml_type.name, 0) + 1
        print(f"dtypes:    {types}")
        if args.metadata:
            for k, v in g.metadata.items():
                s = str(v)
                print(f"  {k} = {s[:100] + '…' if len(s) > 100 else s}")
        if args.tensors:
            for name, d in g.tensors.items():
                bpw = d.nbytes * 8 / d.n_elements
                print(
                    f"  {name:48s} {d.ggml_type.name:6s} {str(d.shape):20s}"
                    f" {d.nbytes/1e6:9.2f} MB ({bpw:.2f} bpw)"
                )
    return 0


def cmd_requantize(args) -> int:
    """Re-encode every 2-D weight tensor to the target quantization."""
    import numpy as np

    from .gguf import GGMLType, GGUFFile, GGUFWriter
    from .gguf.constants import GGUFValueType

    target = GGMLType[args.type.upper()]
    with GGUFFile.open(args.input) as g:
        w = GGUFWriter(alignment=g.alignment)
        for k, v in g.metadata.items():
            if isinstance(v, float):
                w.add(k, v, GGUFValueType.FLOAT32)
            else:
                w.add(k, v)
        kept = requant = 0
        for name, d in g.tensors.items():
            data = g.tensor_f32(name)
            block = 256 if target.name.endswith("_K") else 32
            eligible = (
                len(d.shape) == 2
                and d.shape[-1] % block == 0
                and not name.endswith("_norm.weight")
            )
            if eligible:
                w.add_tensor(name, data, target)
                requant += 1
            else:
                w.add_tensor(name, data.astype(np.float32), GGMLType.F32)
                kept += 1
        w.write(args.output)
    print(f"wrote {args.output}: {requant} tensors -> {target.name}, {kept} kept dense")
    return 0


# fixed validation inputs: deterministic, model-agnostic, chosen so tiny
# synthetic checkpoints AND real instruction models both produce non-trivial
# continuations
_VALIDATE_PROMPTS = (
    "The capital of France is",
    "1 2 3 4 5 6 7 8",
    "import numpy as np\n",
)
_VALIDATE_CORPUS = (
    "The quick brown fox jumps over the lazy dog. "
    "Pack my box with five dozen liquor jugs. "
    "How vexingly quick daft zebras jump! "
    "Sphinx of black quartz, judge my vow. "
    "A shining crescent far beneath the flying vessel. "
) * 8


def _checkpoint_key(path: str) -> str:
    """Content key for a GGUF file: sha256 over (size, head 4 MB, tail 4 KB)
    — stable across renames, cheap on multi-GB files."""
    import hashlib
    import os

    h = hashlib.sha256()
    size = os.path.getsize(path)
    h.update(str(size).encode())
    with open(path, "rb") as f:
        h.update(f.read(4 << 20))
        f.seek(max(0, size - 4096))
        h.update(f.read(4096))
    return h.hexdigest()[:16]


def cmd_validate(args) -> int:
    """One-command real-checkpoint validation (the BASELINE quality gate
    that zero-egress has kept unmeasured on real files): greedy first-token
    goldens on fixed prompts, perplexity on a fixed corpus, and a chat
    smoke — all compared against per-checkpoint expected values stored by
    content hash in a fixtures JSON. Record once with --update on a trusted
    setup; every later environment/refactor validates with one command:

        python -m nfai_tpu.tools validate model.gguf --update   # record
        python -m nfai_tpu.tools validate model.gguf            # check

    The harness itself is exercised in CI against synthetic checkpoints
    (tests/test_cli_tools.py), so it is known-working before any real GGUF
    arrives."""
    import math
    import os

    from .config import EngineConfig, SamplingParams
    from .eval import perplexity
    from .runtime.engine import InferenceEngine

    key = _checkpoint_key(args.path)
    fixtures = {}
    if os.path.exists(args.fixtures):
        with open(args.fixtures, encoding="utf-8") as f:
            fixtures = json.load(f)

    eng = InferenceEngine(
        args.path,
        EngineConfig(max_seq_len=args.max_seq, dtype=args.dtype),
    )
    record: dict = {"model": eng.model_name, "key": key}

    # 1) greedy first tokens (the sharpest cheap fingerprint of the whole
    # load/dequant/forward pipeline)
    firsts = []
    for prompt in _VALIDATE_PROMPTS:
        ids = eng.tokenizer.encode(prompt)[: args.max_seq // 2]
        toks = list(
            eng.generate(ids, SamplingParams(temperature=0.0,
                                             max_new_tokens=8))
        )
        firsts.append(toks)
    record["greedy_tokens"] = firsts

    # 2) perplexity on the fixed corpus (teacher-forced)
    ids = eng.tokenizer.encode(_VALIDATE_CORPUS)
    window = min(128, max(16, len(ids) // 2))
    record["ppl"] = perplexity(eng.params, eng.model_cfg, ids, window=window)
    record["ppl_window"] = window

    # 3) chat smoke: template renders and the stream detokenizes
    from .runtime.engine import ChatSession

    sess = ChatSession(eng, SamplingParams(temperature=0.0, max_new_tokens=8))
    text = "".join(sess.stream("Hello!"))
    record["chat_smoke_chars"] = len(text)

    print(json.dumps(record, indent=2))
    if args.update:
        fixtures[key] = record
        with open(args.fixtures, "w", encoding="utf-8") as f:
            json.dump(fixtures, f, indent=2, sort_keys=True)
        print(f"recorded fixtures[{key}] -> {args.fixtures}")
        return 0
    want = fixtures.get(key)
    if want is None:
        print(
            f"NO FIXTURE for checkpoint {key} in {args.fixtures}; run with "
            f"--update on a trusted setup first", file=sys.stderr,
        )
        return 2
    failures = []
    if want["greedy_tokens"] != record["greedy_tokens"]:
        failures.append("greedy first-token sequences diverge")
    rel = abs(record["ppl"] - want["ppl"]) / max(want["ppl"], 1e-9)
    if not math.isfinite(record["ppl"]) or rel > args.ppl_tol:
        failures.append(
            f"ppl {record['ppl']:.4f} vs expected {want['ppl']:.4f} "
            f"(rel {rel:.2%} > {args.ppl_tol:.2%})"
        )
    if record["chat_smoke_chars"] == 0:
        failures.append("chat smoke produced no text")
    if failures:
        for msg in failures:
            print(f"VALIDATE FAIL: {msg}", file=sys.stderr)
        return 1
    print(f"VALIDATE OK: checkpoint {key} matches recorded fixtures")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nfai_tpu.tools")
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("inspect", help="dump GGUF header/metadata/tensors")
    pi.add_argument("path")
    pi.add_argument("--tensors", action="store_true")
    pi.add_argument("--metadata", action="store_true")
    pi.set_defaults(fn=cmd_inspect)
    pr = sub.add_parser("requantize", help="re-encode weights to another type")
    pr.add_argument("input")
    pr.add_argument("output")
    pr.add_argument("--type", default="q8_0")
    pr.set_defaults(fn=cmd_requantize)
    pv = sub.add_parser(
        "validate",
        help="golden first-token + perplexity + chat smoke vs recorded "
             "fixtures (one-command real-checkpoint validation)",
    )
    pv.add_argument("path")
    pv.add_argument("--fixtures", default="validation_fixtures.json")
    pv.add_argument("--update", action="store_true",
                    help="record this checkpoint's values as the fixture")
    pv.add_argument("--max-seq", type=int, default=512)
    pv.add_argument("--dtype", default="bfloat16")
    pv.add_argument("--ppl-tol", type=float, default=0.005,
                    help="relative perplexity tolerance (cross-machine "
                         "numeric drift)")
    pv.set_defaults(fn=cmd_validate)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
