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
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
