"""CLI / tools entry-point tests (subprocess, CPU backend): chat REPL piped
mode, gguf inspect/requantize, eval CLI."""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from nfai_tpu.gguf import GGMLType
from nfai_tpu.models.testing import make_tiny_llama_gguf

REPO = Path(__file__).resolve().parents[1]


def run(args, input_text=None, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # ignored by plugin, but harmless
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         f"import sys; sys.argv = {args!r}; "
         "import runpy; runpy.run_module(sys.argv[0].replace('/', '.'), "
         "run_name='__main__', alter_sys=True)"],
        input=input_text,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
        env=env,
    )


@pytest.fixture(scope="module")
def gguf_path(tmp_path_factory):
    return str(
        make_tiny_llama_gguf(
            tmp_path_factory.mktemp("cli") / "m.gguf",
            n_layers=2,
            context_length=512,
        )
    )


def test_cli_chat_piped(gguf_path):
    r = run(
        ["nfai_tpu.cli", "--gguf", gguf_path, "--max-seq", "256", "--temp", "0",
         "--max-new-tokens", "4", "--metrics"],
        input_text="hi\nquit\n",
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert "tok/s]" in r.stderr  # metrics line

def test_tools_inspect(gguf_path):
    r = run(["nfai_tpu.tools", "inspect", gguf_path, "--tensors"])
    assert r.returncode == 0, r.stderr[-500:]
    assert "arch:      llama" in r.stdout
    assert "token_embd.weight" in r.stdout


def test_tools_requantize(gguf_path, tmp_path):
    out = str(tmp_path / "rq.gguf")
    r = run(["nfai_tpu.tools", "requantize", gguf_path, out, "--type", "q8_0"])
    assert r.returncode == 0, r.stderr[-500:]
    assert Path(out).exists()


def test_eval_cli(gguf_path, tmp_path):
    text = tmp_path / "corpus.txt"
    text.write_text("hello world " * 40)
    r = run(
        ["nfai_tpu.eval", "--gguf", gguf_path, "--text", str(text),
         "--window", "32", "--dtype", "float32"],
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "ppl_quantized" in out or "ppl_dense" in out
