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


def test_validate_harness_roundtrip(tmp_path):
    """tools validate: --update records fixtures; a re-run passes; a
    DIFFERENT checkpoint (same shapes, different weights) fails — the
    harness is proven working before any real GGUF is reachable."""
    from nfai_tpu.models.testing import make_tiny_llama_gguf
    from nfai_tpu.tools import main as tools_main

    p1 = make_tiny_llama_gguf(tmp_path / "v1.gguf", n_layers=2, seed=70,
                              context_length=256)
    p2 = make_tiny_llama_gguf(tmp_path / "v2.gguf", n_layers=2, seed=71,
                              context_length=256)
    fx = str(tmp_path / "fixtures.json")
    common = ["--fixtures", fx, "--max-seq", "96", "--dtype", "float32"]
    # no fixture yet -> exit 2
    assert tools_main(["validate", str(p1), *common]) == 2
    # record, then check passes
    assert tools_main(["validate", str(p1), *common, "--update"]) == 0
    assert tools_main(["validate", str(p1), *common]) == 0
    # the OTHER checkpoint has its own hash -> needs its own fixture
    assert tools_main(["validate", str(p2), *common]) == 2
    # corrupt the recorded goldens -> validation must FAIL (exit 1)
    import json as _json

    with open(fx) as f:
        data = _json.load(f)
    key = next(iter(data))
    data[key]["greedy_tokens"][0][0] ^= 1
    with open(fx, "w") as f:
        _json.dump(data, f)
    assert tools_main(["validate", str(p1), *common]) == 1
