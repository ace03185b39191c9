"""GGUF reader/writer tests: header, every metadata value type incl. nested
arrays, alignment edge cases, tensor round-trips (SURVEY.md §4 unit bullet)."""
import numpy as np
import pytest

from nfai_tpu.gguf import (
    GGMLType,
    GGUFFile,
    GGUFValueType,
    GGUFWriter,
    Keys,
)


def _write_and_open(tmp_path, w: GGUFWriter) -> GGUFFile:
    p = w.write(tmp_path / "test.gguf")
    return GGUFFile.open(p)


def test_metadata_all_value_types(tmp_path):
    w = GGUFWriter()
    w.add("k.u8", 3, GGUFValueType.UINT8)
    w.add("k.i8", -3, GGUFValueType.INT8)
    w.add("k.u16", 300, GGUFValueType.UINT16)
    w.add("k.i16", -300, GGUFValueType.INT16)
    w.add("k.u32", 70000)
    w.add("k.i32", -70000, GGUFValueType.INT32)
    w.add("k.f32", 1.5)
    w.add("k.bool", True)
    w.add("k.str", "hello")
    w.add("k.u64", 2**40)
    w.add("k.i64", -(2**40), GGUFValueType.INT64)
    w.add("k.f64", 2.5, GGUFValueType.FLOAT64)
    w.add("k.arr.i", [1, 2, 3])
    w.add("k.arr.s", ["a", "bb", "ccc"])
    w.add("k.arr.f", [0.5, 1.5])
    w.add("k.arr.nested", [["x", "y"], ["z"]])
    g = _write_and_open(tmp_path, w)
    md = g.metadata
    assert md["k.u8"] == 3 and md["k.i8"] == -3
    assert md["k.u16"] == 300 and md["k.i16"] == -300
    assert md["k.u32"] == 70000 and md["k.i32"] == -70000
    assert md["k.f32"] == 1.5 and md["k.f64"] == 2.5
    assert md["k.bool"] is True or md["k.bool"] == 1
    assert md["k.str"] == "hello"
    assert md["k.u64"] == 2**40 and md["k.i64"] == -(2**40)
    assert md["k.arr.i"] == [1, 2, 3]
    assert md["k.arr.s"] == ["a", "bb", "ccc"]
    assert md["k.arr.f"] == [0.5, 1.5]
    assert md["k.arr.nested"] == [["x", "y"], ["z"]]
    g.close()


@pytest.mark.parametrize("alignment", [32, 64, 4096])
def test_tensor_roundtrip_alignment(tmp_path, rng, alignment):
    w = GGUFWriter(alignment=alignment)
    w.add(Keys.ALIGNMENT, alignment)
    a = rng.standard_normal((4, 64)).astype(np.float32)
    b = rng.standard_normal((3, 32)).astype(np.float32)
    w.add_tensor("a", a)
    w.add_tensor("b.f16", b, GGMLType.F16)
    g = _write_and_open(tmp_path, w)
    assert g.alignment == alignment
    assert g.data_offset % alignment == 0
    for desc in g.tensors.values():
        assert desc.offset % alignment == 0
    np.testing.assert_array_equal(g.tensor_f32("a"), a)
    np.testing.assert_allclose(g.tensor_f32("b.f16"), b, atol=1e-3)
    g.close()


def test_tensor_dims_ggml_order(tmp_path, rng):
    # numpy shape (rows, cols) must be stored as ggml dims (cols, rows)
    w = GGUFWriter()
    a = rng.standard_normal((8, 32)).astype(np.float32)
    w.add_tensor("w", a)
    g = _write_and_open(tmp_path, w)
    desc = g.tensors["w"]
    assert desc.dims_ggml == (32, 8)
    assert desc.shape == (8, 32)
    np.testing.assert_array_equal(g.tensor_f32("w"), a)
    g.close()


def test_quantized_tensor_roundtrip(tmp_path, rng):
    w = GGUFWriter()
    x = rng.standard_normal((16, 256)).astype(np.float32)
    w.add_tensor("q8", x, GGMLType.Q8_0)
    w.add_tensor("q4k", x, GGMLType.Q4_K)
    g = _write_and_open(tmp_path, w)
    assert g.tensors["q8"].ggml_type == GGMLType.Q8_0
    dec8 = g.tensor_f32("q8")
    dec4k = g.tensor_f32("q4k")
    assert dec8.shape == x.shape and dec4k.shape == x.shape
    assert np.sqrt(np.mean((dec8 - x) ** 2)) < 0.01
    assert np.sqrt(np.mean((dec4k - x) ** 2)) < 0.2
    g.close()


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        GGUFFile.open(p)


def test_architecture_helpers(tmp_path):
    w = GGUFWriter()
    w.add(Keys.ARCHITECTURE, "llama")
    w.add("llama.block_count", 4)
    g = _write_and_open(tmp_path, w)
    assert g.architecture == "llama"
    assert g.arch_key(Keys.BLOCK_COUNT) == 4
    g.close()


# ---------------------------------------------------------------------------
# native (C++/OpenMP) decoder parity


def _native_lib():
    import subprocess
    from pathlib import Path

    from nfai_tpu.gguf import native

    if native.load_library() is None:
        root = Path(__file__).resolve().parents[1]
        subprocess.run(["make", "-C", str(root / "native")], check=True)
        native._lib_tried = False
    return native.load_library()


def test_native_dequant_matches_numpy(rng):
    from nfai_tpu.gguf import GGMLType, dequantize, quantize
    from nfai_tpu.gguf import native

    if _native_lib() is None:
        pytest.skip("native library build unavailable")
    # tiny magnitudes force *subnormal* f16 block scales — regression for the
    # f16_to_f32 denormal exponent bug (decoded exactly half)
    for mag in (1.0, 1e-6):
        for t in (
            GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K,
            GGMLType.Q5_K, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q6_K,
            GGMLType.F16,
        ):
            x = (rng.standard_normal(512) * mag).astype(np.float32)
            enc = quantize(x, t)
            np.testing.assert_array_equal(
                native.dequantize_native(enc, 512, t),
                dequantize(enc, 512, t),
                err_msg=f"{t.name} mag={mag}",
            )


def test_native_fused_transpose(tmp_path, rng):
    from nfai_tpu.gguf import GGMLType, GGUFWriter, GGUFFile

    if _native_lib() is None:
        pytest.skip("native library build unavailable")
    x = rng.standard_normal((32, 256)).astype(np.float32)
    w = GGUFWriter()
    w.add_tensor("w", x, GGMLType.Q4_K)
    p = w.write(tmp_path / "t.gguf")
    with GGUFFile.open(p) as g:
        wt = g.tensor_f32_transposed("w")
        np.testing.assert_allclose(wt, g.tensor_f32("w").T, rtol=1e-6, atol=1e-7)


def test_truncation_fuzz(tmp_path, rng):
    """Random truncations of a valid file must raise cleanly, never hang."""
    w = GGUFWriter()
    w.add(Keys.ARCHITECTURE, "llama")
    w.add("k.arr", [1, 2, 3])
    w.add_tensor("t", rng.standard_normal((4, 32)).astype(np.float32))
    blob = w.to_bytes()
    for frac in (0.1, 0.3, 0.5, 0.9, 0.99):
        cut = int(len(blob) * frac)
        p = tmp_path / f"cut_{cut}.gguf"
        p.write_bytes(blob[:cut])
        try:
            g = GGUFFile.open(p)
            # header may parse; tensor reads past EOF must fail cleanly
            for name in g.tensors:
                try:
                    g.tensor_f32(name)
                except Exception:
                    pass
            g.close()
        except Exception:
            pass  # any clean exception is acceptable; hangs/crashes are not
