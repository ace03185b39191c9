"""ctypes binding to the native (C++/OpenMP) dequantization library.

Falls back transparently to the numpy codecs (`quants.py`) when the shared
library has not been built. Build it with::

    make -C native

The native path matters at model-load time: dequantizing a multi-GB
checkpoint runs one parallel pass per tensor with a fused transpose into the
device (in, out) layout.
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

from .constants import GGML_BLOCK_LAYOUT, GGMLType

_NATIVE_TYPES = {
    GGMLType.F16,
    GGMLType.BF16,
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.Q8_K,
}

_FN_NAMES = {
    GGMLType.F16: "nfai_dequant_f16",
    GGMLType.BF16: "nfai_dequant_bf16",
    GGMLType.Q4_0: "nfai_dequant_q4_0",
    GGMLType.Q4_1: "nfai_dequant_q4_1",
    GGMLType.Q5_0: "nfai_dequant_q5_0",
    GGMLType.Q5_1: "nfai_dequant_q5_1",
    GGMLType.Q8_0: "nfai_dequant_q8_0",
    GGMLType.Q2_K: "nfai_dequant_q2_k",
    GGMLType.Q3_K: "nfai_dequant_q3_k",
    GGMLType.Q4_K: "nfai_dequant_q4_k",
    GGMLType.Q5_K: "nfai_dequant_q5_k",
    GGMLType.Q6_K: "nfai_dequant_q6_k",
    GGMLType.Q8_K: "nfai_dequant_q8_k",
}

_lib = None
_lib_tried = False


def _find_library() -> Path | None:
    candidates = [
        Path(__file__).resolve().parents[2] / "native" / "libnfai_native.so",
        Path(os.environ.get("NFAI_NATIVE_LIB", "")),
    ]
    for c in candidates:
        if c and c.is_file():
            return c
    return None


def load_library():
    """Load (and cache) the native library; returns None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    path = _find_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    for name in _FN_NAMES.values():
        fn = getattr(lib, name)
        fn.argtypes = [u8p, f32p, ctypes.c_int64]
        fn.restype = None
    lib.nfai_dequant_transpose.argtypes = [
        ctypes.c_int32, u8p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64
    ]
    lib.nfai_dequant_transpose.restype = None
    lib.nfai_num_threads.restype = ctypes.c_int32
    _lib = lib
    return _lib


def available(ggml_type: GGMLType | None = None) -> bool:
    if load_library() is None:
        return False
    return ggml_type is None or ggml_type in _NATIVE_TYPES


def dequantize_native(data: np.ndarray, n: int, ggml_type: GGMLType) -> np.ndarray:
    """Parallel native dequantize; raises RuntimeError when unavailable."""
    lib = load_library()
    if lib is None or ggml_type not in _FN_NAMES:
        raise RuntimeError(f"native dequant unavailable for {ggml_type.name}")
    data = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    out = np.empty(n, np.float32)
    fn = getattr(lib, _FN_NAMES[ggml_type])
    fn(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
    )
    return out


def dequant_transpose_native(
    data: np.ndarray, ggml_type: GGMLType, n_out: int, k_in: int
) -> np.ndarray:
    """Fused dequantize + transpose to the device (in, out) layout."""
    lib = load_library()
    if lib is None or ggml_type not in _FN_NAMES:
        raise RuntimeError(f"native dequant unavailable for {ggml_type.name}")
    layout = GGML_BLOCK_LAYOUT[ggml_type]
    row_bytes = (k_in // layout.block_size) * layout.type_size
    data = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    out = np.empty((k_in, n_out), np.float32)
    lib.nfai_dequant_transpose(
        int(ggml_type),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_out,
        k_in,
        row_bytes,
    )
    return out
