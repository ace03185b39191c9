"""GGUF binary writer.

The reference has no writer; this exists so tests can fabricate valid GGUF
fixtures (synthetic tiny Llama checkpoints, metadata edge cases) and so tools
can re-quantize models. Produces spec-conformant v3 files readable by
`reader.GGUFFile` and by llama.cpp.
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Any

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUF_VERSION,
    GGMLType,
    GGUFValueType,
    tensor_nbytes,
)
from .quants import quantize


def _infer_vtype(value: Any) -> GGUFValueType:
    if isinstance(value, bool):
        return GGUFValueType.BOOL
    if isinstance(value, int):
        return GGUFValueType.INT64 if (value < 0 or value >= 2**32) else GGUFValueType.UINT32
    if isinstance(value, float):
        return GGUFValueType.FLOAT32
    if isinstance(value, str):
        return GGUFValueType.STRING
    if isinstance(value, (list, tuple, np.ndarray)):
        return GGUFValueType.ARRAY
    raise TypeError(f"cannot infer GGUF value type for {type(value)}")


class GGUFWriter:
    def __init__(self, alignment: int = GGUF_DEFAULT_ALIGNMENT):
        self.alignment = alignment
        self._kv: list[tuple[str, GGUFValueType, Any]] = []
        self._tensors: list[tuple[str, tuple[int, ...], GGMLType, bytes]] = []

    # -- metadata ----------------------------------------------------------
    def add(self, key: str, value: Any, vtype: GGUFValueType | None = None) -> None:
        self._kv.append((key, vtype or _infer_vtype(value), value))

    # -- tensors -----------------------------------------------------------
    def add_tensor(
        self,
        name: str,
        array: np.ndarray,
        ggml_type: GGMLType | None = None,
        raw_bytes: bytes | None = None,
    ) -> None:
        """Add a tensor. `array.shape` is numpy (row-major) order; stored dims are
        reversed into ggml order. If `raw_bytes` is given it is used verbatim
        (array supplies only the shape); otherwise `array` is quantized."""
        if ggml_type is None:
            ggml_type = {
                np.dtype(np.float32): GGMLType.F32,
                np.dtype(np.float16): GGMLType.F16,
                np.dtype(np.int32): GGMLType.I32,
            }.get(array.dtype)
            if ggml_type is None:
                raise TypeError(f"cannot infer ggml type for dtype {array.dtype}")
        if raw_bytes is None:
            if ggml_type in (GGMLType.I8, GGMLType.I16, GGMLType.I32, GGMLType.I64):
                np_dtype = {GGMLType.I8: np.int8, GGMLType.I16: np.int16,
                            GGMLType.I32: np.int32, GGMLType.I64: np.int64}[ggml_type]
                raw_bytes = np.ascontiguousarray(array, dtype=np_dtype).tobytes()
            else:
                raw_bytes = quantize(np.asarray(array, dtype=np.float32), ggml_type).tobytes()
        expected = tensor_nbytes(int(np.prod(array.shape)), ggml_type)
        if len(raw_bytes) != expected:
            raise ValueError(
                f"{name}: payload is {len(raw_bytes)} bytes, expected {expected}"
            )
        dims_ggml = tuple(reversed(array.shape))
        self._tensors.append((name, dims_ggml, ggml_type, raw_bytes))

    # -- serialization -----------------------------------------------------
    @staticmethod
    def _pack_string(s: str) -> bytes:
        b = s.encode("utf-8")
        return struct.pack("<Q", len(b)) + b

    @classmethod
    def _pack_value(cls, vtype: GGUFValueType, value: Any) -> bytes:
        fmt = {
            GGUFValueType.UINT8: "<B",
            GGUFValueType.INT8: "<b",
            GGUFValueType.UINT16: "<H",
            GGUFValueType.INT16: "<h",
            GGUFValueType.UINT32: "<I",
            GGUFValueType.INT32: "<i",
            GGUFValueType.FLOAT32: "<f",
            GGUFValueType.BOOL: "<?",
            GGUFValueType.UINT64: "<Q",
            GGUFValueType.INT64: "<q",
            GGUFValueType.FLOAT64: "<d",
        }
        if vtype == GGUFValueType.STRING:
            return cls._pack_string(str(value))
        if vtype == GGUFValueType.ARRAY:
            items = list(value)
            elem_type = _infer_vtype(items[0]) if items else GGUFValueType.UINT32
            out = struct.pack("<IQ", int(elem_type), len(items))
            return out + b"".join(cls._pack_value(elem_type, v) for v in items)
        return struct.pack(fmt[vtype], value)

    def to_bytes(self) -> bytes:
        header = struct.pack(
            "<IIQQ", GGUF_MAGIC, GGUF_VERSION, len(self._tensors), len(self._kv)
        )
        kv_blob = b"".join(
            self._pack_string(k) + struct.pack("<I", int(t)) + self._pack_value(t, v)
            for k, t, v in self._kv
        )
        # tensor infos with aligned offsets
        infos = b""
        payloads: list[bytes] = []
        offset = 0
        for name, dims_ggml, ggml_type, raw in self._tensors:
            offset = (offset + self.alignment - 1) // self.alignment * self.alignment
            infos += self._pack_string(name)
            infos += struct.pack("<I", len(dims_ggml))
            infos += b"".join(struct.pack("<Q", d) for d in dims_ggml)
            infos += struct.pack("<IQ", int(ggml_type), offset)
            payloads.append((offset, raw))
            offset += len(raw)

        head = header + kv_blob + infos
        data_start = (len(head) + self.alignment - 1) // self.alignment * self.alignment
        out = bytearray(head)
        out += b"\x00" * (data_start - len(head))
        for off, raw in payloads:
            pos = data_start + off
            out += b"\x00" * (pos - len(out))
            out += raw
        return bytes(out)

    def write(self, path: str | Path) -> Path:
        path = Path(path)
        path.write_bytes(self.to_bytes())
        return path
