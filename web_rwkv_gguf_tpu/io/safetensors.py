"""Minimal SafeTensors reader with the same Reader API as GgufFile.

The reference's primary non-GGUF format (ref: src/runtime/loader.rs uses
the safetensors crate). Pure numpy + mmap; returns tensors in stored
(model) convention.
"""

from __future__ import annotations

import json
import mmap
import struct
from pathlib import Path

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


class SafetensorsFile:
    def __init__(self, data):
        self._own = None
        if isinstance(data, (str, Path)):
            f = open(data, "rb")
            self._own = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            f.close()
            data = memoryview(self._own)
        elif isinstance(data, (bytes, bytearray)):
            data = memoryview(data)
        self.data = data
        (hlen,) = struct.unpack("<Q", bytes(data[:8]))
        header = json.loads(bytes(data[8 : 8 + hlen]).decode("utf-8"))
        header.pop("__metadata__", None)
        self.header = header
        self._base = 8 + hlen

    def names(self):
        return list(self.header)

    def contains(self, name: str) -> bool:
        return name in self.header

    def shape(self, name: str):
        return tuple(self.header[name]["shape"])

    def tensor(self, name: str, dtype=np.float16) -> np.ndarray:
        ent = self.header[name]
        np_dtype = _DTYPES.get(ent["dtype"])
        if np_dtype is None:
            if ent["dtype"] == "BF16":
                import ml_dtypes

                np_dtype = ml_dtypes.bfloat16
            else:
                raise ValueError(f"unsupported safetensors dtype {ent['dtype']}")
        lo, hi = ent["data_offsets"]
        raw = np.frombuffer(self.data, np.uint8, hi - lo, self._base + lo)
        arr = raw.view(np_dtype).reshape(ent["shape"])
        return arr.astype(dtype, copy=False)

    def quantized_tensor(self, name: str):
        return None


def write_safetensors(path, tensors: dict[str, np.ndarray]):
    """Write a .st file (used by the converter and tests)."""
    inv = {v: k for k, v in _DTYPES.items()}
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        code = inv.get(arr.dtype.type)
        if code is None:
            if arr.dtype.name == "bfloat16":
                code = "BF16"
            else:
                raise ValueError(f"unsupported dtype {arr.dtype}")
        n = arr.nbytes
        header[name] = {
            "dtype": code,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + n],
        }
        blobs.append(arr.tobytes())
        offset += n
    hjson = json.dumps(header).encode("utf-8")
    pad = (-len(hjson)) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
