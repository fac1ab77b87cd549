"""Native (C++) fast path for GGML block dequantization and repacking.

Compiled on demand with g++ into a cached shared library and loaded via
ctypes; every entry point has a numpy fallback in ``quant/``, so the
engine works without a toolchain. ~10-30x faster than numpy for GB-scale
model loads (2 threads here; scales with cores).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "dequant.cpp"
_lib = None
_tried = False


def _build() -> ctypes.CDLL | None:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    cache = cache / "web_rwkv_gguf_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"dequant_{tag}.so"
    if not so.exists():
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td) / "dequant.so"
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                str(_SRC), "-o", str(tmp),
            ]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, so)
    return ctypes.CDLL(str(so))


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("RWKV_TPU_NO_NATIVE"):
        return None
    try:
        _lib = _build()
        for name in ("dequant_q8_0", "dequant_q4_0", "dequant_q4_k",
                     "dequant_q5_k", "dequant_q6_k"):
            fn = getattr(_lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _lib.repack_q4_k.restype = None
        _lib.repack_q4_k.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
    except Exception as e:  # pragma: no cover - toolchain-dependent
        log.warning("native dequant unavailable (%s); using numpy", e)
        _lib = None
    return _lib


_BLOCK_BYTES = {"q8_0": 34, "q4_0": 18, "q4_k": 144, "q5_k": 176, "q6_k": 210}
_BLOCK_ELEMS = {"q8_0": 32, "q4_0": 32, "q4_k": 256, "q5_k": 256, "q6_k": 256}


def dequantize(kind: str, data, num_elements: int) -> np.ndarray | None:
    """Native dequant to f32, or None if the library is unavailable."""
    lib = get_lib()
    if lib is None or kind not in _BLOCK_BYTES:
        return None
    buf = np.ascontiguousarray(np.frombuffer(data, np.uint8))
    n_blocks = buf.size // _BLOCK_BYTES[kind]
    out = np.empty(n_blocks * _BLOCK_ELEMS[kind], np.float32)
    getattr(lib, f"dequant_{kind}")(
        buf.ctypes.data, n_blocks, out.ctypes.data
    )
    return out[:num_elements]


def repack_q4_k(data, m: int, k: int):
    """Native split-halves Q4_K repack, or None."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.ascontiguousarray(np.frombuffer(data, np.uint8))
    n_blocks = buf.size // 144
    codes = np.empty((m, k // 2), np.uint8)
    scales = np.empty((m, k // 32), np.float32)
    mins = np.empty((m, k // 32), np.float32)
    lib.repack_q4_k(
        buf.ctypes.data, n_blocks, k,
        codes.ctypes.data, scales.ctypes.data, mins.ctypes.data,
    )
    return codes, scales, mins
