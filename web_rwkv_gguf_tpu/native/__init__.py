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

_SRCS = [Path(__file__).parent / "dequant.cpp",
         Path(__file__).parent / "tokenizer.cpp"]
_lib = None
_tried = False


def _build() -> ctypes.CDLL | None:
    src = "".join(p.read_text() for p in _SRCS)
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    cache = cache / "web_rwkv_gguf_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"native_{tag}.so"
    if not so.exists():
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td) / "native.so"
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                *map(str, _SRCS), "-o", str(tmp),
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
        for name in ("dequant_q8_0", "dequant_q4_0", "dequant_q4_1",
                     "dequant_q5_0", "dequant_q5_1", "dequant_q4_k",
                     "dequant_q5_k", "dequant_q6_k", "dequant_q3_k",
                     "dequant_q2_k"):
            fn = getattr(_lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _lib.repack_q4_k.restype = None
        _lib.repack_q4_k.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib.tok_build.restype = ctypes.c_void_p
        _lib.tok_build.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib.tok_free.restype = None
        _lib.tok_free.argtypes = [ctypes.c_void_p]
        _lib.tok_encode.restype = ctypes.c_int64
        _lib.tok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
        ]
    except Exception as e:  # pragma: no cover - toolchain-dependent
        log.warning(
            "native library unavailable (dequant+tokenizer fast paths "
            "disabled, using pure-Python fallbacks): %s", e
        )
        _lib = None
    return _lib


_BLOCK_BYTES = {"q8_0": 34, "q4_0": 18, "q4_1": 20, "q5_0": 22, "q5_1": 24,
                "q4_k": 144, "q5_k": 176, "q6_k": 210, "q3_k": 110,
                "q2_k": 84}
_BLOCK_ELEMS = {"q8_0": 32, "q4_0": 32, "q4_1": 32, "q5_0": 32, "q5_1": 32,
                "q4_k": 256, "q5_k": 256, "q6_k": 256, "q3_k": 256,
                "q2_k": 256}


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


class NativeVocab:
    """Handle to a C++-side vocab table (see tokenizer.cpp). Returns
    None from :func:`build_vocab` when the native library is missing, so
    callers always keep the Python fallback."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._handle = handle

    def __del__(self):  # pragma: no cover - interpreter-shutdown order
        try:
            if self._handle:
                self._lib.tok_free(self._handle)
                self._handle = None
        except Exception:
            pass

    def encode(self, data: bytes) -> np.ndarray:
        """Greedy longest-match encode of raw bytes → int32 token ids.
        Raises ValueError at the same unmatchable offset the Python
        implementation would."""
        n = len(data)
        cap = max(16, n)  # tokens never outnumber bytes
        out = np.empty(cap, np.int32)
        buf = np.frombuffer(data, np.uint8) if n else np.empty(0, np.uint8)
        count = self._lib.tok_encode(
            self._handle, buf.ctypes.data if n else None, n,
            out.ctypes.data, cap,
        )
        if count < 0:
            pos = -count - 1
            raise ValueError(
                f"no matching token at byte offset {pos} ({data[pos:pos+8]!r})"
            )
        return out[:count].copy()


def build_vocab(entries) -> NativeVocab | None:
    """Build the native vocab from ``[(bytes, id), ...]``; None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    blob = b"".join(b for b, _ in entries)
    offsets = np.zeros(len(entries) + 1, np.int64)
    np.cumsum([len(b) for b, _ in entries], out=offsets[1:])
    ids = np.asarray([tid for _, tid in entries], np.int32)
    handle = lib.tok_build(
        len(entries), blob if blob else None, offsets.ctypes.data,
        ids.ctypes.data,
    )
    return NativeVocab(lib, handle) if handle else None


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
