"""Byte-level golden GGUF container fixtures — hand-assembled with
``struct.pack``, NEVER via the repo's ``GgufWriter`` (which would make
the container tests circular: a shared misreading of the spec would pass
writer-roundtrip tests and fail on the first llama.cpp file).

Covers: v2 AND v3 headers, every metadata value type including nested
arrays, non-default alignment, f32/f16 + quantized tensors (porting the
reference's synthetic-block vectors, ref: src/runtime/gguf.rs:1797-1857),
a fused-lerp v7 layout, and corrupted-container error paths.
"""

import struct

import numpy as np
import pytest

from web_rwkv_gguf_tpu.errors import GgufError
from web_rwkv_gguf_tpu.gguf import GgufFile
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType

MAGIC = 0x46554747

# GGUF metadata value type ids (spec; ref: gguf.rs:1509-1536)
T_U8, T_I8, T_U16, T_I16, T_U32, T_I32, T_F32 = 0, 1, 2, 3, 4, 5, 6
T_BOOL, T_STRING, T_ARRAY, T_U64, T_I64, T_F64 = 7, 8, 9, 10, 11, 12


def _s(text: str) -> bytes:
    b = text.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def _kv(key: str, vtype: int, payload: bytes) -> bytes:
    return _s(key) + struct.pack("<I", vtype) + payload


def _arr(etype: int, items: list[bytes]) -> bytes:
    return struct.pack("<IQ", etype, len(items)) + b"".join(items)


def _tensor_info(name: str, dims, ttype: int, offset: int) -> bytes:
    out = _s(name) + struct.pack("<I", len(dims))
    for d in dims:
        out += struct.pack("<Q", d)
    out += struct.pack("<IQ", ttype, offset)
    return out


def _align(n: int, a: int) -> int:
    return -(-n // a) * a


def _build(version: int, kvs: list[bytes], tensors: list[tuple[bytes, bytes]],
           alignment: int = 32) -> bytes:
    """Assemble a container: ``tensors`` is a list of (info_bytes_builder
    result placeholder, data) — infos are built here so offsets are
    consistent with the concatenated data section."""
    infos, datas, offset = [], [], 0
    for (name, dims, ttype), data in tensors:
        offset = _align(offset, alignment)
        infos.append(_tensor_info(name, dims, ttype, offset))
        datas.append((offset, data))
        offset += len(data)
    header = struct.pack("<IIQQ", MAGIC, version, len(tensors), len(kvs))
    body = header + b"".join(kvs) + b"".join(infos)
    data_start = _align(len(body), alignment)
    blob = bytearray(body)
    blob += b"\x00" * (data_start - len(body))
    for off, data in datas:
        pos = data_start + off
        blob += b"\x00" * (pos - len(blob))
        blob += data
    return bytes(blob)


def _f16(x) -> bytes:
    return np.asarray(x, np.float16).tobytes()


def _q8_0_block(scale: float, codes) -> bytes:
    """Reference vector layout (gguf.rs:1810-1818): f16 scale + 32 i8."""
    return _f16(scale) + np.asarray(codes, np.int8).tobytes()


def _q4_0_block(scale: float, packed_bytes) -> bytes:
    """f16 scale + 16 packed nibble bytes (gguf.rs:1831-1842)."""
    return _f16(scale) + bytes(packed_bytes)


@pytest.mark.parametrize("version", [2, 3])
def test_golden_metadata_all_types(version):
    """Every KV value type, incl. a nested array-of-arrays, pinned to
    exact values from hand-packed bytes."""
    kvs = [
        _kv("k.u8", T_U8, struct.pack("<B", 200)),
        _kv("k.i8", T_I8, struct.pack("<b", -7)),
        _kv("k.u16", T_U16, struct.pack("<H", 60000)),
        _kv("k.i16", T_I16, struct.pack("<h", -12345)),
        _kv("k.u32", T_U32, struct.pack("<I", 4000000000)),
        _kv("k.i32", T_I32, struct.pack("<i", -100000)),
        _kv("k.f32", T_F32, struct.pack("<f", 1.5)),
        _kv("k.bool_t", T_BOOL, struct.pack("<B", 1)),
        _kv("k.bool_f", T_BOOL, struct.pack("<B", 0)),
        _kv("k.str", T_STRING, _s("hello gguf")),
        _kv("k.u64", T_U64, struct.pack("<Q", 1 << 40)),
        _kv("k.i64", T_I64, struct.pack("<q", -(1 << 40))),
        _kv("k.f64", T_F64, struct.pack("<d", 2.25)),
        _kv("k.arr_i32", T_ARRAY,
            _arr(T_I32, [struct.pack("<i", v) for v in (3, -4, 5)])),
        _kv("k.arr_str", T_ARRAY, _arr(T_STRING, [_s("a"), _s("bc")])),
        # nested: array of arrays of u8
        _kv("k.arr_nested", T_ARRAY, _arr(T_ARRAY, [
            _arr(T_U8, [struct.pack("<B", 1), struct.pack("<B", 2)]),
            _arr(T_U8, [struct.pack("<B", 3)]),
        ])),
    ]
    f = GgufFile(_build(version, kvs, []))
    assert f.version == version
    m = f.metadata
    assert m["k.u8"] == 200 and m["k.i8"] == -7
    assert m["k.u16"] == 60000 and m["k.i16"] == -12345
    assert m["k.u32"] == 4000000000 and m["k.i32"] == -100000
    assert m["k.f32"] == 1.5
    assert m["k.bool_t"] is True and m["k.bool_f"] is False
    assert m["k.str"] == "hello gguf"
    assert m["k.u64"] == 1 << 40 and m["k.i64"] == -(1 << 40)
    assert m["k.f64"] == 2.25
    assert m["k.arr_i32"] == [3, -4, 5]
    assert m["k.arr_str"] == ["a", "bc"]
    assert m["k.arr_nested"] == [[1, 2], [3]]


@pytest.mark.parametrize("version", [2, 3])
def test_golden_f32_f16_tensors(version):
    """Dense tensors: on-disk dims are fastest-first; the reader reports
    model convention (reversed for 2-D+), and values land row-major."""
    a = np.arange(12, dtype=np.float32).reshape(3, 4)  # [out=3, in=4]
    v = np.asarray([1.0, -2.0, 3.5], np.float16)
    blob = _build(version, [], [
        (("mat", (4, 3), int(GgmlDType.F32)), a.tobytes()),
        (("vec", (3,), int(GgmlDType.F16)), v.tobytes()),
    ])
    f = GgufFile(blob)
    assert f.shape("mat") == (3, 4)
    np.testing.assert_array_equal(f.tensor("mat", np.float32), a)
    assert f.shape("vec") == (3,)
    np.testing.assert_array_equal(f.tensor("vec"), v)


def test_golden_q8_0_reference_vector():
    """The reference's Q8_0 vector: scale=1.0, codes 0..31 → values 0..31
    (ref: gguf.rs:1810-1827)."""
    blob = _build(3, [], [
        (("w", (32,), int(GgmlDType.Q8_0)),
         _q8_0_block(1.0, list(range(32)))),
    ])
    f = GgufFile(blob)
    got = f.tensor("w", np.float16)
    np.testing.assert_array_equal(got, np.arange(32, dtype=np.float16))


def test_golden_q4_0_reference_vector():
    """The reference's Q4_0 vector: scale=1.0, all bytes 0x88 → every
    element 0 (both nibbles = 8, value = nib − 8; ref: gguf.rs:1829-1848).
    Element ORDER deliberately follows the ggml spec split-halves layout
    (byte j = element j | element j+16), not the reference's interleaved
    read — see PARITY.md; an order-insensitive vector pins the math, the
    order itself is pinned in test_quant_ggml.py against llama.cpp's
    dequantize_row_q4_0 transcription."""
    blob = _build(3, [], [
        (("w", (32,), int(GgmlDType.Q4_0)),
         _q4_0_block(1.0, [0x88] * 16)),
    ])
    f = GgufFile(blob)
    np.testing.assert_array_equal(
        f.tensor("w", np.float16), np.zeros(32, np.float16)
    )
    # a non-uniform block: lo nibble of byte 0 = 0x9 → element 0 = +1,
    # hi nibble of byte 0 = 0x8 → element 16 = 0 (split-halves order)
    blob2 = _build(3, [], [
        (("w", (32,), int(GgmlDType.Q4_0)),
         _q4_0_block(2.0, [0x89] + [0x88] * 15)),
    ])
    got = GgufFile(blob2).tensor("w", np.float32)
    assert got[0] == 2.0  # (9-8)*2
    assert got[16] == 0.0
    assert np.count_nonzero(got) == 1


def test_golden_nondefault_alignment():
    """general.alignment=64: tensor data starts at a 64-byte boundary and
    inter-tensor offsets are 64-aligned."""
    a = np.arange(4, dtype=np.float32)
    b = np.arange(5, dtype=np.float32)
    kvs = [_kv("general.alignment", T_U32, struct.pack("<I", 64))]
    blob = _build(3, kvs, [
        (("a", (4,), int(GgmlDType.F32)), a.tobytes()),
        (("b", (5,), int(GgmlDType.F32)), b.tobytes()),
    ], alignment=64)
    f = GgufFile(blob)
    assert f.tensor_data_offset % 64 == 0
    assert f.tensors["b"].offset % 64 == 0 and f.tensors["b"].offset >= 16
    np.testing.assert_array_equal(f.tensor("a", np.float32), a)
    np.testing.assert_array_equal(f.tensor("b", np.float32), b)


def test_golden_fused_lerp_v7_layout():
    """A v7 fused-lerp file (time_mix_lerp_fused stored [emb,1,1,6])
    serves six virtual x_* slices at contiguous emb-sized offsets
    (ref: gguf.rs:1545-1571); r_k reshapes from metadata head_size."""
    emb, hs = 8, 4
    fused = np.arange(6 * emb, dtype=np.float32).reshape(6, emb)
    r_k = np.arange(emb, dtype=np.float32)
    kvs = [_kv("rwkv7.wkv.head_size", T_U32, struct.pack("<I", hs))]
    blob = _build(3, kvs, [
        (("blk.0.time_mix_lerp_fused.weight", (emb, 1, 1, 6),
          int(GgmlDType.F32)), fused.tobytes()),
        (("blk.0.time_mix_r_k.weight", (emb,), int(GgmlDType.F32)),
         r_k.tobytes()),
    ])
    f = GgufFile(blob)
    names = f.names()
    for i, s in enumerate(("x_r", "x_w", "x_k", "x_v", "x_a", "x_g")):
        vname = f"blocks.0.att.{s}"
        assert vname in names
        assert f.shape(vname) == (emb,)
        np.testing.assert_array_equal(
            f.tensor(vname, np.float32), fused[i]
        )
    assert f.shape("blocks.0.att.r_k") == (emb // hs, hs)
    np.testing.assert_array_equal(
        f.tensor("blocks.0.att.r_k", np.float32),
        r_k.reshape(emb // hs, hs),
    )


def test_golden_corrupted_containers():
    """Corruption paths raise GgufError (never a bare crash): bad magic,
    unsupported version, truncated metadata, invalid value type id,
    invalid alignment, tensor data past EOF."""
    ok = _build(3, [], [
        (("a", (4,), int(GgmlDType.F32)),
         np.zeros(4, np.float32).tobytes()),
    ])
    with pytest.raises(GgufError):
        GgufFile(b"FUGG" + ok[4:])
    with pytest.raises(GgufError):
        GgufFile(ok[:4] + struct.pack("<I", 1) + ok[8:])  # v1 unsupported
    with pytest.raises(GgufError):
        GgufFile(ok[:20])  # truncated header/infos
    bad_vtype = _kv("k", 99, b"")
    with pytest.raises(GgufError):
        GgufFile(_build(3, [bad_vtype], []))
    # alignment = 0 and non-power-of-two both rejected
    for bad_align in (0, 24):
        kv = [_kv("general.alignment", T_U32, struct.pack("<I", bad_align))]
        with pytest.raises(GgufError):
            GgufFile(_build(3, kv, []))
    # tensor data region exceeding the file
    truncated = ok[:-8]
    f = GgufFile(truncated)
    with pytest.raises(GgufError):
        f.tensor("a", np.float32)


def test_golden_every_truncation_raises_gguferror():
    """Sweep EVERY prefix of a small valid file through the parser: a
    truncated container must raise GgufError at header-parse time or at
    tensor read — never IndexError/struct.error/ValueError or a silent
    success with garbage (real downloads truncate at arbitrary
    offsets)."""
    ok = _build(3, [
        _kv("k.str", T_STRING, _s("hello")),
        _kv("k.u32", T_U32, struct.pack("<I", 7)),
    ], [
        (("a", (4,), int(GgmlDType.F32)),
         np.arange(4, dtype=np.float32).tobytes()),
    ])
    full = GgufFile(ok)
    want = full.tensor("a", np.float32)
    for cut in range(len(ok)):
        blob = ok[:cut]
        try:
            f = GgufFile(blob)
        except GgufError:
            continue  # rejected at parse: correct
        # parsed (tensor data region may be the truncated part): the
        # tensor read must either succeed bit-exactly or raise GgufError
        try:
            got = f.tensor("a", np.float32)
        except GgufError:
            continue
        np.testing.assert_array_equal(got, want, err_msg=f"cut={cut}")


def test_golden_align_offset_vectors():
    """The reference's align_offset vectors (gguf.rs:1851-1856) applied
    to the data-offset rounding."""
    assert _align(0, 32) == 0
    assert _align(1, 32) == 32
    assert _align(32, 32) == 32
    assert _align(33, 32) == 64
    # the reader's own rounding agrees: a header whose byte length is not
    # a multiple of 32 rounds the data offset up
    blob = _build(3, [_kv("k.str", T_STRING, _s("x"))], [
        (("a", (1,), int(GgmlDType.F32)), np.ones(1, np.float32).tobytes()),
    ])
    f = GgufFile(blob)
    assert f.tensor_data_offset % 32 == 0
    assert f.tensor("a", np.float32)[0] == 1.0
