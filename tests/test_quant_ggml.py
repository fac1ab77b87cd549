"""GGML block-format dequantization parity tests.

Ground truth: scalar reimplementations of the GGML block formats (matching
the reference's CPU dequant loops, ref: src/runtime/gguf.rs:9-423), checked
against the vectorized numpy implementations on random synthetic blocks.
"""

import numpy as np
import pytest

from web_rwkv_gguf_tpu.quant import (
    dequantize_q2_k,
    dequantize_q3_k,
    dequantize_q4_0,
    dequantize_q4_1,
    dequantize_q4_k,
    dequantize_q5_0,
    dequantize_q5_1,
    dequantize_q5_k,
    dequantize_q6_k,
    dequantize_q8_0,
    quantize_q4_k,
    quantize_q8_0,
)


def _scalar_get_scale_min_k4(j, scales):
    if j < 4:
        return scales[j] & 63, scales[j + 4] & 63
    d = (scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4)
    m = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
    return d, m


def _f16(b0, b1):
    return np.frombuffer(bytes([b0, b1]), dtype=np.float16)[0].astype(np.float32)


def scalar_dequant_q8_0(data, n):
    out = []
    for bi in range(n // 32):
        blk = data[bi * 34 : bi * 34 + 34]
        d = _f16(blk[0], blk[1])
        for i in range(32):
            q = blk[2 + i] - 256 if blk[2 + i] > 127 else blk[2 + i]
            out.append(q * d)
    return np.array(out, np.float32)


def scalar_dequant_q4_0(data, n):
    # ggml split-halves block order (llama.cpp dequantize_row_q4_0):
    # element j = lo nibble of byte j, element j+16 = hi nibble. The
    # reference interleaves instead (gguf.rs:60-71) — a pre-GGUF-era
    # misread we deliberately do NOT reproduce.
    out = []
    for bi in range(n // 32):
        blk = data[bi * 18 : bi * 18 + 18]
        d = _f16(blk[0], blk[1])
        lo = [((blk[2 + i] & 0x0F) - 8) * d for i in range(16)]
        hi = [(((blk[2 + i] >> 4) & 0x0F) - 8) * d for i in range(16)]
        out.extend(lo)
        out.extend(hi)
    return np.array(out, np.float32)


def scalar_dequant_q4_1(data, n):
    # llama.cpp dequantize_row_q4_1: v = d*nib + m, split-halves order
    out = []
    for bi in range(n // 32):
        blk = data[bi * 20 : bi * 20 + 20]
        d = _f16(blk[0], blk[1])
        m = _f16(blk[2], blk[3])
        lo = [(blk[4 + i] & 0x0F) * d + m for i in range(16)]
        hi = [((blk[4 + i] >> 4) & 0x0F) * d + m for i in range(16)]
        out.extend(lo)
        out.extend(hi)
    return np.array(out, np.float32)


def _scalar_q5_codes(blk, qh_off, qs_off):
    qh = (blk[qh_off] | (blk[qh_off + 1] << 8) | (blk[qh_off + 2] << 16)
          | (blk[qh_off + 3] << 24))
    lo = [(blk[qs_off + j] & 0x0F) | (((qh >> j) & 1) << 4)
          for j in range(16)]
    hi = [((blk[qs_off + j] >> 4) & 0x0F) | (((qh >> (j + 16)) & 1) << 4)
          for j in range(16)]
    return lo + hi


def scalar_dequant_q5_0(data, n):
    # llama.cpp dequantize_row_q5_0: v = d*(q5-16); qh holds bit 4
    out = []
    for bi in range(n // 32):
        blk = data[bi * 22 : bi * 22 + 22]
        d = _f16(blk[0], blk[1])
        out.extend((q - 16) * d for q in _scalar_q5_codes(blk, 2, 6))
    return np.array(out, np.float32)


def scalar_dequant_q5_1(data, n):
    # llama.cpp dequantize_row_q5_1: v = d*q5 + m
    out = []
    for bi in range(n // 32):
        blk = data[bi * 24 : bi * 24 + 24]
        d = _f16(blk[0], blk[1])
        m = _f16(blk[2], blk[3])
        out.extend(q * d + m for q in _scalar_q5_codes(blk, 4, 8))
    return np.array(out, np.float32)


def scalar_dequant_q4_k(data, n):
    out = []
    for bi in range(n // 256):
        blk = data[bi * 144 : bi * 144 + 144]
        d = _f16(blk[0], blk[1])
        dmin = _f16(blk[2], blk[3])
        scales = blk[4:16]
        qs = blk[16:144]
        is_ = 0
        for j in range(0, 256, 64):
            sc0, m0 = _scalar_get_scale_min_k4(is_, scales)
            sc1, m1 = _scalar_get_scale_min_k4(is_ + 1, scales)
            d1, mv1 = d * sc0, dmin * m0
            d2, mv2 = d * sc1, dmin * m1
            qoff = j // 2
            for loc in range(32):
                out.append(d1 * (qs[qoff + loc] & 0xF) - mv1)
            for loc in range(32):
                out.append(d2 * (qs[qoff + loc] >> 4) - mv2)
            is_ += 2
    return np.array(out, np.float32)


def scalar_dequant_q5_k(data, n):
    out = []
    for bi in range(n // 256):
        blk = data[bi * 176 : bi * 176 + 176]
        d = _f16(blk[0], blk[1])
        dmin = _f16(blk[2], blk[3])
        scales = blk[4:16]
        qh = blk[16:48]
        ql = blk[48:176]
        is_, u1, u2 = 0, 1, 2
        for j in range(0, 256, 64):
            sc0, m0 = _scalar_get_scale_min_k4(is_, scales)
            sc1, m1 = _scalar_get_scale_min_k4(is_ + 1, scales)
            d1, mv1 = d * sc0, dmin * m0
            d2, mv2 = d * sc1, dmin * m1
            qoff = j // 2
            for loc in range(32):
                hi = 16 if qh[loc] & u1 else 0
                out.append(d1 * ((ql[qoff + loc] & 0xF) + hi) - mv1)
            for loc in range(32):
                hi = 16 if qh[loc] & u2 else 0
                out.append(d2 * ((ql[qoff + loc] >> 4) + hi) - mv2)
            is_ += 2
            u1 <<= 2
            u2 <<= 2
    return np.array(out, np.float32)


def scalar_dequant_q6_k(data, n):
    out = []
    for bi in range(n // 256):
        blk = data[bi * 210 : bi * 210 + 210]
        ql = blk[0:128]
        qh = blk[128:192]
        scales = np.frombuffer(bytes(blk[192:208]), np.int8)
        d = _f16(blk[208], blk[209])
        qli, qhi, sci = 0, 0, 0
        for _half in range(2):
            for loc in range(32):
                is_ = loc // 16
                q1 = ((ql[qli + loc] & 0xF) | (((qh[qhi + loc] >> 0) & 3) << 4)) - 32
                out.append(d * scales[sci + is_] * q1)
            for loc in range(32):
                is_ = loc // 16
                q2 = ((ql[qli + loc + 32] & 0xF) | (((qh[qhi + loc] >> 2) & 3) << 4)) - 32
                out.append(d * scales[sci + is_ + 2] * q2)
            for loc in range(32):
                is_ = loc // 16
                q3 = ((ql[qli + loc] >> 4) | (((qh[qhi + loc] >> 4) & 3) << 4)) - 32
                out.append(d * scales[sci + is_ + 4] * q3)
            for loc in range(32):
                is_ = loc // 16
                q4 = ((ql[qli + loc + 32] >> 4) | (((qh[qhi + loc] >> 6) & 3) << 4)) - 32
                out.append(d * scales[sci + is_ + 6] * q4)
            qli += 64
            qhi += 32
            sci += 8
    return np.array(out, np.float32)


def scalar_dequant_q3_k(data, n):
    out = []
    for bi in range(n // 256):
        blk = data[bi * 110 : bi * 110 + 110]
        hmask = blk[0:32]
        qs = blk[32:96]
        sr = blk[96:108]
        d_all = _f16(blk[108], blk[109])
        aux = list(np.frombuffer(bytes(sr), "<u4"))
        KM1, KM2 = 0x03030303, 0x0F0F0F0F
        tmp = int(aux[2])
        a = [0] * 4
        a[2] = ((int(aux[0]) >> 4) & KM2) | (((tmp >> 4) & KM1) << 4)
        a[3] = ((int(aux[1]) >> 4) & KM2) | (((tmp >> 6) & KM1) << 4)
        a[0] = (int(aux[0]) & KM2) | (((tmp >> 0) & KM1) << 4)
        a[1] = (int(aux[1]) & KM2) | (((tmp >> 2) & KM1) << 4)
        scales = np.frombuffer(np.array(a, "<u4").tobytes(), np.int8)
        qidx, is_, m = 0, 0, 1
        for _half in range(2):
            shift = 0
            for _j in range(4):
                dl = d_all * (int(scales[is_]) - 32)
                is_ += 1
                for loc in range(16):
                    q = (qs[qidx + loc] >> shift) & 3
                    h = 0 if (hmask[loc] & m) else -4
                    out.append(dl * (q + h))
                dl = d_all * (int(scales[is_]) - 32)
                is_ += 1
                for loc in range(16):
                    q = (qs[qidx + loc + 16] >> shift) & 3
                    h = 0 if (hmask[loc + 16] & m) else -4
                    out.append(dl * (q + h))
                shift += 2
                m <<= 1
            qidx += 32
    return np.array(out, np.float32)


def scalar_dequant_q2_k(data, n):
    out = []
    for bi in range(n // 256):
        blk = data[bi * 84 : bi * 84 + 84]
        scales = blk[0:16]
        qs = blk[16:80]
        d = _f16(blk[80], blk[81])
        dmin = _f16(blk[82], blk[83])
        is_, qidx = 0, 0
        for _half in range(2):
            shift = 0
            for _j in range(4):
                sc = scales[is_]
                is_ += 1
                dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
                for loc in range(16):
                    out.append(dl * ((qs[qidx + loc] >> shift) & 3) - ml)
                sc = scales[is_]
                is_ += 1
                dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
                for loc in range(16):
                    out.append(dl * ((qs[qidx + loc + 16] >> shift) & 3) - ml)
                shift += 2
            qidx += 32
    return np.array(out, np.float32)


def test_legacy_quantize_roundtrip():
    """The legacy encoders (llama.cpp quantize_row_* semantics) round-
    trip within one quantization step per block (the signed-absmax _0
    variants hit ~1.0 step at the extreme opposite the anchor — that
    is llama.cpp's own behavior; order/packing bugs would show up as
    many steps)."""
    from web_rwkv_gguf_tpu.quant import ggml as G

    rng = np.random.default_rng(11)
    v = (rng.normal(size=(64, 32)) * rng.uniform(0.01, 2.0, (64, 1))).astype(
        np.float32
    )
    flat = v.reshape(-1)
    amax = np.abs(v).max(axis=1)
    rng_b = v.max(axis=1) - v.min(axis=1)
    for qfn, dfn, step in (
        (G.quantize_q4_0, G.dequantize_q4_0, amax / 8.0),
        (G.quantize_q4_1, G.dequantize_q4_1, rng_b / 15.0),
        (G.quantize_q5_0, G.dequantize_q5_0, amax / 16.0),
        (G.quantize_q5_1, G.dequantize_q5_1, rng_b / 31.0),
    ):
        out = dfn(qfn(flat), flat.size).reshape(64, 32)
        err = np.abs(out - v).max(axis=1)
        assert (err <= step * 1.01 + 1e-4).all(), (qfn.__name__, (err / step).max())


CASES = [
    (34, 32, dequantize_q8_0, scalar_dequant_q8_0),
    (18, 32, dequantize_q4_0, scalar_dequant_q4_0),
    (20, 32, dequantize_q4_1, scalar_dequant_q4_1),
    (22, 32, dequantize_q5_0, scalar_dequant_q5_0),
    (24, 32, dequantize_q5_1, scalar_dequant_q5_1),
    (144, 256, dequantize_q4_k, scalar_dequant_q4_k),
    (176, 256, dequantize_q5_k, scalar_dequant_q5_k),
    (210, 256, dequantize_q6_k, scalar_dequant_q6_k),
    (110, 256, dequantize_q3_k, scalar_dequant_q3_k),
    (84, 256, dequantize_q2_k, scalar_dequant_q2_k),
]


@pytest.mark.parametrize("block_bytes,block_elems,vec_fn,scalar_fn", CASES)
def test_dequant_matches_scalar_reference(block_bytes, block_elems, vec_fn, scalar_fn):
    rng = np.random.default_rng(42)
    n_blocks = 4
    raw = rng.integers(0, 256, size=n_blocks * block_bytes, dtype=np.uint8)
    # overwrite the f16 scale fields with sane values to avoid NaN/inf scales
    raw_b = bytearray(raw.tobytes())
    for b in range(n_blocks):
        base = b * block_bytes
        for field_off in (0, 2, 208, 80, 82, 108):
            if field_off + 2 <= block_bytes:
                scale = np.float16(rng.uniform(0.001, 0.1))
                raw_b[base + field_off : base + field_off + 2] = scale.tobytes()
    data = bytes(raw_b)
    n = n_blocks * block_elems
    got = vec_fn(data, n)
    want = scalar_fn(data, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_q8_0_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.normal(size=1024).astype(np.float32)
    data = quantize_q8_0(vals)
    deq = dequantize_q8_0(data, 1024)
    np.testing.assert_allclose(deq, vals, atol=2e-2)


def test_q4_k_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.normal(size=2048).astype(np.float32) * 0.1
    data = quantize_q4_k(vals)
    assert len(data) == (2048 // 256) * 144
    deq = dequantize_q4_k(data, 2048)
    err = np.abs(deq - vals)
    assert err.mean() < 0.01, err.mean()
