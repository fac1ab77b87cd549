"""Native C++ dequant/repack parity vs the numpy reference implementations."""

import numpy as np
import pytest

from web_rwkv_gguf_tpu import native
from web_rwkv_gguf_tpu.quant import ggml


requires_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


def _random_blocks(block_bytes, n_blocks=64, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, size=n_blocks * block_bytes, dtype=np.uint8)
    b = bytearray(raw.tobytes())
    # sane f16 scale fields
    for blk in range(n_blocks):
        base = blk * block_bytes
        for off in (0, 2, 208, 80, 82, 108):
            if off + 2 <= block_bytes:
                b[base + off : base + off + 2] = np.float16(
                    rng.uniform(0.001, 0.1)
                ).tobytes()
    return bytes(b)


@requires_native
@pytest.mark.parametrize(
    "kind,block_bytes,numpy_fn",
    [
        ("q8_0", 34, ggml.dequantize_q8_0),
        ("q4_0", 18, ggml.dequantize_q4_0),
        ("q4_1", 20, ggml.dequantize_q4_1),
        ("q5_0", 22, ggml.dequantize_q5_0),
        ("q5_1", 24, ggml.dequantize_q5_1),
        ("q4_k", 144, ggml.dequantize_q4_k),
        ("q5_k", 176, ggml.dequantize_q5_k),
        ("q6_k", 210, ggml.dequantize_q6_k),
        ("q3_k", 110, ggml.dequantize_q3_k),
        ("q2_k", 84, ggml.dequantize_q2_k),
    ],
)
def test_native_dequant_matches_numpy(kind, block_bytes, numpy_fn):
    elems = 32 if block_bytes <= 34 else 256
    data = _random_blocks(block_bytes)
    n = (len(data) // block_bytes) * elems
    got = native.dequantize(kind, data, n)
    want = numpy_fn(data, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@requires_native
@pytest.mark.parametrize("M,K", [(16, 512), (8, 2688), (32, 768)])
def test_native_repack_q4k_matches_numpy(M, K):
    import os

    rng = np.random.default_rng(1)
    # K=2688 is not a multiple of 256: super-blocks straddle rows
    w = (rng.normal(size=(M, K)) * 0.1).astype(np.float32)
    raw = np.frombuffer(ggml.quantize_q4_k(w.reshape(-1)), np.uint8)

    got = native.repack_q4_k(raw, M, K)
    assert got is not None
    # numpy path (force fallback)
    os.environ["RWKV_TPU_NO_NATIVE"] = "1"
    try:
        native._tried, native._lib = True, None
        from web_rwkv_gguf_tpu.quant import repack

        want = repack.repack_q4_k(raw, M, K)
    finally:
        del os.environ["RWKV_TPU_NO_NATIVE"]
        native._tried = False
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(g, w_)


@requires_native
def test_native_tokenizer_matches_python():
    from web_rwkv_gguf_tpu.utils.tokenizer import Tokenizer

    # vocab with multi-byte tokens, overlapping prefixes, and all single
    # bytes (so any input encodes); mirror of the reference's world-vocab
    # shape (ref: src/tokenizer.rs)
    vocab = {str(i): [i] for i in range(256)}
    extra = ["he", "hel", "hello", "hello ", "wor", "world", "ab", "abc",
             "é", "你好", "  ", "the ", "ing", "tion"]
    for j, s in enumerate(extra):
        vocab[str(256 + j)] = s
    tok = Tokenizer(vocab)
    assert tok._native is not None

    rng = np.random.default_rng(7)
    cases = [
        "",
        "hello world",
        "the theing tiontion hello  abc ab",
        "你好, éléphant!",
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
    ]
    for case in cases:
        data = case.encode() if isinstance(case, str) else case
        assert tok._native.encode(data).tolist() == tok._encode_py(data)


@requires_native
def test_native_tokenizer_error_offset_matches_python():
    from web_rwkv_gguf_tpu.utils.tokenizer import Tokenizer, TokenizerError

    tok = Tokenizer({"0": "a", "1": "ab"})
    assert tok._native is not None
    with pytest.raises(TokenizerError, match="offset 2"):
        tok.encode("abx")
    with pytest.raises(ValueError, match="offset 2"):
        tok._encode_py(b"abx")
