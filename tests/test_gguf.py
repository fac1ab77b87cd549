"""GGUF reader tests: writer→reader round-trip, name mapping, fused-lerp
virtual slices, r_k reshape, quantized tensor paths.

Mirrors the intent of the reference's inline gguf tests + the
examples/test_gguf_shapes.rs integration check.
"""

import numpy as np
import pytest

from web_rwkv_gguf_tpu.gguf import GgufFile, GgufWriter, gguf_to_model_name
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, dequantize_q4_k


def test_name_mapping():
    assert gguf_to_model_name("token_embd.weight") == "emb.weight"
    assert gguf_to_model_name("output_norm.weight") == "ln_out.weight"
    assert gguf_to_model_name("output.weight") == "head.weight"
    assert gguf_to_model_name("token_embd_norm.bias") == "blocks.0.ln0.bias"
    assert gguf_to_model_name("blk.3.attn_norm.weight") == "blocks.3.ln1.weight"
    assert gguf_to_model_name("blk.12.ffn_norm.bias") == "blocks.12.ln2.bias"
    assert (
        gguf_to_model_name("blk.0.time_mix_lerp_fused.weight") == "blocks.0.att.time_maa"
    )
    assert gguf_to_model_name("blk.1.time_mix_w0.weight") == "blocks.1.att.w0"
    assert gguf_to_model_name("blk.1.att_x_r") == "blocks.1.att.x_r"
    assert gguf_to_model_name("blk.1.attn_x_r") == "blocks.1.att.x_r"
    assert gguf_to_model_name("blk.2.channel_mix_lerp_k.weight") == "blocks.2.ffn.x_k"
    assert gguf_to_model_name("blk.2.time_mix_r_k.weight") == "blocks.2.att.r_k"
    assert gguf_to_model_name("blk.2.bogus") is None
    assert gguf_to_model_name("nonsense") is None


def test_roundtrip_metadata_and_tensors():
    w = GgufWriter()
    w.add_metadata("general.architecture", "rwkv7")
    w.add_metadata("rwkv7.wkv.head_size", 4)
    w.add_metadata("some.float", 1.5)
    w.add_metadata("some.bool", True)
    w.add_metadata("some.list", [1, 2, 3])
    w.add_metadata("some.strlist", ["a", "bb"])

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(10, 8)).astype(np.float32)
    mat = rng.normal(size=(16, 8)).astype(np.float16)
    vec = rng.normal(size=8).astype(np.float32)
    w.add_tensor("token_embd.weight", emb)
    w.add_tensor("blk.0.attn_k.weight", mat)
    w.add_tensor("blk.0.attn_norm.weight", vec)

    f = GgufFile(w.tobytes())
    assert f.version == 3
    assert f.metadata["general.architecture"] == "rwkv7"
    assert f.metadata["rwkv7.wkv.head_size"] == 4
    assert f.metadata["some.float"] == 1.5
    assert f.metadata["some.bool"] is True
    assert f.metadata["some.list"] == [1, 2, 3]
    assert f.metadata["some.strlist"] == ["a", "bb"]

    # shapes come back in model convention
    assert f.shape("emb.weight") == (10, 8)
    assert f.shape("blocks.0.att.key.weight") == (16, 8)
    assert f.shape("blocks.0.ln1.weight") == (8,)

    np.testing.assert_array_equal(f.tensor("emb.weight", np.float32), emb)
    np.testing.assert_array_equal(f.tensor("blocks.0.att.key.weight", np.float16), mat)
    np.testing.assert_array_equal(f.tensor("blk.0.attn_k.weight", np.float16), mat)
    np.testing.assert_array_equal(f.tensor("blocks.0.ln1.weight", np.float32), vec)


def test_fused_lerp_slices():
    w = GgufWriter()
    emb_size = 6
    fused = np.arange(6 * emb_size, dtype=np.float32).reshape(6, emb_size)
    # on-disk GGUF dims [emb, 1, 1, 6]: each of the six vectors contiguous
    w.add_raw_tensor(
        "blk.0.time_mix_lerp_fused.weight", (emb_size, 1, 1, 6), GgmlDType.F32, fused.tobytes()
    )
    f = GgufFile(w.tobytes())

    names = f.names()
    for s in ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g"):
        assert f"blocks.0.att.{s}" in names, names
        assert f.contains(f"blocks.0.att.{s}")
    assert f.shape("blocks.0.att.x_w") == (emb_size,)
    for i, s in enumerate(("x_r", "x_w", "x_k", "x_v", "x_a", "x_g")):
        np.testing.assert_array_equal(
            f.tensor(f"blocks.0.att.{s}", np.float32), fused[i]
        )
    # virtual tensors have no direct-quantized path
    assert f.quantized_tensor("blocks.0.att.x_r") is None


def test_r_k_reshape_from_metadata():
    w = GgufWriter()
    w.add_metadata("rwkv7.wkv.head_size", 4)
    r_k = np.arange(12, dtype=np.float32)
    w.add_raw_tensor("blk.0.time_mix_r_k.weight", (12,), GgmlDType.F32, r_k.tobytes())
    f = GgufFile(w.tobytes())
    assert f.shape("blocks.0.att.r_k") == (3, 4)
    np.testing.assert_array_equal(
        f.tensor("blocks.0.att.r_k", np.float32), r_k.reshape(3, 4)
    )


def test_quantized_tensor_paths():
    rng = np.random.default_rng(1)
    mat = (rng.normal(size=(8, 256)) * 0.05).astype(np.float32)
    w = GgufWriter()
    w.add_tensor("blk.0.attn_k.weight", mat, quantize=GgmlDType.Q4_K)
    f = GgufFile(w.tobytes())

    # dequant path: matches dequantizing the raw blocks directly
    qt = f.quantized_tensor("blocks.0.att.key.weight")
    assert qt is not None
    dtype, raw = qt
    assert dtype == GgmlDType.Q4_K
    want = dequantize_q4_k(raw, mat.size).reshape(8, 256).astype(np.float16)
    got = f.tensor("blocks.0.att.key.weight", np.float16)
    np.testing.assert_array_equal(got, want)
    # and is a reasonable approximation of the original values
    assert np.abs(got.astype(np.float32) - mat).mean() < 0.01

    f2 = GgufFile(w.tobytes(), allow_quantized_direct=False)
    assert f2.quantized_tensor("blocks.0.att.key.weight") is None


def test_alignment_and_offsets():
    # several tensors whose sizes are not multiples of the alignment
    w = GgufWriter()
    a = np.arange(3, dtype=np.float32)
    b = np.arange(5, dtype=np.float16)
    c = np.arange(7, dtype=np.float32)
    w.add_tensor("a", a)
    w.add_tensor("b", b)
    w.add_tensor("c", c)
    f = GgufFile(w.tobytes())
    np.testing.assert_array_equal(f.tensor("a", np.float32), a)
    np.testing.assert_array_equal(f.tensor("b", np.float16), b)
    np.testing.assert_array_equal(f.tensor("c", np.float32), c)
    for info in f.tensors.values():
        assert info.offset % 32 == 0


def test_bf16_tensor_roundtrip():
    import ml_dtypes

    w = GgufWriter()
    arr = np.arange(12, dtype=np.float32).reshape(3, 4).astype(ml_dtypes.bfloat16)
    w.add_raw_tensor("bf", (4, 3), GgmlDType.BF16, arr.tobytes())
    f = GgufFile(w.tobytes())
    got = f.tensor("bf", np.float32)
    np.testing.assert_array_equal(got, np.arange(12, dtype=np.float32).reshape(3, 4))
