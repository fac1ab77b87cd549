"""Pallas kernel parity tests (interpreter mode on CPU) against the XLA
reference implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from web_rwkv_gguf_tpu.ops import wkv as W
from web_rwkv_gguf_tpu.ops.pallas import config as pcfg
from web_rwkv_gguf_tpu.ops.pallas.matmul import quant_matmul
from web_rwkv_gguf_tpu.ops.pallas.wkv7 import wkv7_pallas
from web_rwkv_gguf_tpu.models.matrix import Matrix
from web_rwkv_gguf_tpu.quant.formats import QuantScheme
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q4_k, quantize_q8_0
from web_rwkv_gguf_tpu.quant import repack


@pytest.fixture(autouse=True)
def _interpret_mode():
    pcfg.interpret = True
    yield
    pcfg.interpret = False


def test_wkv7_pallas_matches_xla():
    rng = np.random.default_rng(0)
    B, T, H, K = 2, 5, 3, 8
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    state = f(B, H, K, K)
    r, k, v = f(B, T, H, K), f(B, T, H, K), f(B, T, H, K)
    w = jnp.asarray(
        np.exp(-0.5 * np.abs(rng.normal(size=(B, T, H, K)))).astype(np.float32)
    )
    kk = f(B, T, H, K)
    a, b = -kk, kk * 0.5
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 1], [1, 1, 1, 0, 0]], bool))

    y_ref, s_ref = W.wkv7(state, r, w, k, v, a, b, mask)
    y_pl, s_pl = wkv7_pallas(state, r, w, k, v, a, b, mask)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), rtol=1e-5, atol=1e-5)


def _check_matmul(mat: Matrix, x, rtol=2e-2, atol=2e-2):
    m, k = mat.shape
    want = np.asarray(
        jnp.einsum("nk,mk->nm", x.astype(jnp.bfloat16), mat.dequantize(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    )
    got = np.asarray(quant_matmul(x, mat.kind, mat.arrays, m, k, block_m=64))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


def test_quant_matmul_q4k():
    rng = np.random.default_rng(1)
    M, K, N = 128, 256, 4
    w = (rng.normal(size=(M, K)) * 0.1).astype(np.float32)
    raw = np.frombuffer(quantize_q4_k(w.reshape(-1)), np.uint8)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (M, K))
    assert mat.kind == "qk"
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    _check_matmul(mat, x)


def test_quant_matmul_q8_0():
    rng = np.random.default_rng(2)
    M, K, N = 64, 128, 2
    w = (rng.normal(size=(M, K)) * 0.1).astype(np.float32)
    raw = np.frombuffer(quantize_q8_0(w.reshape(-1)), np.uint8)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q8_0, raw, (M, K))
    assert mat.kind == "qk_nomin"
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    _check_matmul(mat, x)


def test_quant_matmul_int8():
    rng = np.random.default_rng(3)
    M, K, N = 64, 256, 2
    w = (rng.normal(size=(M, K)) * 0.1).astype(np.float16)
    mat = Matrix.from_f16(w, QuantScheme.INT8)
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    _check_matmul(mat, x)


def test_q4k_repack_dequant_matches_block_dequant():
    """Matrix.dequantize on the repacked layout must equal the direct
    block dequantizer exactly."""
    from web_rwkv_gguf_tpu.quant.ggml import dequantize_q4_k

    rng = np.random.default_rng(4)
    M, K = 8, 512
    w = (rng.normal(size=(M, K)) * 0.1).astype(np.float32)
    raw = np.frombuffer(quantize_q4_k(w.reshape(-1)), np.uint8)
    want = dequantize_q4_k(raw, M * K).reshape(M, K)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (M, K))
    got = np.asarray(mat.dequantize(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
