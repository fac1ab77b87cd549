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
    # parity tests pin the double-bf16 (precise) wide path so tolerances
    # stay at rounding scale; the plain-bf16 production default is
    # covered by test_wide_plain_precision_bound
    prec = pcfg.wide_precise
    pcfg.wide_precise = True
    yield
    pcfg.interpret = False
    pcfg.wide_precise = prec



def _f32_operand_arrays(kind, arrays):
    """Drop every native scale-factor key, restoring the f32 scale
    products first (slimmed direct loads no longer store them) so the
    stripped dict drives the f32-operand kernels."""
    from web_rwkv_gguf_tpu.models.matrix import scale_products

    out = {kk: a for kk, a in arrays.items()
           if kk not in ("stq", "mnq", "sd", "sdm", "sc6", "mn6", "d8",
                         "dm8", "scq", "sdn", "q6s", "q6d")}
    if "scales" not in out:
        sp, mnp = scale_products(kind, arrays)
        out["scales"] = sp
        if mnp is not None:
            out["mins"] = mnp
    return out


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
    # y at padded positions is don't-care (the kernel pre-masks its inputs
    # instead of selecting state post-update; model-level padding
    # invariance is pinned by test_forward.py): compare valid rows only
    valid = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(y_pl) * valid, np.asarray(y_ref) * valid, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), rtol=1e-5, atol=1e-5)


def _check_matmul(mat: Matrix, x, rtol=2e-2):
    # reference: exact f32 product on bf16-rounded inputs (the kernels keep
    # scales/offsets in f32, so the bf16-dense product is not ground truth);
    # atol scaled by |y| covers bf16-contraction cancellation on small outputs
    m, k = mat.shape
    want = np.asarray(
        jnp.einsum("nk,mk->nm", x.astype(jnp.bfloat16).astype(jnp.float32),
                   mat.dequantize(jnp.float32),
                   preferred_element_type=jnp.float32)
    )
    got = np.asarray(quant_matmul(x, mat.kind, mat.arrays, m, k, block_m=64))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * np.abs(want).max())


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


@pytest.mark.parametrize("N", [1, 16])  # 1 → bitcast gemv path, 16 → slab path
def test_quant_matmul_both_paths(N):
    rng = np.random.default_rng(9)
    M, K = 128, 512
    w = (rng.normal(size=(M, K)) * 0.1).astype(np.float32)
    raw = np.frombuffer(quantize_q4_k(w.reshape(-1)), np.uint8)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (M, K))
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    _check_matmul(mat, x)
    raw8 = np.frombuffer(quantize_q8_0(w.reshape(-1)), np.uint8)
    mat8 = Matrix.from_gguf_blocks(GgmlDType.Q8_0, raw8, (M, K))
    _check_matmul(mat8, x)


@pytest.mark.parametrize("scheme", [QuantScheme.NF4, QuantScheme.SF4])
@pytest.mark.parametrize("N", [1, 16])  # gemv (LUT select-tree) and slab paths
def test_quant_matmul_nf4(scheme, N):
    """Fused NF4/SF4 matmul (in-kernel 16-entry LUT) vs dense dequant —
    the reference's matmul_vec_nf4 equivalent (ops.rs:892)."""
    rng = np.random.default_rng(11)
    M, K = 128, 512
    w = (rng.normal(size=(M, K)) * 0.1).astype(np.float16)
    mat = Matrix.from_f16(w, scheme)
    assert mat.kind == "nf4" and "st" in mat.arrays
    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    _check_matmul(mat, x)


def test_quant_matmul_q5k_gemv():
    """qk_b (byte codes + mins) through the gemv path."""
    from web_rwkv_gguf_tpu.quant import ggml as G

    rng = np.random.default_rng(10)
    M, K = 8, 512
    n_blocks = M * K // G.GGML_BLOCK_SIZES[GgmlDType.Q5_K]
    raw = bytearray(rng.integers(0, 256, n_blocks * 176, dtype=np.uint8).tobytes())
    for b in range(n_blocks):
        for off in (0, 2):
            raw[b * 176 + off : b * 176 + off + 2] = np.float16(
                rng.uniform(0.001, 0.05)
            ).tobytes()
    mat = Matrix.from_gguf_blocks(GgmlDType.Q5_K, bytes(raw), (M, K))
    assert mat.kind == "qk_b"
    x = jnp.asarray(rng.normal(size=(2, K)).astype(np.float32))
    y_got = np.asarray(quant_matmul(x, mat.kind, mat.arrays, M, K))
    y_want = np.asarray(
        jnp.einsum("nk,mk->nm", x.astype(jnp.bfloat16).astype(jnp.float32),
                   mat.dequantize(jnp.float32), preferred_element_type=jnp.float32)
    )
    tol = 2e-2 * np.abs(y_want).max()
    np.testing.assert_allclose(y_got, y_want, rtol=2e-2, atol=tol)


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


def test_wkv6_pallas_matches_xla():
    from web_rwkv_gguf_tpu.ops.pallas.wkv456 import wkv5_pallas, wkv6_pallas

    rng = np.random.default_rng(5)
    B, T, H, K = 2, 6, 2, 8
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    state = f(B, H, K, K)
    r, k, v = f(B, T, H, K), f(B, T, H, K), f(B, T, H, K)
    u = f(H, K)
    w6 = jnp.asarray(np.exp(-np.exp(rng.normal(size=(B, T, H, K)))).astype(np.float32))
    mask = jnp.asarray(np.array([[1] * 6, [1, 1, 1, 1, 0, 0]], bool))

    valid = np.asarray(mask)[:, :, None, None]  # padded y rows: don't-care
    y1, s1 = W.wkv6(state, r, k, v, u, w6, mask)
    y2, s2 = wkv6_pallas(state, r, k, v, u, w6, mask)
    np.testing.assert_allclose(np.asarray(y2) * valid, np.asarray(y1) * valid,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5, atol=1e-5)

    w5 = jnp.asarray(np.exp(-np.exp(rng.normal(size=(H, K)))).astype(np.float32))
    y1, s1 = W.wkv5(state, r, k, v, u, w5, mask)
    y2, s2 = wkv5_pallas(state, r, k, v, u, w5, mask)
    np.testing.assert_allclose(np.asarray(y2) * valid, np.asarray(y1) * valid,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5, atol=1e-5)


def test_wkv4_pallas_matches_xla():
    from web_rwkv_gguf_tpu.ops.pallas.wkv456 import wkv4_pallas

    rng = np.random.default_rng(6)
    B, T, C = 2, 6, 16
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    k, v, r = f(B, T, C), f(B, T, C), f(B, T, C)
    u = f(C)
    w = jnp.asarray(-np.exp(rng.normal(size=C)).astype(np.float32))
    state = jnp.stack(
        [jnp.zeros((B, C)), jnp.zeros((B, C)),
         jnp.full((B, C), W.F32_MIN)], axis=-1,
    )
    mask = jnp.asarray(np.array([[1] * 6, [1, 1, 1, 0, 0, 0]], bool))
    y1, s1 = W.wkv4(state, k, v, r, u, w, mask)
    y2, s2 = wkv4_pallas(state, k, v, r, u, w, mask)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-4, atol=1e-4)


def test_wkv7_chunked_matches_xla():
    """Chunk-parallel (UT-transform) WKV7 must match the sequential scan
    at all valid positions, across chunk boundaries and with padding."""
    import functools
    from web_rwkv_gguf_tpu.ops.wkv_chunked import wkv7_chunked

    rng = np.random.default_rng(9)
    B, T, H, K = 2, 37, 3, 8
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    state = f(B, H, K, K)
    r, k, v = f(B, T, H, K), f(B, T, H, K), f(B, T, H, K)
    w = jnp.asarray(
        np.exp(-0.606531 / (1 + np.exp(-rng.normal(size=(B, T, H, K))))).astype(np.float32)
    )
    kk_ = rng.normal(size=(B, T, H, K)).astype(np.float32)
    kk_ = kk_ / (np.linalg.norm(kk_, axis=-1, keepdims=True) + 1e-9)
    a, b = jnp.asarray(-kk_), jnp.asarray(kk_ * 0.7)
    mask_np = np.ones((B, T), bool)
    mask_np[1, 30:] = False
    mask = jnp.asarray(mask_np)

    y1, s1 = W.wkv7(state, r, w, k, v, a, b, mask)
    for chunk in (8, 16, 64):
        y2, s2 = wkv7_chunked(state, r, w, k, v, a, b, mask, chunk=chunk)
        d = np.abs(np.asarray(y1) - np.asarray(y2)) * mask_np[:, :, None, None]
        assert d.max() < 1e-5, (chunk, d.max())
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5, atol=1e-5)


def test_wkv6_chunked_matches_xla():
    from web_rwkv_gguf_tpu.ops.wkv_chunked import wkv6_chunked

    rng = np.random.default_rng(10)
    B, T, H, K = 2, 21, 3, 8
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    state = f(B, H, K, K)
    r, k, v = f(B, T, H, K), f(B, T, H, K), f(B, T, H, K)
    u = f(H, K)
    w = jnp.asarray(np.exp(-np.exp(rng.normal(size=(B, T, H, K)))).astype(np.float32))
    mask_np = np.ones((B, T), bool)
    mask_np[1, 15:] = False
    mask = jnp.asarray(mask_np)
    y1, s1 = W.wkv6(state, r, k, v, u, w, mask)
    for chunk in (8, 32):
        y2, s2 = wkv6_chunked(state, r, k, v, u, w, mask, chunk=chunk)
        d = np.abs(np.asarray(y1) - np.asarray(y2)) * mask_np[:, :, None, None]
        assert d.max() < 1e-4, (chunk, d.max())
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "dtype,block_bytes,dequant_fn,f16_offs",
    [
        (GgmlDType.Q5_K, 176, "dequantize_q5_k", (0, 2)),
        (GgmlDType.Q6_K, 210, "dequantize_q6_k", (208,)),
        (GgmlDType.Q4_0, 18, "dequantize_q4_0", (0,)),
        (GgmlDType.Q4_1, 20, "dequantize_q4_1", (0, 2)),
        (GgmlDType.Q5_0, 22, "dequantize_q5_0", (0,)),
        (GgmlDType.Q5_1, 24, "dequantize_q5_1", (0, 2)),
        (GgmlDType.Q3_K, 110, "dequantize_q3_k", (108,)),
        (GgmlDType.Q2_K, 84, "dequantize_q2_k", (80, 82)),
    ],
)
def test_repack_matches_block_dequant(dtype, block_bytes, dequant_fn, f16_offs):
    """Repacked Matrix must dequantize to exactly the block dequantizer's
    values (random raw blocks with sane scales) — incl. the Q2_K/Q3_K
    direct path the reference only supports via dequant-to-F16."""
    from web_rwkv_gguf_tpu.quant import ggml as G

    rng = np.random.default_rng(7)
    M, K = 8, 512
    n_blocks = M * K // G.GGML_BLOCK_SIZES[dtype]
    raw = bytearray(rng.integers(0, 256, n_blocks * block_bytes, dtype=np.uint8).tobytes())
    for b in range(n_blocks):
        base = b * block_bytes
        for off in f16_offs:
            raw[base + off : base + off + 2] = np.float16(
                rng.uniform(0.001, 0.05)
            ).tobytes()
    raw = bytes(raw)
    want = getattr(G, dequant_fn)(raw, M * K).reshape(M, K)
    mat = Matrix.from_gguf_blocks(dtype, np.frombuffer(raw, np.uint8), (M, K))
    got = np.asarray(mat.dequantize(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # and the fused kernel agrees (interpret mode); reference is the exact
    # f32 product on bf16-rounded inputs — the kernels keep scales in f32,
    # so the rounded-bf16-dense product is NOT the ground truth
    x = jnp.asarray(rng.normal(size=(2, K)).astype(np.float32))
    y_got = np.asarray(quant_matmul(x, mat.kind, mat.arrays, M, K, block_m=8))
    y_want = np.asarray(
        jnp.einsum("nk,mk->nm", x.astype(jnp.bfloat16).astype(jnp.float32),
                   mat.dequantize(jnp.float32),
                   preferred_element_type=jnp.float32)
    )
    tol = 2e-2 * np.abs(y_want).max()
    np.testing.assert_allclose(y_got, y_want, rtol=2e-2, atol=tol)


def test_att_core7_step_matches_composition():
    """Fused decode attention core (raw inputs: decay/iclr pre-activation,
    key pre-control) == the XLA composition act_w + l2norm + control-k +
    wkv7_step + group_norm + bonus + gate on active lanes (masked lanes
    keep state; their dead y output is unspecified, as in the XLA step)."""
    from web_rwkv_gguf_tpu.ops import basic as B_
    from web_rwkv_gguf_tpu.ops.pallas.wkv7 import att_core7_step

    rng = np.random.default_rng(1)
    B, H, K, V = 3, 4, 16, 16
    eps, l2_eps = 64e-5, 1e-12
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    S = f(B, H, K, V)
    r, k_raw, w_raw, a_raw = f(B, H, K), f(B, H, K), f(B, H, K), f(B, H, K)
    v = f(B, H, V)
    g = jax.nn.sigmoid(f(B, H, V))
    k_k, k_a = f(H, K), f(H, K)
    gnw, gnb = 1 + 0.1 * f(H, V), 0.1 * f(H, V)
    rk = f(H, K)
    mask = jnp.asarray([True, True, False])

    y, s1 = att_core7_step(S, r, w_raw, k_raw, v, a_raw, g, k_k, k_a,
                           gnw, gnb, rk, mask, eps, l2_eps)

    # XLA composition (the non-fused path's math)
    w = W.wkv7_act_w(w_raw)
    a = jax.nn.sigmoid(a_raw)
    kk = B_.l2_normalize(k_raw * k_k[None], l2_eps)
    k = k_raw * (1.0 + (a - 1.0) * k_a[None])
    ah, bh = -kk, kk * a
    m2 = mask[:, None]
    y0, s_ref = W.wkv7_step(
        S, r[:, None], w[:, None], k[:, None], v[:, None], ah[:, None],
        bh[:, None], m2,
    )
    yr = B_.group_norm(y0.reshape(B, 1, H * V), gnw.reshape(-1),
                       gnb.reshape(-1), H, eps)
    yr = yr + W.wkv7_bonus(r[:, None], k[:, None], v[:, None], rk
                           ).reshape(B, 1, H * V)
    yr = (yr * g.reshape(B, 1, H * V)).reshape(B, H, V)

    np.testing.assert_allclose(np.asarray(s1), np.asarray(s_ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(y)[:2], np.asarray(yr)[:2], atol=2e-5
    )


def test_forward_decode_step_uses_fused_core_consistently():
    """T=1 B=1 decode step (fused core path) matches the same step with
    the fused core disabled."""
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state
    from web_rwkv_gguf_tpu.models import forward as fwd
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=32, head_size=8, n_vocab=64, lora_w=8, lora_a=8,
        lora_g=8, lora_v=8, quant="q4k",  # fused core engages on quantized layers
    )
    state = init_state(info, 1)
    toks = jnp.asarray([[5]], jnp.int32)
    lens = jnp.asarray([1], jnp.int32)

    x_fused, st_fused = forward_chunk(info, params, state, toks, lens)

    orig = fwd._fused_att_core_ok
    fwd._fused_att_core_ok = lambda *a, **k: False
    try:
        x_ref, st_ref = forward_chunk(info, params, state, toks, lens)
    finally:
        fwd._fused_att_core_ok = orig

    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_ref), atol=2e-5)
    for k in st_fused:
        np.testing.assert_allclose(
            np.asarray(st_fused[k]), np.asarray(st_ref[k]), atol=2e-5
        )


def test_pad_matrix_rows_equivalence():
    """loader.pad_matrix_rows: padded rows dequantize to exactly 0, the
    kernel output's real columns are unchanged, and small / already
    aligned matrices pass through untouched."""
    from web_rwkv_gguf_tpu.models.loader import pad_matrix_rows

    rng = np.random.default_rng(3)
    m, k = 1664, 256  # 1664 = 3.25 * 512 -> padded to 2048
    w = (rng.standard_normal((m, k)) * 0.05).astype(np.float32)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, quantize_q4_k(w), (m, k))
    padded = pad_matrix_rows(mat)
    assert padded.dims() == (2048, k)
    wd = np.asarray(padded.dequantize(jnp.float32))
    assert (wd[m:] == 0).all()
    np.testing.assert_array_equal(wd[:m], np.asarray(mat.dequantize(jnp.float32)))

    x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)
    y0 = np.asarray(quant_matmul(x, mat.kind, mat.arrays, m, k))
    y1 = np.asarray(quant_matmul(x, padded.kind, padded.arrays, 2048, k))
    np.testing.assert_allclose(y1[:, :m], y0, rtol=1e-5, atol=1e-5)
    assert np.abs(y1[:, m:]).max() == 0.0

    small = Matrix.from_gguf_blocks(
        GgmlDType.Q4_K, quantize_q4_k(w[:768]), (768, k))
    assert pad_matrix_rows(small) is small  # m <= 2*512: whole-M is fine


def test_padded_ffn_key_forward_matches():
    """A tile-padded ffn key (loader.pad_matrix_rows, an opt-in utility —
    measured net-negative as a default, see CLAUDE.md) must not change
    the forward output: forward slices kf back to Wv's width."""
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, unroll_params
    from web_rwkv_gguf_tpu.models.loader import pad_matrix_rows
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=128, head_size=32, n_vocab=64, n_hidden=1152,
        lora_w=8, lora_a=8, lora_g=8, lora_v=8, quant="q4k",
    )
    state = init_state(info, 1)
    toks = jnp.asarray([[3]], jnp.int32)
    lens = jnp.asarray([1], jnp.int32)
    x0, st0 = forward_chunk(info, params, state, toks, lens)

    up = unroll_params(params)
    for blk in up["blocks"]:
        blk["ffn"]["Wk"] = pad_matrix_rows(blk["ffn"]["Wk"])
    assert up["blocks"][0]["ffn"]["Wk"].dims() == (1536, 128)
    x1, st1 = forward_chunk(info, up, state, toks, lens)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-2)
    for key in st0:
        np.testing.assert_allclose(
            np.asarray(st1[key]), np.asarray(st0[key]), atol=1e-2
        )


def test_quant_gemv_grouped_matches_individual():
    """Grouped r/k/v gemv (one launch, per-grid-step input selection) ==
    three individual matmuls."""
    from web_rwkv_gguf_tpu.models.loader import group_gemv_matrices
    from web_rwkv_gguf_tpu.ops.pallas.matmul import quant_gemv_grouped

    rng = np.random.default_rng(5)
    m, k = 128, 256
    mats, xs, want = [], [], []
    for i in range(3):
        w = (rng.standard_normal((m, k)) * 0.05).astype(np.float32)
        mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, quantize_q4_k(w), (m, k))
        x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)
        mats.append(mat)
        xs.append(x)
        want.append(np.asarray(quant_matmul(x, mat.kind, mat.arrays, m, k)))
    grouped = group_gemv_matrices(mats)
    assert grouped is not None
    y = np.asarray(quant_gemv_grouped(jnp.stack(xs)[:, 0][:, None],
                                      "qk", grouped, m, k))
    for i in range(3):
        np.testing.assert_allclose(y[i], want[i], rtol=1e-5, atol=1e-5)


def test_unrolled_grouped_rkv_forward_matches_stacked():
    """unroll_params adds the grouped r/k/v arrays; the decode step must
    match the stacked (ungrouped) forward."""
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, unroll_params
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=128, head_size=32, n_vocab=64, lora_w=8, lora_a=8,
        lora_g=8, lora_v=8, quant="q4k",
    )
    state = init_state(info, 1)
    toks = jnp.asarray([[3]], jnp.int32)
    lens = jnp.asarray([1], jnp.int32)
    x0, st0 = forward_chunk(info, params, state, toks, lens)

    # NOTE tolerance: in interpret mode the stacked baseline routes
    # projections through the XLA group-factored matmul (bf16 code
    # contraction) while the unrolled path runs the exact-f32-scale
    # grouped Pallas kernel — a few-1e-3 legitimate rounding gap. The
    # test guards wiring/layout (which would produce O(1) garbage).
    up = unroll_params(params)
    assert "Wrkv_g" in up["blocks"][0]["att"]
    x1, st1 = forward_chunk(info, up, state, toks, lens)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-2)
    for key in st0:
        np.testing.assert_allclose(
            np.asarray(st1[key]), np.asarray(st0[key]), atol=1e-2
        )


@pytest.mark.parametrize("quant,B,C", [
    ("q4k", 1, 64), ("q8_0", 1, 64),  # group-expanded gemv (narrow batch)
    ("q4k", 2, 64),  # n=2 narrow: the selection-dot group_expand form
    ("q4k", 5, 64), ("q8_0", 5, 64),  # `wide` gemv (scales into codes)
    # C=256: every k % 256 == 0 -> the NATIVE scale-factor operands
    # (6-bit codes + super-scales, formed into st/off in-kernel) apply to
    # every q4k matrix; at C=64 only ffn.Wv (k=n_hidden=256) is native
    ("q4k", 1, 256), ("q4k", 5, 256),
    ("q4k", 16, 64),  # MAX_SCAN_BATCH: the full wide path at B=16
    (None, 1, 64), (None, 5, 64),  # dense bf16: plain-dot branch
])
def test_layer_scan7_matches_forward(quant, B, C):
    """Whole-stack decode kernel (one pallas_call, grid over layers) vs
    the composed forward_chunk path, over several carried decode steps —
    both nibble-split (Q4_K) and signed-byte (Q8_0) code kinds, both
    in-kernel gemv strategies (batch 5 exercises the n>2 vectorized
    NARROW reduction; batch 16 > config.scan_wide_batch exercises `wide`),
    and both scale-operand forms (f32 products / native factors)."""
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state
    from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, L2_EPS, embed_tokens
    from web_rwkv_gguf_tpu.ops.pallas.layer7 import layer_scan7, prep_decode7
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=3, n_emb=C, head_size=16, n_vocab=64, n_hidden=256,
        lora_w=8, lora_a=8, lora_g=16, lora_v=8, quant=quant,
    )
    mega = prep_decode7(params, info)
    assert mega is not None
    mega_f32 = None
    if quant == "q4k" and C == 256:
        assert mega.static["native_tags"] == ("qk",) * 4
        # strip the native factors -> the f32 product-operand kernel; the
        # native path must match it ~exactly (same math, FMA rounding)
        def _strip(tree):
            if isinstance(tree, Matrix):
                from web_rwkv_gguf_tpu.models.matrix import scale_products

                # slimmed direct loads drop the f32 products; restore
                # them (bit-exact derivation) before removing the native
                # factors so _prep_matrix takes the f32-operand form
                arrays = {
                    kk: v for kk, v in tree.arrays.items()
                    if kk not in ("sc6", "mn6", "d8", "dm8",
                                  "stq", "mnq", "sd", "sdm")
                }
                if "scales" not in arrays:
                    sp, mnp = scale_products(tree.kind, tree.arrays)
                    arrays["scales"] = sp
                    if mnp is not None:
                        arrays["mins"] = mnp
                return Matrix(tree.kind, tree.shape, arrays)
            if isinstance(tree, dict):
                return {kk: _strip(v) for kk, v in tree.items()}
            return tree
        pf = dict(params)
        pf["blocks"] = _strip(params["blocks"])
        mega_f32 = prep_decode7(pf, info)
        assert mega_f32.static["native_tags"] == (False,) * 4

    s_ref = init_state(info, B)
    s_pl = init_state(info, B)
    s_f32 = init_state(info, B)
    lens = jnp.ones((B,), jnp.int32)
    mask = jnp.ones((B,), jnp.float32)
    # the kernel contracts in a different order (and the wide path
    # applies scales pre-dot in f32) vs the composed path's bf16 code
    # contractions — a legitimate rounding gap that grows ~linearly with
    # C (5e-3 at C=64, ~2e-2 at C=256); wiring/layout bugs would produce
    # O(1) garbage. The NATIVE scale path is pinned tightly against the
    # f32-operand kernel below (same math, FMA-fusion rounding only).
    atol = 8e-3 if C == 64 else 4e-2
    for t in (3, 7, 11):
        tok = (jnp.arange(B, dtype=jnp.int32)[:, None] * 5 + t) % 64
        x_ref, s_ref = forward_chunk(info, params, s_ref, tok, lens)
        x = embed_tokens(params, tok)
        xo, s_pl = layer_scan7(
            mega, s_pl, x[:, 0], mask, None, LN_EPS, GN_EPS, L2_EPS,
        )
        np.testing.assert_allclose(
            np.asarray(xo), np.asarray(x_ref[:, 0]), rtol=3e-3, atol=atol
        )
        for k in s_ref:
            np.testing.assert_allclose(
                np.asarray(s_pl[k]), np.asarray(s_ref[k]), rtol=3e-3,
                atol=atol, err_msg=k,
            )
        if mega_f32 is not None:
            xo_f, s_f32 = layer_scan7(
                mega_f32, s_f32, x[:, 0], mask, None, LN_EPS, GN_EPS, L2_EPS,
            )
            np.testing.assert_allclose(
                np.asarray(xo), np.asarray(xo_f), rtol=1e-5, atol=1e-4
            )
            for k in s_f32:
                np.testing.assert_allclose(
                    np.asarray(s_pl[k]), np.asarray(s_f32[k]), rtol=1e-5,
                    atol=1e-4, err_msg=k,
                )


@pytest.mark.parametrize("version,quant,B", [
    (6, "q4k", 1), (6, "q4k", 5),   # both in-kernel gemv strategies
    (6, "q8_0", 1),                  # signed-byte code kind
    (6, "q4k", 16),                  # MAX_SCAN_BATCH full wide path
    (5, "q4k", 1), (5, "q4k", 5),    # V5: static mixes/decay variant
    (4, "q4k", 1), (4, "q4k", 5),    # V4: per-channel max-trick WKV
    (4, "q8_0", 1),
    (6, None, 1), (4, None, 1),      # dense bf16: plain-dot branch
])
def test_layer_scan56_matches_forward(version, quant, B):
    """Whole-stack V4/V5/V6 decode kernel vs the composed forward_chunk
    path over several carried decode steps (same tolerance rationale as
    the V7 scan test: different contraction order, not bit-equality)."""
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state
    from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, embed_tokens
    from web_rwkv_gguf_tpu.ops.pallas.layer56 import layer_scan56, prep_decode56
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v56_params

    info, params = synthetic_v56_params(
        version=version, n_layer=3, n_emb=64, head_size=16, n_vocab=64,
        n_hidden=256, rank_tm=8, rank_td=8, quant=quant,
    )
    mega = prep_decode56(params, info)
    assert mega is not None
    assert mega.static["version"] == version

    s_ref = init_state(info, B)
    s_pl = init_state(info, B)
    lens = jnp.ones((B,), jnp.int32)
    mask = jnp.ones((B,), jnp.float32)
    for t in (3, 7, 11):
        tok = (jnp.arange(B, dtype=jnp.int32)[:, None] * 5 + t) % 64
        x_ref, s_ref = forward_chunk(info, params, s_ref, tok, lens)
        x = embed_tokens(params, tok)
        xo, s_pl = layer_scan56(
            mega, s_pl, x[:, 0], mask, None, LN_EPS, GN_EPS,
        )
        np.testing.assert_allclose(
            np.asarray(xo), np.asarray(x_ref[:, 0]), rtol=3e-3, atol=8e-3
        )
        for k in s_ref:
            np.testing.assert_allclose(
                np.asarray(s_pl[k]), np.asarray(s_ref[k]), rtol=3e-3,
                atol=8e-3, err_msg=k,
            )


@pytest.mark.parametrize("version", [6, 4])
def test_layer_scan56_mask_preserves_state(version):
    """mask=0 must leave the recurrent state unchanged — for V4 this
    pins the jnp.where gating (pp carries f32::MIN sentinels a linear
    blend would destroy)."""
    from web_rwkv_gguf_tpu.models import init_state
    from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, embed_tokens
    from web_rwkv_gguf_tpu.ops.pallas.layer56 import layer_scan56, prep_decode56
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v56_params

    info, params = synthetic_v56_params(
        version=version, n_layer=2, n_emb=64, head_size=16, n_vocab=64,
        n_hidden=256, rank_tm=8, rank_td=8, quant="q4k",
    )
    mega = prep_decode56(params, info)
    state = init_state(info, 1)
    x = embed_tokens(params, jnp.asarray([[5]], jnp.int32))
    _, s_new = layer_scan56(
        mega, state, x[:, 0], jnp.asarray([0.0], jnp.float32), None,
        LN_EPS, GN_EPS,
    )
    for k in state:
        np.testing.assert_allclose(
            np.asarray(s_new[k]), np.asarray(state[k]), atol=1e-6, err_msg=k
        )


@pytest.mark.parametrize("version", [6, 4])
def test_prepare_decode_routes_v6(version):
    """prepare_decode attaches mega56 for uniformly-quantized V4/V6
    stacks and forward_chunk consumes it at T=1 (routing pinned
    end-to-end)."""
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, prepare_decode
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v56_params

    info, params = synthetic_v56_params(
        version=version, n_layer=2, n_emb=64, head_size=16, n_vocab=64,
        n_hidden=256, rank_tm=8, rank_td=8, quant="q4k",
    )
    pd = prepare_decode(params, info, batch_hint=1)
    assert "mega56" in pd
    # composed-path reference vs the routed fused path
    tok = jnp.asarray([[7]], jnp.int32)
    lens = jnp.ones((1,), jnp.int32)
    x_ref, s_ref = forward_chunk(info, params, init_state(info, 1), tok, lens)
    x_f, s_f = forward_chunk(info, pd, init_state(info, 1), tok, lens)
    np.testing.assert_allclose(
        np.asarray(x_f), np.asarray(x_ref), rtol=3e-3, atol=8e-3
    )


@pytest.mark.parametrize("version", [6, 4])
def test_layer_scan56_rescale_matches_composed(version):
    """The every-N-layers residual halving (rescale-discount loads) must
    agree between the fused kernel and the composed path for V4/V6."""
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state
    from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, embed_tokens
    from web_rwkv_gguf_tpu.ops.pallas.layer56 import layer_scan56, prep_decode56
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v56_params

    info, params = synthetic_v56_params(
        version=version, n_layer=4, n_emb=64, head_size=16, n_vocab=64,
        n_hidden=256, rank_tm=8, rank_td=8, quant="q4k",
    )
    mega = prep_decode56(params, info)
    tok = jnp.asarray([[9]], jnp.int32)
    lens = jnp.ones((1,), jnp.int32)
    x_ref, _ = forward_chunk(
        info, params, init_state(info, 1), tok, lens, rescale=2,
    )
    x = embed_tokens(params, tok)
    xo, _ = layer_scan56(
        mega, init_state(info, 1), x[:, 0], jnp.ones((1,), jnp.float32),
        2, LN_EPS, GN_EPS,
    )
    np.testing.assert_allclose(
        np.asarray(xo), np.asarray(x_ref[:, 0]), rtol=3e-3, atol=8e-3
    )


def test_layer_scan7_rescale_matches_composed():
    """Same rescale parity pin for the V7 kernel."""
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state
    from web_rwkv_gguf_tpu.models.forward import (
        GN_EPS, L2_EPS, LN_EPS, embed_tokens,
    )
    from web_rwkv_gguf_tpu.ops.pallas.layer7 import layer_scan7, prep_decode7
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=4, n_emb=64, head_size=16, n_vocab=64, n_hidden=256,
        lora_w=8, lora_a=8, lora_g=16, lora_v=8, quant="q4k",
    )
    mega = prep_decode7(params, info)
    tok = jnp.asarray([[9]], jnp.int32)
    lens = jnp.ones((1,), jnp.int32)
    x_ref, _ = forward_chunk(
        info, params, init_state(info, 1), tok, lens, rescale=2,
    )
    x = embed_tokens(params, tok)
    xo, _ = layer_scan7(
        mega, init_state(info, 1), x[:, 0], jnp.ones((1,), jnp.float32),
        2, LN_EPS, GN_EPS, L2_EPS,
    )
    np.testing.assert_allclose(
        np.asarray(xo), np.asarray(x_ref[:, 0]), rtol=3e-3, atol=8e-3
    )


def test_v4_quantized_gguf_routes_fused():
    """A direct-quantized V4 GGUF (legacy "rwkv" arch naming) loads into
    Matrix blocks, prepare_decode attaches mega56, and the fused decode
    step matches the composed path (logit tolerance — different rounding
    class, never token equality across kernel classes)."""
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import (
        forward_chunk, init_state, load_model, prepare_decode,
    )
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType
    from web_rwkv_gguf_tpu.utils.synthetic import make_v4_gguf

    raw = make_v4_gguf(n_layer=2, n_emb=64, n_vocab=64, n_hidden=256,
                       quantize=GgmlDType.Q4_K)
    info, params = load_model(GgufFile(raw))
    pd = prepare_decode(params, info, batch_hint=1)
    assert "mega56" in pd, "quantized V4 GGUF should route to the fused path"
    tok = jnp.asarray([[7]], jnp.int32)
    lens = jnp.ones((1,), jnp.int32)
    x_ref, _ = forward_chunk(info, params, init_state(info, 1), tok, lens)
    x_f, _ = forward_chunk(info, pd, init_state(info, 1), tok, lens)
    np.testing.assert_allclose(
        np.asarray(x_f), np.asarray(x_ref), rtol=3e-3, atol=8e-3
    )


def test_layer_scan7_mask_preserves_state():
    """mask=0 must leave the recurrent state unchanged (padding lanes)."""
    from web_rwkv_gguf_tpu.models import init_state
    from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, L2_EPS, embed_tokens
    from web_rwkv_gguf_tpu.ops.pallas.layer7 import layer_scan7, prep_decode7
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=64, head_size=16, n_vocab=64, n_hidden=256,
        lora_w=8, lora_a=8, lora_g=16, lora_v=8, quant="q4k",
    )
    mega = prep_decode7(params, info)
    state = init_state(info, 1)
    x = embed_tokens(params, jnp.asarray([[5]], jnp.int32))
    _, s_new = layer_scan7(
        mega, state, x[:, 0], jnp.asarray([0.0], jnp.float32), None,
        LN_EPS, GN_EPS, L2_EPS,
    )
    for k in state:
        np.testing.assert_allclose(
            np.asarray(s_new[k]), np.asarray(state[k]), atol=1e-6, err_msg=k
        )


def test_layer_scan7_batch_split():
    """Batches above MAX_SCAN_BATCH run the layer-scan kernel over equal
    batch slices (forward.py routing). Every kernel op is
    batch-lane-independent under the wide gemv strategy, so the sliced
    run must match the whole-batch run BIT-exactly — checked here at
    B=6 vs 2x3 (both sides above config.wide_batch, same strategy)."""
    from web_rwkv_gguf_tpu.models import init_state
    from web_rwkv_gguf_tpu.models.forward import (
        LN_EPS, GN_EPS, L2_EPS, embed_tokens,
    )
    from web_rwkv_gguf_tpu.ops.pallas.layer7 import (
        layer_scan7, prep_decode7, scan_batch_slice,
    )
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    # the routing policy: default keeps B > cap on the composed path
    # (split measured slower at B=32, scripts/bench_b32_split.py); the
    # opt-in picks the fewest equal slices that fit the cap
    assert scan_batch_slice(1) == 1 and scan_batch_slice(16) == 16
    assert scan_batch_slice(32) is None
    pcfg.split_scan_batch = True
    try:
        assert scan_batch_slice(32) == 16 and scan_batch_slice(24) == 12
        assert scan_batch_slice(48) == 16 and scan_batch_slice(64) == 16
        assert scan_batch_slice(17) is None  # no uniform split
        assert scan_batch_slice(6, cap=3) == 3
    finally:
        pcfg.split_scan_batch = False

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=64, head_size=16, n_vocab=64, n_hidden=256,
        lora_w=8, lora_a=8, lora_g=16, lora_v=8, quant="q4k",
    )
    mega = prep_decode7(params, info)
    B, bs = 6, 3
    state = init_state(info, B)
    tok = (jnp.arange(B, dtype=jnp.int32)[:, None] * 7 + 3) % 64
    x = embed_tokens(params, tok)[:, 0]
    mask = jnp.ones((B,), jnp.float32)
    xo_w, s_w = layer_scan7(
        mega, state, x, mask, None, LN_EPS, GN_EPS, L2_EPS
    )
    parts, sts = [], []
    for i in range(B // bs):
        sl = slice(i * bs, (i + 1) * bs)
        st_i = jax.tree.map(lambda a: a[:, sl], state)
        xo_i, st_o = layer_scan7(
            mega, st_i, x[sl], mask[sl], None, LN_EPS, GN_EPS, L2_EPS
        )
        parts.append(np.asarray(xo_i))
        sts.append(st_o)
    np.testing.assert_array_equal(np.concatenate(parts, 0), np.asarray(xo_w))
    for k in s_w:
        got = np.concatenate([np.asarray(s[k]) for s in sts], axis=1)
        np.testing.assert_array_equal(got, np.asarray(s_w[k]), err_msg=k)


def test_native_scale_gemv_bit_identical():
    """Q4_K native scale factors (6-bit codes + f16 super-scales,
    build_gemv_operands_native) must reproduce the f32 product-operand
    gemv BIT-identically — both form d*sc in f32 — and carry 2.7x fewer
    scale bytes. Also: k % 256 != 0 (row-straddling super-blocks) must
    NOT produce native arrays."""
    from web_rwkv_gguf_tpu.models.matrix import Matrix
    from web_rwkv_gguf_tpu.ops.pallas.matmul import quant_matmul
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q4_k

    rng = np.random.default_rng(7)
    # n must stay <= config.wide_batch so quant_matmul actually dispatches
    # to the native-factor kernel (the wide path drops the tiled operands
    # and both sides would take the identical f32 route — vacuous).
    for m, k, n in ((512, 512, 1), (1024, 768, 2)):
        w = (rng.normal(size=(m, k)) * 0.05).astype(np.float32)
        raw = np.frombuffer(quantize_q4_k(w.reshape(-1)), np.uint8)
        mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (m, k))
        assert "stq" in mat.arrays and mat.arrays["stq"].dtype == jnp.uint8
        g = k // 32
        assert mat.arrays["sd"].shape == (g // 8, m)
        # native factors present ⇒ the redundant f32 product operands are
        # slimmed from the resident arrays (2.7x fewer scale bytes: the
        # f32 form would be 2g·m·4 B, native is 2g·m u8 + 2(g/8)·m f32)
        assert "st" not in mat.arrays and "mnt" not in mat.arrays
        scale_bytes_f32 = 2 * g * m * 4
        scale_bytes_nat = (mat.arrays["stq"].size + mat.arrays["mnq"].size
                           + (mat.arrays["sd"].size + mat.arrays["sdm"].size) * 4)
        assert scale_bytes_nat * 2 < scale_bytes_f32

        x = jnp.asarray((rng.normal(size=(n, k)) * 0.5).astype(np.float32))
        y_native = quant_matmul(x, "qk", mat.arrays, m, k)
        # without the native tiled operands, quant_matmul derives the f32
        # fold in-trace (_derive_gemv_operands_traced) — the comparison
        # also pins that derivation against the native kernel
        stripped = _f32_operand_arrays(mat.kind, mat.arrays)
        y_f32 = quant_matmul(x, "qk", stripped, m, k)
        # identical up to f32 FMA-fusion rounding (the kernel forms
        # d*sc/dmin*mn + 16*s in-register; the compiler may fuse the
        # multiply-add the host-side precompute kept separate)
        np.testing.assert_allclose(np.asarray(y_native), np.asarray(y_f32),
                                   rtol=1e-6, atol=1e-5)

        dense = np.asarray(mat.dequantize(jnp.float32))
        ref = np.asarray(x) @ dense.T
        np.testing.assert_allclose(np.asarray(y_native), ref, rtol=2e-2,
                                   atol=2e-2)

    # straddling super-blocks: no native arrays, f32 path still exact
    m, k = 256, 320  # k % 256 != 0
    w = (rng.normal(size=(m, k)) * 0.05).astype(np.float32)
    raw = np.frombuffer(quantize_q4_k(w.reshape(-1)), np.uint8)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (m, k))
    assert "stq" not in mat.arrays


def test_native_scale_gemv_q6k():
    """Q6_K no-min native factors (signed 8-bit scale codes + super-
    scales) vs the f32 product-operand gemv and the exact dense
    reference. Codes fit 7 bits, so the single-field byte-plane kernel
    applies: the offset fold (192·s for signed codes) forms in-kernel
    and (scq, sdn) replaces BOTH f32 operand arrays."""
    from web_rwkv_gguf_tpu.models.matrix import Matrix
    from web_rwkv_gguf_tpu.ops.pallas.matmul import quant_matmul
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q6_k

    rng = np.random.default_rng(13)
    m, k, n = 512, 512, 2
    w = (rng.normal(size=(m, k)) * 0.05).astype(np.float32)
    raw = np.frombuffer(quantize_q6_k(w.reshape(-1)), np.uint8)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q6_K, raw, (m, k))
    assert mat.kind == "qk_nomin"
    assert "scq" in mat.arrays and mat.arrays["scq"].dtype == jnp.int8
    g = k // 16
    assert mat.arrays["sdn"].shape == (g // 16, m)

    x = jnp.asarray((rng.normal(size=(n, k)) * 0.5).astype(np.float32))
    y_native = quant_matmul(x, mat.kind, mat.arrays, m, k)
    stripped = _f32_operand_arrays(mat.kind, mat.arrays)
    y_f32 = quant_matmul(x, mat.kind, stripped, m, k)
    np.testing.assert_allclose(np.asarray(y_native), np.asarray(y_f32),
                               rtol=1e-6, atol=3e-5)  # FMA-fusion rounding
    dense = np.asarray(mat.dequantize(jnp.float32))
    ref = np.asarray(x) @ dense.T
    np.testing.assert_allclose(np.asarray(y_native), ref, rtol=2e-2,
                               atol=2e-2 * np.abs(ref).max())


@pytest.mark.parametrize("B", [1, 5])
def test_layer_scan7_q6k_native(B):
    """Layer-scan kernel on a fully-Q6_K model: the no-min native form
    must apply to every matrix and match the f32-operand kernel."""
    from web_rwkv_gguf_tpu.models import init_state
    from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, L2_EPS, embed_tokens
    from web_rwkv_gguf_tpu.models.matrix import Matrix
    from web_rwkv_gguf_tpu.ops.pallas.layer7 import layer_scan7, prep_decode7
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=256, head_size=16, n_vocab=64, n_hidden=256,
        lora_w=8, lora_a=8, lora_g=16, lora_v=8, quant="q6k",
    )
    mega = prep_decode7(params, info)
    assert mega is not None
    assert mega.static["native_tags"] == ("n1f",) * 4

    def _strip(tree):
        if isinstance(tree, Matrix):
            return Matrix(tree.kind, tree.shape,
                          _f32_operand_arrays(tree.kind, tree.arrays))
        if isinstance(tree, dict):
            return {kk: _strip(v) for kk, v in tree.items()}
        return tree

    pf = dict(params)
    pf["blocks"] = _strip(params["blocks"])
    mega_f32 = prep_decode7(pf, info)
    assert mega_f32.static["native_tags"] == (False,) * 4

    s_n = init_state(info, B)
    s_f = init_state(info, B)
    mask = jnp.ones((B,), jnp.float32)
    for t in (3, 9):
        tok = (jnp.arange(B, dtype=jnp.int32)[:, None] * 7 + t) % 64
        x = embed_tokens(params, tok)[:, 0]
        xo_n, s_n = layer_scan7(mega, s_n, x, mask, None,
                                LN_EPS, GN_EPS, L2_EPS)
        xo_f, s_f = layer_scan7(mega_f32, s_f, x, mask, None,
                                LN_EPS, GN_EPS, L2_EPS)
        # B=1 (narrow): both kernels form exact per-product sums —
        # only f32 summation order differs. B=5 (wide): the single-field
        # and nibble-pair kernels round their k-expanded w_eff planes
        # INDEPENDENTLY (each ~5e-5-accurate vs the dense truth per
        # gemv, measured in interpret mode), and the 2-layer net
        # amplifies that to ~1e-2 relative — so the cross-kernel
        # comparison carries the looser class at wide batch.
        tol = dict(rtol=3e-4, atol=2e-3) if B <= 2 else dict(rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(xo_n), np.asarray(xo_f), **tol)
        for kk in s_n:
            np.testing.assert_allclose(
                np.asarray(s_n[kk]), np.asarray(s_f[kk]), err_msg=kk, **tol,
            )


def test_native_scale_gemv_q5k():
    """Q5_K byte-kind native factors (6-bit scale/min codes + super-
    scales) vs the f32 product-operand gemv and the exact dense
    reference — single-field byte planes; st = s and off = dmin·mn +
    128·s form in-kernel."""
    from web_rwkv_gguf_tpu.models.matrix import Matrix
    from web_rwkv_gguf_tpu.ops.pallas.matmul import quant_matmul
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q5_k

    rng = np.random.default_rng(17)
    m, k, n = 512, 512, 2
    w = (rng.normal(size=(m, k)) * 0.05).astype(np.float32)
    raw = np.frombuffer(quantize_q5_k(w.reshape(-1)), np.uint8)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q5_K, raw, (m, k))
    assert mat.kind == "qk_b" and "stq" in mat.arrays

    x = jnp.asarray((rng.normal(size=(n, k)) * 0.5).astype(np.float32))
    y_native = quant_matmul(x, mat.kind, mat.arrays, m, k)
    stripped = _f32_operand_arrays(mat.kind, mat.arrays)
    y_f32 = quant_matmul(x, mat.kind, stripped, m, k)
    np.testing.assert_allclose(np.asarray(y_native), np.asarray(y_f32),
                               rtol=1e-6, atol=3e-5)  # FMA-fusion rounding
    dense = np.asarray(mat.dequantize(jnp.float32))
    ref = np.asarray(x) @ dense.T
    np.testing.assert_allclose(np.asarray(y_native), ref, rtol=2e-2,
                               atol=2e-2 * np.abs(ref).max())


def test_layer_scan7_q5k_native():
    """Layer-scan kernel on a fully-Q5_K model: the byte-kind native form
    must apply to every matrix and match the f32-operand kernel."""
    from web_rwkv_gguf_tpu.models import init_state
    from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, L2_EPS, embed_tokens
    from web_rwkv_gguf_tpu.models.matrix import Matrix
    from web_rwkv_gguf_tpu.ops.pallas.layer7 import layer_scan7, prep_decode7
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=256, head_size=16, n_vocab=64, n_hidden=256,
        lora_w=8, lora_a=8, lora_g=16, lora_v=8, quant="q5k",
    )
    mega = prep_decode7(params, info)
    assert mega is not None
    assert mega.static["native_tags"] == ("b1f",) * 4

    def _strip(tree):
        if isinstance(tree, Matrix):
            return Matrix(tree.kind, tree.shape,
                          _f32_operand_arrays(tree.kind, tree.arrays))
        if isinstance(tree, dict):
            return {kk: _strip(v) for kk, v in tree.items()}
        return tree

    pf = dict(params)
    pf["blocks"] = _strip(params["blocks"])
    mega_f32 = prep_decode7(pf, info)
    assert mega_f32.static["native_tags"] == (False,) * 4

    B = 5  # wide strategy + native byte form together
    s_n, s_f = init_state(info, B), init_state(info, B)
    mask = jnp.ones((B,), jnp.float32)
    for t in (3, 9):
        tok = (jnp.arange(B, dtype=jnp.int32)[:, None] * 7 + t) % 64
        x = embed_tokens(params, tok)[:, 0]
        xo_n, s_n = layer_scan7(mega, s_n, x, mask, None,
                                LN_EPS, GN_EPS, L2_EPS)
        xo_f, s_f = layer_scan7(mega_f32, s_f, x, mask, None,
                                LN_EPS, GN_EPS, L2_EPS)
        # (same independent-wide-rounding note as the Q6_K layer test)
        np.testing.assert_allclose(np.asarray(xo_n), np.asarray(xo_f),
                                   rtol=2e-2, atol=2e-2)
        for kk in s_n:
            np.testing.assert_allclose(
                np.asarray(s_n[kk]), np.asarray(s_f[kk]), rtol=2e-2,
                atol=2e-2, err_msg=kk,
            )


def test_native_scale_gemv_q2k():
    """Q2_K byte-kind native factors (4-bit scale/min codes, per-16
    groups) through the same qk_b native gemv as Q5_K."""
    from web_rwkv_gguf_tpu.models.matrix import Matrix
    from web_rwkv_gguf_tpu.ops.pallas.matmul import quant_matmul
    from web_rwkv_gguf_tpu.quant import ggml as G

    rng = np.random.default_rng(23)
    m, k = 64, 512
    nb = m * k // 256
    raw = bytearray(rng.integers(0, 256, nb * 84, dtype=np.uint8).tobytes())
    for b in range(nb):  # sane f16 d/dmin fields
        for off in (80, 82):
            raw[b * 84 + off : b * 84 + off + 2] = np.float16(
                rng.uniform(0.001, 0.05)
            ).tobytes()
    mat = Matrix.from_gguf_blocks(G.GgmlDType.Q2_K, bytes(raw), (m, k))
    assert mat.kind == "qk_b" and "stq" in mat.arrays
    assert mat.arrays["sdn" if False else "sd"].shape == (k // 16 // 16, m)

    x = jnp.asarray((rng.normal(size=(2, k)) * 0.5).astype(np.float32))
    y_native = quant_matmul(x, mat.kind, mat.arrays, m, k)
    stripped = _f32_operand_arrays(mat.kind, mat.arrays)
    y_f32 = quant_matmul(x, mat.kind, stripped, m, k)
    # FMA-fusion rounding scales with the offset-fold magnitude (random
    # Q2_K blocks have large 272·s folds); tolerance relative to output
    tol = 3e-5 * max(1.0, float(np.abs(np.asarray(y_f32)).max()))
    np.testing.assert_allclose(np.asarray(y_native), np.asarray(y_f32),
                               rtol=1e-5, atol=tol)


def test_wide_plain_precision_bound():
    """The production default (wide_precise=False: dequantized weights
    round to bf16) must stay within ~1% of the double-bf16 path — the
    same precision class as the XLA fallback's bf16 dequant contraction."""
    from web_rwkv_gguf_tpu.models import init_state
    from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, L2_EPS, embed_tokens
    from web_rwkv_gguf_tpu.ops.pallas.layer7 import layer_scan7, prep_decode7
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=64, head_size=16, n_vocab=64, n_hidden=256,
        lora_w=8, lora_a=8, lora_g=16, lora_v=8, quant="q4k",
    )
    mega = prep_decode7(params, info)
    B = 5
    x = embed_tokens(params, jnp.ones((B, 1), jnp.int32) * 3)[:, 0]
    mask = jnp.ones((B,), jnp.float32)
    outs = {}
    for prec in (True, False):
        pcfg.wide_precise = prec
        xo, _ = layer_scan7(mega, init_state(info, B), x, mask, None,
                            LN_EPS, GN_EPS, L2_EPS)
        outs[prec] = np.asarray(xo)
    pcfg.wide_precise = True
    scale = np.abs(outs[True]).max()
    rel = np.abs(outs[False] - outs[True]).max() / scale
    assert rel < 0.03, rel  # measured ~1.1% on this config


def test_wide_precise_byte_kinds_standalone():
    """The standalone wide gemv (_gemv_kernel2w, split=False) must keep
    byte-kind planes (values up to 527 = 272 + byte) in f32 so the
    wide_precise double-bf16 correction reaches ~2^-16 error — a bf16
    round of the combined plane loses code bits the correction cannot
    recover (~2^-8-class error, caught by the tight tolerance here)."""
    from web_rwkv_gguf_tpu.quant import ggml as G

    rng = np.random.default_rng(21)
    M, K, N = 128, 512, 5  # N > wide_batch → _gemv_kernel2w
    assert N > pcfg.wide_batch

    # Q8_0 → qk_nomin (signed bytes); Q5_K → qk_b (unsigned bytes + mins)
    w = (rng.normal(size=(M, K)) * 0.1).astype(np.float32)
    raw8 = np.frombuffer(quantize_q8_0(w.reshape(-1)), np.uint8)
    mats = [Matrix.from_gguf_blocks(GgmlDType.Q8_0, raw8, (M, K))]

    n_blocks = M * K // G.GGML_BLOCK_SIZES[GgmlDType.Q5_K]
    raw5 = bytearray(rng.integers(0, 256, n_blocks * 176, dtype=np.uint8).tobytes())
    for b in range(n_blocks):
        for off in (0, 2):
            raw5[b * 176 + off : b * 176 + off + 2] = np.float16(
                rng.uniform(0.001, 0.05)
            ).tobytes()
    mats.append(Matrix.from_gguf_blocks(GgmlDType.Q5_K, bytes(raw5), (M, K)))

    x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    for mat in mats:
        assert mat.kind in ("qk_nomin", "qk_b"), mat.kind
        want = np.asarray(
            jnp.einsum(
                "nk,mk->nm", x.astype(jnp.bfloat16).astype(jnp.float32),
                mat.dequantize(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        )
        got = np.asarray(quant_matmul(x, mat.kind, mat.arrays, M, K))
        tol = 5e-4 * np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=tol,
                                   err_msg=mat.kind)
