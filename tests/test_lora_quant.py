"""LoRA merge-at-load, NF4/SF4 requant forward, per-layer quant config,
and pretrained time_state import tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from web_rwkv_gguf_tpu.gguf import GgufFile, GgufWriter
from web_rwkv_gguf_tpu.io.safetensors import SafetensorsFile, write_safetensors
from web_rwkv_gguf_tpu.models import (
    forward_chunk,
    init_state,
    load_initial_state,
    load_model,
)
from web_rwkv_gguf_tpu.models.loader import LoraPatch
from web_rwkv_gguf_tpu.quant.formats import QuantScheme

import fixtures


def test_lora_vector_blend(tmp_path):
    """Vector LoRA: x ← α·lora + (1-α)·x (ref: loader.rs:459-476)."""
    raw = fixtures.make_v7_gguf(seed=2)
    base = GgufFile(raw)
    name = "blocks.0.att.x_r"
    orig = base.tensor(name, np.float32)
    lora_vec = np.ones_like(orig) * 0.25

    st = tmp_path / "lora.st"
    write_safetensors(st, {name: lora_vec.astype(np.float32)})
    patch = LoraPatch(SafetensorsFile(st), blend=[(r"x_r$", 0.5)])
    info, params = load_model(GgufFile(raw), lora=[patch])

    got = np.asarray(params["blocks"]["att"]["x_r"][0])
    want = 0.5 * lora_vec + 0.5 * orig
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # non-matching names untouched
    got_xw = np.asarray(params["blocks"]["att"]["x_w"][0])
    np.testing.assert_allclose(got_xw, base.tensor("blocks.0.att.x_w", np.float32))


def test_lora_matrix_blend(tmp_path):
    """Matrix LoRA: W ← W + (α/rank)·B@A (ref: loader.rs blend_lora)."""
    raw = fixtures.make_v7_gguf(seed=2)
    base = GgufFile(raw)
    name = "blocks.0.att.key.weight"
    orig = base.tensor(name, np.float32)
    rank = 2
    rng = np.random.default_rng(0)
    A = rng.normal(size=(rank, orig.shape[1])).astype(np.float32)
    Bm = rng.normal(size=(orig.shape[0], rank)).astype(np.float32)

    st = tmp_path / "lora.st"
    write_safetensors(st, {f"{name}.lora.0": A, f"{name}.lora.1": Bm})
    patch = LoraPatch(SafetensorsFile(st), blend=[(r"key", 8.0)])
    info, params = load_model(GgufFile(raw), lora=[patch])

    got = np.asarray(params["blocks"]["att"]["Wk"].arrays["w"][0], np.float32)
    want = (orig + (8.0 / rank) * (Bm @ A)).astype(np.float16).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)  # bf16 storage


@pytest.mark.parametrize("scheme", [QuantScheme.INT8, QuantScheme.NF4, QuantScheme.SF4])
def test_engine_requant_forward(scheme):
    """Int8/NF4/SF4 requant: weight reconstruction must be accurate and
    the forward must not blow up (the chaotic random tiny net amplifies
    4-bit noise, so the forward bound is loose; ppl QA on real models is
    the production check)."""
    raw = fixtures.make_v7_gguf(seed=4, n_emb=128, head_size=32, n_hidden=256)
    info, pf = load_model(GgufFile(raw))
    info, pq = load_model(GgufFile(raw), quant=scheme)
    kind = {"int8": "int8", "nf4": "nf4", "sf4": "nf4"}[scheme.value]
    assert pq["blocks"]["att"]["Wk"].kind == kind

    wf = np.asarray(pf["blocks"]["att"]["Wk"].dequantize(jnp.float32))
    wq = np.asarray(pq["blocks"]["att"]["Wk"].dequantize(jnp.float32))
    wrel = np.abs(wf - wq).mean() / np.abs(wf).mean()
    assert wrel < (0.02 if scheme == QuantScheme.INT8 else 0.12), wrel

    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    xf, _ = forward_chunk(info, pf, init_state(info, 1), tokens, lens)
    xq, _ = forward_chunk(info, pq, init_state(info, 1), tokens, lens)
    assert bool(jnp.isfinite(xq).all())
    rel = np.abs(np.asarray(xf) - np.asarray(xq)).mean() / (np.abs(np.asarray(xf)).mean() + 1e-9)
    assert rel < (0.05 if scheme == QuantScheme.INT8 else 0.6), rel


def test_per_layer_quant_config():
    """quant={0: INT8}: layer 0 quantized, layer 1 dense → per-layer
    (unrolled) form that matches the dense model closely."""
    raw = fixtures.make_v7_gguf(seed=4, n_emb=128, head_size=32, n_hidden=256)
    info, pf = load_model(GgufFile(raw))
    info, pm = load_model(GgufFile(raw), quant={0: QuantScheme.INT8})
    assert isinstance(pm["blocks"], list)
    assert pm["blocks"][0]["att"]["Wk"].kind == "int8"
    assert pm["blocks"][1]["att"]["Wk"].kind == "dense"
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    xf, _ = forward_chunk(info, pf, init_state(info, 1), tokens, lens)
    xm, _ = forward_chunk(info, pm, init_state(info, 1), tokens, lens)
    rel = np.abs(np.asarray(xf) - np.asarray(xm)).mean() / np.abs(np.asarray(xf)).mean()
    assert rel < 0.05, rel


def test_time_state_import():
    """Pretrained time_state loads into the [L, H, K, V] wkv init
    (ref: v7.rs:1229-1262)."""
    n_layer, n_emb, hs = 2, 16, 4
    H = n_emb // hs
    rng = np.random.default_rng(0)
    w = GgufWriter()
    w.add_metadata("rwkv7.wkv.head_size", hs)
    states = []
    for i in range(n_layer):
        # stored [num_emb(h·v), head_size(k)] per the reference layout
        st = rng.normal(size=(n_emb, hs)).astype(np.float32)
        states.append(st)
        w.add_tensor(f"blk.{i}.attn_time_state", st)
    from web_rwkv_gguf_tpu.models.info import CustomInfo, ModelInfo, ModelVersion

    info = ModelInfo(
        version=ModelVersion.V7, num_layer=n_layer, num_emb=n_emb,
        num_hidden=64, num_vocab=32, num_head=H, custom=CustomInfo(),
    )
    wkv = load_initial_state(GgufFile(w.tobytes()), info)
    assert wkv.shape == (n_layer, H, hs, hs)
    # element check: stored[h*hs + v, k] == wkv[layer, h, k, v]
    for i in range(n_layer):
        for h in range(H):
            for v in range(hs):
                for k in range(hs):
                    assert wkv[i, h, k, v] == states[i][h * hs + v, k]


def test_rescale_discount_identity():
    """rescale loading (weights pre-discounted by 2^-(L//r), residual
    halved every r layers) is identity math: outputs must match the plain
    load (ref: loader.rs:923-951 load_matrix_discount + v7.rs:1002-1004)."""
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model

    raw = fixtures.make_v7_gguf(n_layer=4, n_emb=32, head_size=8, n_vocab=64)
    info, params = load_model(GgufFile(raw), dtype=jnp.float32)
    info2, params2 = load_model(GgufFile(raw), dtype=jnp.float32, rescale=2)

    tokens = jnp.asarray([[5, 6, 7]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    x0, _ = forward_chunk(info, params, init_state(info, 1), tokens, lens)
    x1, _ = forward_chunk(
        info2, params2, init_state(info2, 1), tokens, lens, rescale=2
    )
    # x1 is the rescaled residual: undo the final scale for comparison
    scale = 2.0 ** (info.num_layer // 2)
    np.testing.assert_allclose(
        np.asarray(x1) * scale, np.asarray(x0), rtol=2e-4, atol=2e-4
    )


def test_matrix_statistics():
    """Quantile summary parity (ref: src/tensor/matrix.rs MatrixStatistics)."""
    from web_rwkv_gguf_tpu.quant.formats import matrix_statistics

    v = np.arange(1001, dtype=np.float32)
    s = matrix_statistics(v)
    assert s["min"] == 0.0 and s["max"] == 1000.0
    assert s["q_50"] == 500.0
    assert s["q_005"] == 5.0 and s["q_995"] == 995.0
    assert s["q_25"] == 250.0 and s["q_75"] == 750.0
