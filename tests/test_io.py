"""io tests: prequantized model snapshots, state files, reference-layout
round trips, safetensors reader/writer."""

import numpy as np
import jax.numpy as jnp
import pytest

from web_rwkv_gguf_tpu.gguf import GgufFile
from web_rwkv_gguf_tpu.io import (
    SafetensorsFile,
    load_model_snapshot,
    load_state,
    save_model,
    save_state,
    state_from_reference_layout,
    state_to_reference_layout,
)
from web_rwkv_gguf_tpu.io.safetensors import write_safetensors
from web_rwkv_gguf_tpu.models import (
    detect_info,
    forward_chunk,
    init_state,
    load_model,
    logits_head,
)
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType

import fixtures


def test_model_snapshot_roundtrip(tmp_path):
    """Save a direct-quantized model, reload, identical logits — the
    reference's examples/serde.rs flow (prequantized save/load)."""
    raw = fixtures.make_v7_gguf(
        n_emb=64, head_size=16, n_hidden=256, quantize=GgmlDType.Q8_0, seed=3
    )
    info, params = load_model(GgufFile(raw))
    path = tmp_path / "model.rwkvz"
    save_model(path, info, params)
    info2, params2 = load_model_snapshot(path)
    assert info2.version == info.version and info2.num_head == info.num_head

    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    x1, _ = forward_chunk(info, params, init_state(info, 1), tokens, lens)
    x2, _ = forward_chunk(info2, params2, init_state(info2, 1), tokens, lens)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


@pytest.mark.parametrize("maker", [fixtures.make_v4_gguf, fixtures.make_v7_gguf])
def test_state_reference_layout_roundtrip(maker, tmp_path):
    info, params = load_model(GgufFile(maker()))
    state = init_state(info, 1)
    x, state = forward_chunk(
        info, params, state, jnp.asarray([[1, 2, 3]], jnp.int32), jnp.asarray([3])
    )
    snap = {k: np.asarray(v[:, 0]) for k, v in state.items()}
    ref = state_to_reference_layout(info, snap)
    assert ref.shape[0] == info.num_layer
    back = state_from_reference_layout(info, ref)
    for k in snap:
        np.testing.assert_array_equal(back[k], snap[k])

    p = tmp_path / "st.npz"
    save_state(p, info, snap)
    loaded = load_state(p)
    for k in snap:
        np.testing.assert_array_equal(loaded[k], snap[k])


def test_safetensors_reader_model(tmp_path):
    """A model written as safetensors (model-convention names) loads and
    matches the same model from GGUF."""
    raw = fixtures.make_v7_gguf(seed=11)
    g = GgufFile(raw)
    tensors = {}
    for name in g.names():
        if name.startswith("blk.") or name in (
            "token_embd.weight", "output_norm.weight", "output_norm.bias",
            "output.weight", "token_embd_norm.weight", "token_embd_norm.bias",
        ):
            continue  # only model-convention names
        # keep f32 so vector params match the GGUF load bit-exactly
        tensors[name] = g.tensor(name, np.float32)
    path = tmp_path / "model.st"
    write_safetensors(path, tensors)

    st = SafetensorsFile(path)
    info_g, params_g = load_model(g)
    info_s, params_s = load_model(st)
    assert info_s.version == info_g.version
    assert info_s.num_head == info_g.num_head

    tokens = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    xg, _ = forward_chunk(info_g, params_g, init_state(info_g, 1), tokens, lens)
    xs, _ = forward_chunk(info_s, params_s, init_state(info_s, 1), tokens, lens)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xg), rtol=2e-3, atol=2e-3)


def test_safetensors_bf16_reader(tmp_path):
    """BF16 .st checkpoints load (converted on read, like the reference's
    F32/BF16→F16 at load, ref: loader.rs:104-132)."""
    import ml_dtypes

    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 8)).astype(np.float32)
    path = tmp_path / "bf16.st"
    write_safetensors(path, {"w": a.astype(ml_dtypes.bfloat16)})
    st = SafetensorsFile(path)
    got = st.tensor("w", np.float32)
    np.testing.assert_allclose(got, a, rtol=8e-3, atol=8e-3)  # bf16 rounding
    assert st.shape("w") == (4, 8)
