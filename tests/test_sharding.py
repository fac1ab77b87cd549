"""Multi-chip sharding tests on a virtual 8-device CPU mesh: sharded
forward must match the single-device forward bit-for-bit-ish, for dense
and quantized formats, across mesh shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from web_rwkv_gguf_tpu.gguf import GgufFile
from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model, logits_head
from web_rwkv_gguf_tpu.parallel import (
    data_sharding,
    make_mesh,
    shard_params,
    shard_state,
)

import fixtures


@pytest.fixture(scope="module")
def model():
    # 8 heads / vocab & dims divisible by 8 so the model axis can be 2 or 4
    raw = fixtures.make_v7_gguf(n_layer=2, n_emb=64, head_size=8, n_vocab=64, n_hidden=128)
    return load_model(GgufFile(raw))


def _run(info, params, state, tokens, lengths):
    x, st = forward_chunk(info, params, state, tokens, lengths)
    return logits_head(params, x[:, -1]), st


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 2), (2, 4), (1, 8)])
def test_sharded_matches_single(model, mesh_shape):
    info, params = model
    n_data, n_model = mesh_shape
    B = 2 * n_data
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, info.num_vocab, (B, 4)), jnp.int32)
    lengths = jnp.asarray([4] * B, jnp.int32)

    want, st_want = _run(info, params, init_state(info, B), tokens, lengths)

    mesh = make_mesh(n_data, n_model, devices=jax.devices()[: n_data * n_model])
    sp = shard_params(params, mesh, info)
    ss = shard_state(init_state(info, B), mesh)
    tok_sh, len_sh = data_sharding(mesh)
    tokens_s = jax.device_put(tokens, tok_sh)
    lengths_s = jax.device_put(lengths, len_sh)
    got, st_got = jax.jit(lambda p, s, t, l: _run(info, p, s, t, l))(
        sp, ss, tokens_s, lengths_s
    )

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    for k in st_want:
        np.testing.assert_allclose(
            np.asarray(st_got[k]), np.asarray(st_want[k]), rtol=2e-4, atol=2e-4
        )


def test_sharded_quantized(model):
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType

    raw = fixtures.make_v7_gguf(
        n_layer=2, n_emb=64, head_size=8, n_vocab=64, n_hidden=256,
        quantize=GgmlDType.Q8_0, seed=5,
    )
    info, params = load_model(GgufFile(raw))
    assert params["blocks"]["att"]["Wk"].kind == "qk_nomin"
    B = 2
    tokens = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    lengths = jnp.asarray([3, 3], jnp.int32)
    want, _ = _run(info, params, init_state(info, B), tokens, lengths)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    sp = shard_params(params, mesh, info)
    ss = shard_state(init_state(info, B), mesh)
    got, _ = jax.jit(lambda p, s, t, l: _run(info, p, s, t, l))(sp, ss, tokens, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_sharded_fused_generation(model):
    """The fused multi-step generator must run sharded and match the
    single-device generator (the multi-chip serving path)."""
    from web_rwkv_gguf_tpu.models.generate import make_generator

    info, params = model
    B = 2
    gen = make_generator(info, steps=6)
    key = jax.random.key(0)
    tok = jnp.asarray([[3], [9]], jnp.int32)
    toks_w, logits_w, _, _, _ = gen(params, init_state(info, B), tok, key)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    sp = shard_params(params, mesh, info)
    ss = shard_state(init_state(info, B), mesh)
    toks_s, logits_s, _, _, _ = gen(sp, ss, tok, key)
    np.testing.assert_array_equal(np.asarray(toks_s), np.asarray(toks_w))
    # six chained steps amplify collective reduction-order differences
    np.testing.assert_allclose(
        np.asarray(logits_s), np.asarray(logits_w), rtol=5e-3, atol=5e-3
    )
