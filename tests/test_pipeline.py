"""Pipeline-parallel forward parity on a virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from web_rwkv_gguf_tpu.gguf import GgufFile
from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model
from web_rwkv_gguf_tpu.parallel import make_mesh
from web_rwkv_gguf_tpu.parallel.pipeline import make_pipeline_forward, pipeline_state

import fixtures


@pytest.mark.parametrize("version", ["v7", "v6", "v5", "v4"])
def test_pipeline_matches_single(version):
    make = {
        "v7": lambda: fixtures.make_v7_gguf(n_layer=4, n_emb=32,
                                            head_size=8, n_vocab=64),
        "v6": lambda: fixtures.make_v6_gguf(n_layer=4, n_emb=32,
                                            head_size=8, n_vocab=64),
        "v5": lambda: fixtures.make_v5_gguf(n_layer=4, n_emb=32,
                                            head_size=8, n_vocab=64),
        "v4": lambda: fixtures.make_v4_gguf(n_layer=4, n_emb=32, n_vocab=64),
    }[version]
    info, params = load_model(GgufFile(make()))
    M, B, T = 3, 2, 8
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, info.num_vocab, (M, B, T)), jnp.int32)
    lengths = jnp.asarray(rng.integers(3, T + 1, (M, B)), jnp.int32)

    # reference: each microbatch independently through the plain forward
    want = []
    for m in range(M):
        x, st = forward_chunk(info, params, init_state(info, B), tokens[m], lengths[m])
        want.append((np.asarray(x), jax.tree.map(np.asarray, st)))

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    ppf = make_pipeline_forward(info, mesh, axis="model", num_microbatch=M)
    st0 = pipeline_state(info, M, B)
    x_got, st_got = ppf(params, st0, tokens, lengths)

    for m in range(M):
        x_w, st_w = want[m]
        mask = (np.arange(T)[None, :] < np.asarray(lengths[m])[:, None])[..., None]
        np.testing.assert_allclose(
            np.asarray(x_got[m]) * mask, x_w * mask, rtol=5e-4, atol=5e-4
        )
        for k in st_w:
            np.testing.assert_allclose(
                np.asarray(st_got[k][:, m]), st_w[k], rtol=5e-4, atol=5e-4,
                err_msg=f"mb{m} {k}",
            )


def test_pipeline_rejects_bad_config():
    info, params = load_model(GgufFile(fixtures.make_v7_gguf(n_layer=2)))
    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="divide"):
        make_pipeline_forward(info, mesh, axis="model")


def test_pipeline_composes_with_data_parallel():
    """2x2 mesh: batch sharded on 'data' while layers shard on 'pp'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_layer=4, n_emb=32, head_size=8, n_vocab=64))
    )
    M, B, T = 2, 4, 8
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, info.num_vocab, (M, B, T)), jnp.int32)
    lengths = jnp.full((M, B), T, jnp.int32)

    want = []
    for m in range(M):
        x, _ = forward_chunk(info, params, init_state(info, B), tokens[m], lengths[m])
        want.append(np.asarray(x))

    mesh = make_mesh(2, 2, devices=jax.devices()[:4])  # (data, model)
    ppf = make_pipeline_forward(info, mesh, axis="model", num_microbatch=M)
    st0 = pipeline_state(info, M, B)
    # shard the batch dim over 'data' on inputs
    tok_sh = jax.device_put(tokens, NamedSharding(mesh, P(None, "data", None)))
    x_got, _ = ppf(params, st0, tok_sh, lengths)
    for m in range(M):
        np.testing.assert_allclose(
            np.asarray(x_got[m]), want[m], rtol=5e-4, atol=5e-4
        )


def test_engine_pipeline_matches_single():
    """Engine(pipeline_microbatches=M): lanes grouped into microbatches
    flow through the GPipe schedule; outputs and state must match the
    plain Engine."""
    from web_rwkv_gguf_tpu.runtime import Engine, RnnInput, RnnInputBatch

    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_layer=4, n_emb=32, head_size=8,
                                       n_vocab=64))
    )
    M, Bm = 2, 1
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    def drive(eng):
        inp = RnnInput([RnnInputBatch(list(p)) for p in prompts], 32)
        outs = [None] * len(prompts)
        while inp.num_token:
            o = eng.infer(inp)
            for b in range(len(prompts)):
                if len(o[b]):
                    outs[b] = o[b][-1]
        return [np.asarray(o) for o in outs]

    want = drive(Engine(info, params, num_batch=2, token_chunk_size=32))
    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    got = drive(
        Engine(info, params, num_batch=2, token_chunk_size=32, mesh=mesh,
               pipeline_microbatches=M)
    )
    for g, w in zip(got, want):
        assert int(np.argmax(g)) == int(np.argmax(w))
        np.testing.assert_allclose(g, w, rtol=2e-3,
                                   atol=2e-3 * max(1.0, np.abs(w).max()))
