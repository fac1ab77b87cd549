"""DistributedEngine single-process path + vocab converter tests."""

import numpy as np
import jax.numpy as jnp

from web_rwkv_gguf_tpu.gguf import GgufFile
from web_rwkv_gguf_tpu.models import load_model
from web_rwkv_gguf_tpu.parallel import make_mesh, shard_params
from web_rwkv_gguf_tpu.runtime import (
    DistributedEngine,
    Engine,
    RnnInput,
    RnnInputBatch,
)

import fixtures


def test_distributed_engine_matches_engine():
    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_emb=64, head_size=8, n_vocab=64))
    )
    prompts = [[1, 2, 3, 4, 5], [7, 8]]

    eng = Engine(info, params, num_batch=2, token_chunk_size=32)
    inp = RnnInput([RnnInputBatch(list(p)) for p in prompts], 32)
    want = [None, None]
    while inp.num_token:
        out = eng.infer(inp)
        for b in range(2):
            if len(out[b]):
                want[b] = out[b][-1]

    mesh = make_mesh(1, 4, devices=__import__("jax").devices()[:4])
    sp = shard_params(params, mesh, info)
    deng = DistributedEngine(info, sp, num_batch=2, mesh=mesh, token_chunk_size=32)
    inp2 = RnnInput([RnnInputBatch(list(p)) for p in prompts], 32)
    got = [None, None]
    while inp2.num_token:
        out = deng.infer(inp2)
        for b in range(2):
            if len(out[b]):
                got[b] = out[b][-1]

    for b in range(2):
        np.testing.assert_allclose(got[b], want[b], rtol=2e-4, atol=2e-4)


def test_distributed_engine_shard_map_tp():
    """tp_mode='shard_map': the Pallas-safe TP forward serves the
    cross-host engine (VERDICT r2 #6) — results match the single-device
    Engine, including FULL outputs, embeds, and a mid-stream lane reset."""
    import jax

    from web_rwkv_gguf_tpu.parallel import shard_state
    from web_rwkv_gguf_tpu.parallel.tensor import shard_params_tp
    from web_rwkv_gguf_tpu.runtime import RnnOption

    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_emb=64, head_size=8, n_vocab=64))
    )
    prompts = [[1, 2, 3, 4, 5], [7, 8]]

    eng = Engine(info, params, num_batch=2, token_chunk_size=32)
    inp = RnnInput(
        [RnnInputBatch(list(prompts[0]), RnnOption.FULL),
         RnnInputBatch(list(prompts[1]))], 32
    )
    want = [None, None]
    while inp.num_token:
        out = eng.infer(inp)
        for b in range(2):
            if len(out[b]):
                want[b] = np.asarray(out[b])

    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    sp = shard_params_tp(params, mesh, info)
    deng = DistributedEngine(
        info, sp, num_batch=2, mesh=mesh, token_chunk_size=32,
        tp_mode="shard_map",
    )
    inp2 = RnnInput(
        [RnnInputBatch(list(prompts[0]), RnnOption.FULL),
         RnnInputBatch(list(prompts[1]))], 32
    )
    got = [None, None]
    while inp2.num_token:
        out = deng.infer(inp2)
        for b in range(2):
            if len(out[b]):
                got[b] = np.asarray(out[b])

    for b in range(2):
        assert got[b].shape == want[b].shape
        np.testing.assert_allclose(got[b], want[b], rtol=3e-4, atol=3e-4)

    # lane swap: reset lane 1 and run a fresh prompt — must match a fresh
    # single-device run of that prompt
    deng.reset_lane(1)
    inp3 = RnnInput([RnnInputBatch([]), RnnInputBatch([9, 3, 5])], 32)
    out3 = None
    while inp3.num_token:
        o = deng.infer(inp3)
        if len(o[1]):
            out3 = np.asarray(o[1])

    eng2 = Engine(info, params, num_batch=1, token_chunk_size=32)
    inp4 = RnnInput([RnnInputBatch([9, 3, 5])], 32)
    while inp4.num_token:
        o = eng2.infer(inp4)
        if len(o[0]):
            ref3 = np.asarray(o[0])
    np.testing.assert_allclose(out3, ref3, rtol=3e-4, atol=3e-4)


def test_vocab_converter(tmp_path):
    from web_rwkv_gguf_tpu.apps import convert_vocab
    from web_rwkv_gguf_tpu.utils.tokenizer import Tokenizer

    txt = "\n".join([
        "0 '<eos>' 5",
        "1 'a' 1",
        "2 'ab' 2",
        r"3 b'\xff\xfe' 2",
        "4 'b' 1",
    ])
    src = tmp_path / "v.txt"
    src.write_text(txt)
    out = tmp_path / "v.json"
    convert_vocab.main([str(src), "--output", str(out)])
    tok = Tokenizer.from_file(out)
    assert tok.encode("ab") == [2]
    assert tok.encode("ba") == [4, 1]
    assert tok.decode([3]) == b"\xff\xfe"
