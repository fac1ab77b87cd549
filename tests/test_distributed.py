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
