"""Edge cases: empty inputs, gguf v2, tokenizer corners, zero-length lanes."""

import struct

import numpy as np
import pytest

from web_rwkv_gguf_tpu.gguf import GgufFile, GgufWriter
from web_rwkv_gguf_tpu.models import load_model
from web_rwkv_gguf_tpu.runtime import Engine, RnnInput, RnnInputBatch
from web_rwkv_gguf_tpu.utils.tokenizer import Tokenizer, TokenizerError

import fixtures


def test_engine_empty_input():
    info, params = load_model(GgufFile(fixtures.make_v7_gguf()))
    eng = Engine(info, params, num_batch=2, token_chunk_size=32)
    out = eng.infer(RnnInput([RnnInputBatch([]), RnnInputBatch([])], 32))
    assert len(out) == 2 and out[0].shape == (0, info.num_vocab)


def test_engine_one_empty_lane():
    info, params = load_model(GgufFile(fixtures.make_v7_gguf()))
    eng = Engine(info, params, num_batch=2, token_chunk_size=32)
    out = eng.infer(RnnInput([RnnInputBatch([1, 2, 3]), RnnInputBatch([])], 32))
    assert out[0].shape == (1, info.num_vocab)
    assert out[1].shape == (0, info.num_vocab)


def test_gguf_v2_parses():
    raw = bytearray(fixtures.make_v7_gguf())
    struct.pack_into("<I", raw, 4, 2)  # version field
    f = GgufFile(bytes(raw))
    assert f.version == 2
    assert f.contains("emb.weight")


def test_gguf_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        GgufFile(b"XXXX" + b"\x00" * 100)


def test_tokenizer_no_match():
    tok = Tokenizer({"0": "a"})
    with pytest.raises(TokenizerError, match="no matching token"):
        tok.encode("b")


def test_tokenizer_longest_match_priority():
    tok = Tokenizer({"1": "a", "2": "aa", "3": "aaa"})
    assert tok.encode("aaaa") == [3, 1]
    assert tok.decode([3, 1]) == b"aaaa"


def test_tokenizer_bytes_roundtrip():
    tok = Tokenizer({str(i): [i] for i in range(256)})
    data = bytes(range(256))
    assert tok.decode(tok.encode(data)) == data
