"""Typed error taxonomy (ref: gguf.rs:862 GgufError, loader.rs:28
LoaderError, mod.rs:70 RuntimeError, tensor/mod.rs:128 TensorErrorKind):
every intentional failure is a WebRwkvError subclass AND still satisfies
the builtin exception contracts callers historically relied on."""

import numpy as np
import pytest

import web_rwkv_gguf_tpu as wr
from web_rwkv_gguf_tpu.gguf import GgufFile

import fixtures


def test_hierarchy_and_builtin_compat():
    assert issubclass(wr.GgufError, ValueError)
    assert issubclass(wr.TensorNotFound, KeyError)
    assert issubclass(wr.TensorNotFound, wr.GgufError)
    assert issubclass(wr.TokenizerError, ValueError)
    assert issubclass(wr.InvalidVersion, wr.LoaderError)
    assert issubclass(wr.TensorError, ValueError)
    assert issubclass(wr.EngineError, ValueError)
    assert issubclass(wr.InputExhausted, wr.EngineError)
    assert issubclass(wr.UnsupportedFeature, NotImplementedError)
    for cls in (wr.GgufError, wr.TokenizerError, wr.LoaderError,
                wr.TensorError, wr.EngineError):
        assert issubclass(cls, wr.WebRwkvError)


def test_tensor_error_kinds():
    e = wr.TensorError.batch(3, 4)
    assert e.kind == "batch" and "3" in str(e) and "4" in str(e)
    assert wr.TensorError.shape((1, 2), (2, 1)).kind == "shape"
    assert wr.TensorError.size(10, 20).kind == "size"


def test_gguf_bad_magic_is_typed():
    with pytest.raises(wr.GgufError):
        GgufFile(b"NOTG" + b"\x00" * 64)


def test_tensor_not_found_is_typed():
    f = GgufFile(fixtures.make_v7_gguf(n_layer=1, n_emb=16, head_size=4))
    with pytest.raises(wr.TensorNotFound):
        f.tensor("does.not.exist")
    with pytest.raises(KeyError):  # historical contract
        f.tensor("does.not.exist")


def test_engine_batch_mismatch_is_typed():
    from web_rwkv_gguf_tpu.models import load_model
    from web_rwkv_gguf_tpu.runtime import Engine, RnnInput, RnnInputBatch

    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_layer=1, n_emb=16, head_size=4))
    )
    eng = Engine(info, params, num_batch=2, token_chunk_size=16)
    with pytest.raises(wr.TensorError) as ei:
        eng.infer(RnnInput([RnnInputBatch([1, 2])], 16))
    assert ei.value.kind == "batch"


def test_version_detect_failure_is_typed():
    from web_rwkv_gguf_tpu.models.info import detect_info

    class Fake:
        def names(self):
            return ["not.a.rwkv.tensor", "emb.weight",
                    "blocks.0.ffn.key.weight"]

        def shape(self, n):
            return (4, 4)

        def contains(self, n):
            return n in self.names()

        def metadata(self):
            return {}

    with pytest.raises(wr.InvalidVersion):
        detect_info(Fake())
