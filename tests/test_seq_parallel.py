"""Sequence-parallel prefill tests.

The affine-transition math gets a tight direct test; the end-to-end
comparison asserts carried state tightly but the token outputs loosely —
a recurrent net amplifies f32 reassociation differences along the
trajectory (λ ≈ 0.1/token even for tame random weights), so any
cross-algorithm output comparison degrades with T.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from web_rwkv_gguf_tpu.gguf import GgufFile
from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model
from web_rwkv_gguf_tpu.parallel import make_mesh
from web_rwkv_gguf_tpu.parallel.sequence import (
    _wkv7_transition,
    make_seq_parallel_prefill,
)
from web_rwkv_gguf_tpu.ops.wkv_chunked import wkv7_chunked

import fixtures


def test_wkv7_transition_matches_chunked_state():
    """(M, O) applied to any S0 must equal the chunked scan's final state."""
    rng = np.random.default_rng(0)
    B, T, H, K = 2, 48, 3, 8
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    r, k, v = f(B, T, H, K), f(B, T, H, K), f(B, T, H, K)
    w = jnp.asarray(
        np.exp(-0.606531 / (1 + np.exp(-rng.normal(size=(B, T, H, K))))).astype(np.float32)
    )
    kk = rng.normal(size=(B, T, H, K)).astype(np.float32)
    kk = kk / (np.linalg.norm(kk, axis=-1, keepdims=True) + 1e-9)
    a, b = jnp.asarray(-kk), jnp.asarray(kk * 0.7)

    M, O = _wkv7_transition(r, w, k, v, a, b)
    mask = jnp.ones((B, T), bool)
    for seed in (1, 2):
        S0 = jnp.asarray(np.random.default_rng(seed).normal(size=(B, H, K, K)).astype(np.float32) * 0.3)
        _, S_want = wkv7_chunked(S0, r, w, k, v, a, b, mask)
        S_got = jnp.einsum("bhij,bhjd->bhid", M, S0) + O
        np.testing.assert_allclose(
            np.asarray(S_got), np.asarray(S_want), rtol=2e-4, atol=2e-4
        )


def test_seq_parallel_prefill_matches_single():
    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_layer=2, n_emb=32, head_size=8, n_vocab=64))
    )
    B, T = 2, 128  # 4 devices × 32 tokens
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, info.num_vocab, (B, T)), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)

    state = init_state(info, B)
    x_want, st_want = forward_chunk(info, params, state, tokens, lengths)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    spf = make_seq_parallel_prefill(info, mesh, axis="model")
    x_got, st_got = spf(params, init_state(info, B), tokens)

    # carried state: the quantity that must be right for continued decode
    for k in st_want:
        np.testing.assert_allclose(
            np.asarray(st_got[k]), np.asarray(st_want[k]), rtol=1e-3, atol=1e-3,
            err_msg=k,
        )
    # outputs: early positions (before chaos amplification) must be tight;
    # the full trajectory only loosely (see module docstring)
    np.testing.assert_allclose(
        np.asarray(x_got[:, :32]), np.asarray(x_want[:, :32]), rtol=1e-3, atol=1e-3
    )
    denom = np.abs(np.asarray(x_want)).mean()
    rel = np.abs(np.asarray(x_got) - np.asarray(x_want)).mean() / denom
    assert rel < 0.02, rel


def test_seq_parallel_v4():
    """V4 sequence-parallel prefill: the static per-channel decay makes
    each device chunk an affine map on the true state value; parity vs
    the single-device serial scan (max-trick rounding differs, so
    tolerance not bit-equality)."""
    info, params = load_model(
        GgufFile(fixtures.make_v4_gguf(n_layer=2, n_emb=16, n_vocab=32))
    )
    B, T = 2, 128
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, info.num_vocab, (B, T)), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    x_want, st_want = forward_chunk(info, params, init_state(info, B), tokens, lengths)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    spf = make_seq_parallel_prefill(info, mesh, axis="model")
    x_got, st_got = spf(params, init_state(info, B), tokens)
    for k in st_want:
        np.testing.assert_allclose(
            np.asarray(st_got[k]), np.asarray(st_want[k]), rtol=1e-3, atol=1e-3,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(x_got[:, :32]), np.asarray(x_want[:, :32]), rtol=1e-3, atol=1e-3
    )


def test_seq_parallel_v6():
    """V6 sequence-parallel prefill: state parity vs single-device."""
    info, params = load_model(
        GgufFile(fixtures.make_v6_gguf(n_layer=2, n_emb=16, head_size=4, n_vocab=32))
    )
    B, T = 2, 128
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, info.num_vocab, (B, T)), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    x_want, st_want = forward_chunk(info, params, init_state(info, B), tokens, lengths)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    spf = make_seq_parallel_prefill(info, mesh, axis="model")
    x_got, st_got = spf(params, init_state(info, B), tokens)
    for k in st_want:
        np.testing.assert_allclose(
            np.asarray(st_got[k]), np.asarray(st_want[k]), rtol=1e-3, atol=1e-3,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(x_got[:, :32]), np.asarray(x_want[:, :32]), rtol=1e-3, atol=1e-3
    )


def test_seq_parallel_v5():
    info, params = load_model(
        GgufFile(fixtures.make_v5_gguf(n_layer=2, n_emb=16, head_size=4, n_vocab=32))
    )
    B, T = 2, 128
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, info.num_vocab, (B, T)), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    x_want, st_want = forward_chunk(info, params, init_state(info, B), tokens, lengths)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    spf = make_seq_parallel_prefill(info, mesh, axis="model")
    x_got, st_got = spf(params, init_state(info, B), tokens)
    for k in st_want:
        np.testing.assert_allclose(
            np.asarray(st_got[k]), np.asarray(st_want[k]), rtol=1e-3, atol=1e-3,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(x_got[:, :32]), np.asarray(x_want[:, :32]), rtol=1e-3, atol=1e-3
    )


def test_engine_seq_parallel_matches():
    """Engine(seq_parallel=True) routes full-length long chunks through
    the sequence-parallel prefill — across TWO chained chunks (pinning
    the cross-chunk boundary/shift-state carry) — and must match the
    plain Engine's final logits."""
    from web_rwkv_gguf_tpu.runtime import Engine, RnnInput, RnnInputBatch

    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_layer=2, n_emb=32, head_size=4,
                                       n_vocab=64))
    )
    rng = np.random.default_rng(7)
    prompt = [int(t) for t in rng.integers(1, 60, 256)]

    def drive(eng):
        inp = RnnInput([RnnInputBatch(list(prompt))], 128)
        last = None
        n_chunks = 0
        while inp.num_token:
            out = eng.infer(inp)
            n_chunks += 1
            if len(out[0]):
                last = out[0][-1]
        assert n_chunks == 2
        return np.asarray(last)

    want = drive(Engine(info, params, num_batch=1, token_chunk_size=128))
    mesh = make_mesh(1, 8)
    got = drive(
        Engine(info, params, num_batch=1, token_chunk_size=128, mesh=mesh,
               seq_parallel=True, seq_parallel_min_t=128)
    )
    assert int(np.argmax(got)) == int(np.argmax(want))
    np.testing.assert_allclose(
        got, want, rtol=5e-2, atol=5e-2 * max(1.0, np.abs(want).max())
    )
