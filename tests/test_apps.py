"""End-to-end app tests: gen / batch / inspect / serde / ppl / convert /
bench_format run against a tiny on-disk model with a byte-level vocab."""

import json
import sys

import numpy as np
import pytest

import fixtures


@pytest.fixture(scope="module")
def model_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("m")
    path = d / "tiny_v7.gguf"
    path.write_bytes(
        fixtures.make_v7_gguf(n_layer=2, n_emb=32, head_size=8, n_vocab=300)
    )
    return str(path)


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("v")
    path = d / "vocab.json"
    vocab = {str(i): [i] for i in range(256)}
    for i in range(256, 300):
        vocab[str(i)] = f"<tok{i}>"
    path.write_text(json.dumps(vocab))
    return str(path)


def test_gen_app(model_file, vocab_file, capsys):
    from web_rwkv_gguf_tpu.apps import gen

    gen.main([
        "--model", model_file, "--vocab", vocab_file,
        "--prompt", "hi", "--max-tokens", "5", "--sampler", "greedy",
        "--stop", "\x00\x00\x00",
    ])
    out = capsys.readouterr().out
    assert "hi" in out


def test_batch_app(model_file, vocab_file, capsys):
    from web_rwkv_gguf_tpu.apps import batch

    batch.main([
        "--model", model_file, "--vocab", vocab_file,
        "--prompt", "ab", "--prompt", "xyz", "--max-tokens", "4",
        "--sampler", "greedy",
    ])
    out = capsys.readouterr().out
    assert "lane 0" in out and "lane 1" in out


def test_batch_app_fused(model_file, vocab_file, capsys):
    from web_rwkv_gguf_tpu.apps import batch

    batch.main([
        "--model", model_file, "--vocab", vocab_file,
        "--prompt", "ab", "--prompt", "xyz", "--max-tokens", "4",
        "--sampler", "greedy", "--fused",
    ])
    out = capsys.readouterr().out
    assert "lane 0" in out and "lane 1" in out
    assert "8 tokens across 2 lanes" in out


def test_inspect_app(model_file, capsys):
    from web_rwkv_gguf_tpu.apps import inspect

    inspect.main([model_file, "--tensors", "--detect"])
    out = capsys.readouterr().out
    assert "gguf version: 3" in out
    assert "blk.0.time_mix_key.weight" in out
    assert "V7" in out


def test_serde_app(model_file, vocab_file, tmp_path, capsys):
    from web_rwkv_gguf_tpu.apps import serde, gen

    snap = str(tmp_path / "model.rwkvz")
    serde.main(["--model", model_file, "--quant", "int8", "--output", snap])
    # reload the snapshot through gen
    gen.main([
        "--model", snap, "--vocab", vocab_file,
        "--prompt", "ok", "--max-tokens", "3", "--sampler", "greedy",
        "--stop", "\x00\x00\x00",
    ])
    out = capsys.readouterr().out
    assert "ok" in out


def test_ppl_app(model_file, vocab_file, tmp_path, capsys):
    from web_rwkv_gguf_tpu.apps import ppl

    text = tmp_path / "t.txt"
    text.write_text("hello world, this is a test of perplexity evaluation.")
    ppl.main([
        "--model", model_file, "--vocab", vocab_file,
        "--text", str(text), "--max-tokens", "64", "--chunk", "16",
    ])
    out = capsys.readouterr().out
    assert "ppl=" in out


def test_ppl_chunking_invariant(model_file, vocab_file, tmp_path):
    """Perplexity must not depend on the evaluation chunk size (state
    carries across chunks)."""
    from web_rwkv_gguf_tpu.apps.common import load_tokenizer
    from web_rwkv_gguf_tpu.apps.ppl import evaluate_ppl
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import load_model

    tok = load_tokenizer(vocab_file)
    info, params = load_model(GgufFile(open(model_file, "rb").read()))
    text = "hello world, this is a test. " * 4
    p1, n1, c1 = evaluate_ppl(info, params, tok, text, chunk=8)
    p2, n2, c2 = evaluate_ppl(info, params, tok, text, chunk=64)
    assert c1 == c2
    np.testing.assert_allclose(n1, n2, rtol=1e-4)


def _v7_sd(C, L, HS, V, HID, D, seed=0):
    """Minimal BlinkDL-style v7 state dict for converter tests."""
    import torch

    rng = np.random.default_rng(seed)

    def t(*s, scale=0.3):
        return torch.tensor(rng.normal(size=s).astype(np.float32) * scale)

    sd = {
        "emb.weight": t(V, C),
        "blocks.0.ln0.weight": 1 + t(C, scale=0.05),
        "blocks.0.ln0.bias": t(C, scale=0.05),
        "ln_out.weight": 1 + t(C, scale=0.05),
        "ln_out.bias": t(C, scale=0.05),
        "head.weight": t(V, C),
    }
    for i in range(L):
        p = f"blocks.{i}."
        sd.update({
            p + "ln1.weight": 1 + t(C, scale=0.05),
            p + "ln1.bias": t(C, scale=0.05),
            p + "ln2.weight": 1 + t(C, scale=0.05),
            p + "ln2.bias": t(C, scale=0.05),
            **{p + f"att.x_{s}": t(1, 1, C) for s in "rwkvag"},
            p + "att.w0": t(1, 1, C),
            p + "att.w1": t(C, D),
            p + "att.w2": t(D, C),
            p + "att.a0": t(1, 1, C),
            p + "att.a1": t(C, D),
            p + "att.a2": t(D, C),
            p + "att.g1": t(C, D),
            p + "att.g2": t(D, C),
            p + "att.k_k": t(1, 1, C),
            p + "att.k_a": t(1, 1, C),
            p + "att.r_k": t(C // HS, HS),
            p + "att.key.weight": t(C, C),
            p + "att.value.weight": t(C, C),
            p + "att.receptance.weight": t(C, C),
            p + "att.output.weight": t(C, C),
            p + "att.ln_x.weight": 1 + t(C, scale=0.05),
            p + "att.ln_x.bias": t(C, scale=0.05),
            p + "ffn.x_k": t(1, 1, C),
            p + "ffn.key.weight": t(HID, C),
            p + "ffn.value.weight": t(C, HID),
        })
        if i > 0:
            sd.update({
                p + "att.v0": t(1, 1, C),
                p + "att.v1": t(C, D),
                p + "att.v2": t(D, C),
            })
    return sd


def test_convert_app(tmp_path, capsys):
    """BlinkDL-style v7 .pth → GGUF → load → forward."""
    import torch

    from web_rwkv_gguf_tpu.apps import convert
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import ModelVersion, forward_chunk, init_state, load_model

    C, L, HS, V, HID, D = 16, 2, 8, 64, 64, 4
    sd = _v7_sd(C, L, HS, V, HID, D)

    pth = tmp_path / "model.pth"
    torch.save(sd, pth)
    out = tmp_path / "model.gguf"
    convert.main([str(pth), "--output", str(out), "--outtype", "f16"])

    import jax.numpy as jnp

    info, params = load_model(GgufFile(str(out)))
    assert info.version == ModelVersion.V7
    assert info.num_head == C // HS
    x, _ = forward_chunk(
        info, params, init_state(info, 1),
        jnp.asarray([[1, 2, 3]], jnp.int32), jnp.asarray([3], jnp.int32),
    )
    assert bool(jnp.isfinite(x).all())


def test_convert_app_legacy_quant_32_block(tmp_path):
    """--outtype q5_0 on a model whose matrix row lengths are multiples
    of 32 but NOT 256 must quantize the projections (the K-quant-only
    256 gate would silently leave everything f16) and load+run through
    the direct-quantized path."""
    import torch

    from web_rwkv_gguf_tpu.apps import convert
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model

    C, L, HS, V, HID, D = 32, 2, 8, 64, 96, 4  # 96 % 256 != 0
    sd = _v7_sd(C, L, HS, V, HID, D, seed=5)
    pth = tmp_path / "model.pth"
    torch.save(sd, pth)
    out = tmp_path / "model.gguf"
    convert.main([str(pth), "--output", str(out), "--outtype", "q5_0"])

    import jax.numpy as jnp

    info, params = load_model(GgufFile(str(out)))
    wv = params["blocks"]["ffn"]["Wv"]  # [C, HID]: row length 96
    assert wv.kind == "qk_b", wv.kind
    x, _ = forward_chunk(
        info, params, init_state(info, 1),
        jnp.asarray([[1, 2, 3]], jnp.int32), jnp.asarray([3], jnp.int32),
    )
    assert bool(jnp.isfinite(x).all())


def test_convert_app_v6(tmp_path):
    """BlinkDL-style v6 .pth → GGUF → load → forward (ddlerp + decay LoRA
    transposes per the reference converter)."""
    import torch

    from web_rwkv_gguf_tpu.apps import convert
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import ModelVersion, forward_chunk, init_state, load_model

    rng = np.random.default_rng(3)
    C, L, HS, V, HID, RTM, RTD = 16, 2, 4, 48, 64, 4, 8
    H = C // HS

    def t(*s, scale=0.3):
        return torch.tensor(rng.normal(size=s).astype(np.float32) * scale)

    sd = {
        "emb.weight": t(V, C),
        "blocks.0.ln0.weight": 1 + t(C, scale=0.05),
        "blocks.0.ln0.bias": t(C, scale=0.05),
        "ln_out.weight": 1 + t(C, scale=0.05),
        "ln_out.bias": t(C, scale=0.05),
        "head.weight": t(V, C),
    }
    for i in range(L):
        p = f"blocks.{i}."
        sd.update({
            p + "ln1.weight": 1 + t(C, scale=0.05),
            p + "ln1.bias": t(C, scale=0.05),
            p + "ln2.weight": 1 + t(C, scale=0.05),
            p + "ln2.bias": t(C, scale=0.05),
            p + "att.time_maa_x": t(1, 1, C),
            **{p + f"att.time_maa_{s}": t(1, 1, C) for s in "wkvrg"},
            p + "att.time_maa_w1": t(C, 5 * RTM),     # pth layout [in, out]
            p + "att.time_maa_w2": t(5, RTM, C),
            p + "att.time_decay": t(1, 1, C),
            p + "att.time_decay_w1": t(C, RTD),
            p + "att.time_decay_w2": t(RTD, C),
            p + "att.time_faaaa": t(H, HS),
            p + "att.key.weight": t(C, C),
            p + "att.value.weight": t(C, C),
            p + "att.receptance.weight": t(C, C),
            p + "att.gate.weight": t(C, C),
            p + "att.output.weight": t(C, C),
            p + "att.ln_x.weight": 1 + t(C, scale=0.05),
            p + "att.ln_x.bias": t(C, scale=0.05),
            p + "ffn.time_maa_k": t(1, 1, C),
            p + "ffn.time_maa_r": t(1, 1, C),
            p + "ffn.key.weight": t(HID, C),
            p + "ffn.value.weight": t(C, HID),
            p + "ffn.receptance.weight": t(C, C),
        })

    pth = tmp_path / "v6.pth"
    torch.save(sd, pth)
    out = tmp_path / "v6.gguf"
    convert.main([str(pth), "--output", str(out), "--outtype", "f16"])

    import jax.numpy as jnp

    info, params = load_model(GgufFile(str(out)))
    assert info.version == ModelVersion.V6
    assert info.num_head == H
    assert info.custom.time_mix == RTM and info.custom.time_decay == RTD
    x, _ = forward_chunk(
        info, params, init_state(info, 1),
        jnp.asarray([[1, 2, 3]], jnp.int32), jnp.asarray([3], jnp.int32),
    )
    assert bool(jnp.isfinite(x).all())


def test_gen_app_fused(model_file, vocab_file, capsys):
    from web_rwkv_gguf_tpu.apps import gen

    gen.main([
        "--model", model_file, "--vocab", vocab_file,
        "--prompt", "hi", "--max-tokens", "6", "--sampler", "greedy", "--fused",
    ])
    out = capsys.readouterr().out
    assert "hi" in out


def test_chat_app_scripted(model_file, vocab_file, capsys, monkeypatch):
    """Drive the chat loop: one message, '+' retry, '-' reset, EOF."""
    import builtins

    from web_rwkv_gguf_tpu.apps import chat

    lines = iter(["hi there", "+", "-", "bye"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr(builtins, "input", fake_input)
    chat.main([
        "--model", model_file, "--vocab", vocab_file,
        "--sampler", "greedy", "--max-tokens", "6", "--fused", "0",
    ])
    out = capsys.readouterr().out
    assert "Alice:" in out
    assert "[conversation reset]" in out


def test_chat_app_default_is_fused(model_file, vocab_file, capsys,
                                   monkeypatch):
    """Round-5: chat defaults to the fused segment path for samplers the
    on-device generator supports (per-call dispatch is 7x slower over
    this environment's link); --fused 0 forces per-token dispatch."""
    import builtins

    from web_rwkv_gguf_tpu.apps import chat
    from web_rwkv_gguf_tpu.models import generate as gen_mod

    calls = []
    orig = gen_mod.make_generator

    def spy(*a, **k):
        calls.append(k.get("steps"))
        return orig(*a, **k)

    monkeypatch.setattr(gen_mod, "make_generator", spy)
    lines = iter(["hi"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr(builtins, "input", fake_input)
    chat.main([
        "--model", model_file, "--vocab", vocab_file,
        "--sampler", "greedy", "--max-tokens", "6",
    ])
    assert "Alice:" in capsys.readouterr().out
    assert calls and calls[0] == 8  # default segment, no flag passed


def test_chat_app_fused(model_file, vocab_file, capsys, monkeypatch):
    """Chat's segment-wise fused mode: on-device sampled bursts stream
    through the same loop (the DEFAULT since round 5; pinned here with
    an explicit segment size)."""
    import builtins

    from web_rwkv_gguf_tpu.apps import chat

    lines = iter(["hi there"])

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr(builtins, "input", fake_input)
    chat.main([
        "--model", model_file, "--vocab", vocab_file,
        "--sampler", "greedy", "--max-tokens", "9", "--fused", "4",
    ])
    out = capsys.readouterr().out
    assert "Alice:" in out


def test_othello_app(model_file, vocab_file, capsys):
    """Game demo: hook-modified v7 forward (a*=2, a<-act_w(w)*a) drives a
    greedy move loop (ref: examples/othello/main.rs)."""
    from web_rwkv_gguf_tpu.apps import othello

    othello.main([
        "--model", model_file, "--vocab", vocab_file,
        "--prompt", "NEXT", "--max-tokens", "4",
    ])
    out = capsys.readouterr().out
    assert "NEXT" in out


def test_puzzle15_app(vocab_file, tmp_path, capsys):
    """Game demo: hook-modified v6 forward (k <- exp(min(w,0))*k) drives a
    greedy move loop (ref: examples/puzzle15/main.rs)."""
    from web_rwkv_gguf_tpu.apps import puzzle15

    path = tmp_path / "tiny_v6.gguf"
    path.write_bytes(
        fixtures.make_v6_gguf(n_layer=2, n_emb=32, head_size=8, n_vocab=300)
    )
    puzzle15.main([
        "--model", str(path), "--vocab", vocab_file,
        "--prompt", "board", "--max-tokens", "4",
    ])
    out = capsys.readouterr().out
    assert "board" in out


def test_game_hooks_change_output(model_file):
    """The othello hooks must actually alter the forward (the hook path is
    a real structural modification, not a no-op)."""
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model
    from web_rwkv_gguf_tpu.apps.othello import make_othello_hooks

    info, params = load_model(GgufFile(model_file))
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    x0, _ = forward_chunk(info, params, init_state(info, 1), tokens, lens)
    x1, _ = forward_chunk(
        info, params, init_state(info, 1), tokens, lens,
        hooks=make_othello_hooks(info.num_layer),
    )
    assert float(jnp.abs(x0 - x1).max()) > 1e-6


def test_bench_format_app(model_file, capsys):
    """bench_format smoke: ST-vs-GGUF comparison table with real sync
    (ref: examples/bench_format.rs)."""
    from web_rwkv_gguf_tpu.apps import bench_format

    bench_format.main([
        model_file, "--prefill-tokens", "32", "--gen-tokens", "8",
        "--warmup", "1", "--runs", "2",
    ])
    out = capsys.readouterr().out
    assert "load" in out.lower() or "prefill" in out.lower()


def test_bench_kernels_app(capsys):
    """bench_kernels smoke (ref: examples/bench_q4k_shaders.rs)."""
    from web_rwkv_gguf_tpu.apps import bench_kernels

    bench_kernels.main(["--m", "64", "--k", "128", "--n", "2",
                        "--warmup", "1", "--runs", "2"])
    out = capsys.readouterr().out
    assert "q4_k" in out


def test_ppl_compare_f16(vocab_file, tmp_path, capsys):
    """The quantization-acceptance mode (VERDICT r3 #4b): direct K-quant
    vs dense f16 dequant on the SAME file, ppl delta + logit diff. On a
    synthetic Q4_K file both loads represent the same dequantized
    values, so the delta must be far inside the 0.1 acceptance bound."""
    from web_rwkv_gguf_tpu.apps import ppl
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType

    model = tmp_path / "q4k.gguf"
    model.write_bytes(fixtures.make_v7_gguf(
        n_layer=2, n_emb=64, head_size=8, n_vocab=300,
        quantize=GgmlDType.Q4_K,
    ))
    text = tmp_path / "t.txt"
    text.write_text("hello world, this is a test of perplexity evaluation.")
    ppl.main([
        "--model", str(model), "--vocab", vocab_file,
        "--text", str(text), "--max-tokens", "48", "--chunk", "16",
        "--compare-f16",
    ])
    out = capsys.readouterr().out
    assert "direct-quant" in out and "f16-dequant" in out
    assert "delta ppl" in out
    assert "PASS" in out
