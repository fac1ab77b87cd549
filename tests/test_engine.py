"""Engine tests: prefill+decode loop parity with direct forward calls,
mixed-batch continuous batching, FULL-option outputs, state save/restore."""

import numpy as np
import jax.numpy as jnp
import pytest

from web_rwkv_gguf_tpu.gguf import GgufFile
from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model, logits_head
from web_rwkv_gguf_tpu.runtime import Engine, RnnInput, RnnInputBatch, RnnOption, softmax

import fixtures


@pytest.fixture(scope="module")
def model():
    reader = GgufFile(fixtures.make_v7_gguf(n_layer=2, n_emb=32, head_size=8))
    return load_model(reader)


def _engine_generate(info, params, prompt, n_gen):
    eng = Engine(info, params, num_batch=1, token_chunk_size=32)
    inp = RnnInput([RnnInputBatch(list(prompt), RnnOption.LAST)], 32)
    toks = []
    logits = None
    while inp.num_token > 0:
        out = eng.infer(inp)
        if len(out[0]):
            logits = out[0][-1]
    for _ in range(n_gen):
        t = int(np.argmax(logits))
        toks.append(t)
        inp.batches[0].push(t)
        out = eng.infer(inp)
        logits = out[0][-1]
    return toks


def _direct_generate(info, params, prompt, n_gen):
    state = init_state(info, 1)
    x, state = forward_chunk(
        info, params, state,
        jnp.asarray(np.asarray(prompt)[None, :], jnp.int32),
        jnp.asarray([len(prompt)], jnp.int32),
    )
    logits = np.asarray(logits_head(params, x[:, len(prompt) - 1]))[0]
    toks = []
    for _ in range(n_gen):
        t = int(np.argmax(logits))
        toks.append(t)
        x, state = forward_chunk(
            info, params, state,
            jnp.asarray([[t]], jnp.int32), jnp.asarray([1], jnp.int32),
        )
        logits = np.asarray(logits_head(params, x[:, 0]))[0]
    return toks


def test_engine_matches_direct_generation(model):
    info, params = model
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    got = _engine_generate(info, params, prompt, 8)
    want = _direct_generate(info, params, prompt, 8)
    assert got == want


def test_engine_long_prompt_chunks(model):
    """Prompt longer than token_chunk_size: several infer calls, logits
    only on the final chunk."""
    info, params = model
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, info.num_vocab, 75))
    eng = Engine(info, params, num_batch=1, token_chunk_size=32)
    inp = RnnInput([RnnInputBatch(list(prompt), RnnOption.LAST)], 32)
    chunks_with_logits = 0
    calls = 0
    while inp.num_token > 0:
        out = eng.infer(inp)
        calls += 1
        if len(out[0]):
            chunks_with_logits += 1
            logits = out[0][-1]
    assert calls == 3  # 32 + 32 + 11
    assert chunks_with_logits == 1

    want = _direct_generate(info, params, prompt, 1)
    assert [int(np.argmax(logits))] == want


def test_engine_full_option(model):
    """FULL emits one logit row per token — e.g. for perplexity eval."""
    info, params = model
    prompt = [5, 3, 8, 2, 9]
    eng = Engine(info, params, num_batch=1, token_chunk_size=32)
    inp = RnnInput([RnnInputBatch(list(prompt), RnnOption.FULL)], 32)
    out = eng.infer(inp)
    assert out[0].shape == (5, info.num_vocab)

    # rows must equal all-position logits from a direct run
    state = init_state(info, 1)
    x, _ = forward_chunk(
        info, params, state,
        jnp.asarray(np.asarray(prompt)[None, :], jnp.int32),
        jnp.asarray([5], jnp.int32),
    )
    want = np.asarray(logits_head(params, x[0, :5]))
    np.testing.assert_allclose(out[0], want, rtol=1e-5, atol=1e-5)


def test_engine_mixed_batch_continuous(model):
    """Two lanes: one mid-prompt, one decoding — both must match their
    isolated single-lane runs."""
    info, params = model
    rng = np.random.default_rng(1)
    p1 = list(rng.integers(0, info.num_vocab, 40))
    p2 = list(rng.integers(0, info.num_vocab, 5))

    eng = Engine(info, params, num_batch=2, token_chunk_size=32)
    inp = RnnInput(
        [RnnInputBatch(list(p1)), RnnInputBatch(list(p2))], 32
    )
    logits = [None, None]
    for _ in range(10):
        if inp.num_token == 0:
            break
        out = eng.infer(inp)
        for b in range(2):
            if len(out[b]):
                logits[b] = out[b][-1]

    w1 = _direct_generate(info, params, p1, 1)
    w2 = _direct_generate(info, params, p2, 1)
    assert int(np.argmax(logits[0])) == w1[0]
    assert int(np.argmax(logits[1])) == w2[0]


def test_state_save_restore(model):
    info, params = model
    eng = Engine(info, params, num_batch=1, token_chunk_size=32)
    inp = RnnInput([RnnInputBatch([1, 2, 3, 4])], 32)
    out = eng.infer(inp)
    snap = eng.back_state(0)
    l_before = out[0][-1]

    # diverge, then restore and check the retry reproduces
    inp.batches[0].push(int(np.argmax(l_before)))
    eng.infer(inp)
    eng.load_state(0, snap)
    inp.batches[0].push(int(np.argmax(l_before)))
    out2 = eng.infer(inp)

    eng2 = Engine(info, params, num_batch=1, token_chunk_size=32)
    inp2 = RnnInput([RnnInputBatch([1, 2, 3, 4])], 32)
    o = eng2.infer(inp2)
    inp2.batches[0].push(int(np.argmax(o[0][-1])))
    out_ref = eng2.infer(inp2)
    np.testing.assert_allclose(out2[0], out_ref[0], rtol=1e-5, atol=1e-5)


def test_softmax_helper():
    x = np.array([[1.0, 2.0, 3.0]])
    p = softmax(x)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
    assert p[0, 2] > p[0, 1] > p[0, 0]


def test_engine_fused_generate(model):
    """Engine.generate (fused on-device loop) must match greedy per-token
    generation."""
    info, params = model
    prompt = [3, 1, 4, 1, 5]
    eng = Engine(info, params, num_batch=1, token_chunk_size=32)
    got = eng.generate([prompt], max_tokens=9, segment=4)[0]
    want = _direct_generate(info, params, prompt, 9)
    assert got == want


def test_engine_embed_tokens(model):
    """Token::Embed: raw embedding vectors mix with id tokens and match
    the pure-id run when the vectors are table rows."""
    info, params = model
    emb = np.asarray(params["emb"], np.float32)
    ids = [4, 9, 2, 7]

    eng1 = Engine(info, params, num_batch=1, token_chunk_size=32)
    inp1 = RnnInput([RnnInputBatch(list(ids))], 32)
    want = eng1.infer(inp1)[0][-1]

    eng2 = Engine(info, params, num_batch=1, token_chunk_size=32)
    mixed = [ids[0], emb[ids[1]], ids[2], emb[ids[3]]]
    inp2 = RnnInput([RnnInputBatch(mixed)], 32)
    got = eng2.infer(inp2)[0][-1]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_engine_with_mesh(model):
    """Engine(mesh=...) shards state/params transparently."""
    import jax
    from web_rwkv_gguf_tpu.parallel import make_mesh, shard_params

    info, params = model
    eng_ref = Engine(info, params, num_batch=1, token_chunk_size=32)
    inp = RnnInput([RnnInputBatch([1, 2, 3, 4])], 32)
    want = eng_ref.infer(inp)[0][-1]

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    sp = shard_params(params, mesh, info)
    eng = Engine(info, sp, num_batch=1, token_chunk_size=32, mesh=mesh)
    inp2 = RnnInput([RnnInputBatch([1, 2, 3, 4])], 32)
    got = eng.infer(inp2)[0][-1]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_engine_fused_generate_v4():
    """Fused generation is version-agnostic (exercise V4)."""
    info, params = load_model(GgufFile(fixtures.make_v4_gguf()))
    prompt = [3, 1, 4]
    eng = Engine(info, params, num_batch=1, token_chunk_size=32)
    got = eng.generate([prompt], max_tokens=6, segment=3)[0]
    want = _direct_generate(info, params, prompt, 6)
    assert got == want


def test_engine_full_option_across_chunks(model):
    """FULL output across multiple chunks concatenates to per-position
    logits of the whole prompt."""
    info, params = model
    rng = np.random.default_rng(5)
    prompt = list(rng.integers(0, info.num_vocab, 40))
    eng = Engine(info, params, num_batch=1, token_chunk_size=32)
    inp = RnnInput([RnnInputBatch(list(prompt), RnnOption.FULL)], 32)
    rows = []
    while inp.num_token:
        out = eng.infer(inp)
        if len(out[0]):
            rows.append(out[0])
    got = np.concatenate(rows, axis=0)
    assert got.shape == (40, info.num_vocab)

    state = init_state(info, 1)
    xs = []
    pos = 0
    st = state
    for seg in (prompt[:32], prompt[32:]):
        x, st = forward_chunk(
            info, params, st,
            jnp.asarray([seg], jnp.int32), jnp.asarray([len(seg)], jnp.int32),
        )
        xs.append(np.asarray(x[0, : len(seg)]))
    want = np.asarray(logits_head(params, jnp.asarray(np.concatenate(xs))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_generator_stochastic_sampling():
    """make_generator with temperature/top_k: the RNG key advances, token
    ids are valid, and two different keys give (almost surely) different
    streams on random weights."""
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import init_state, unroll_params
    from web_rwkv_gguf_tpu.models.generate import make_generator
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=32, head_size=8, n_vocab=64,
        lora_w=8, lora_a=8, lora_g=8, lora_v=8,
    )
    params = unroll_params(params)
    gen = make_generator(info, steps=8, temperature=0.8, top_k=5)
    state = init_state(info, 1)
    tok = jnp.zeros((1, 1), jnp.int32)
    k0 = jax.random.key(0)
    toks_a, logits, _, k1, _ = gen(params, state, tok, k0)
    assert toks_a.shape == (1, 8) and logits.shape == (1, 64)
    assert ((toks_a >= 0) & (toks_a < 64)).all()
    assert not jax.numpy.array_equal(jax.random.key_data(k0), jax.random.key_data(k1))
    toks_b, _, _, _, _ = gen(params, init_state(info, 1), tok, jax.random.key(7))
    assert not (toks_a == toks_b).all()


def test_engine_prefill_dense_matches():
    """prefill_dense=True (cached dense weights for long chunks) must
    reproduce the quantized engine's outputs to bf16-rounding tolerance
    and produce identical argmax continuations."""
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType

    info, params = load_model(GgufFile(
        fixtures.make_v7_gguf(
            n_layer=2, n_emb=64, head_size=16, n_vocab=64, n_hidden=256,
            quantize=GgmlDType.Q4_K,
        )
    ))
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8]]

    def drive(eng):
        inp = RnnInput([RnnInputBatch(list(prompts[0]))], 4)
        last = None
        while inp.num_token:
            out = eng.infer(inp)
            if len(out[0]):
                last = out[0][-1]
        return last

    l_q = drive(Engine(info, params, num_batch=1, prefill_dense=False,
                       token_chunk_size=4))
    l_d = drive(Engine(info, params, num_batch=1, prefill_dense=True,
                       prefill_dense_min_t=4, token_chunk_size=4))
    assert int(np.argmax(l_q)) == int(np.argmax(l_d))
    np.testing.assert_allclose(
        l_d, l_q, rtol=3e-2, atol=3e-2 * max(1.0, np.abs(l_q).max())
    )


def test_on_device_nucleus_sampler():
    """make_sampler(top_p): every draw lies inside the true nucleus set
    (preceding cumulative mass <= top_p, inclusive of the crossing
    token) and the empirical frequencies track the renormalized
    within-nucleus distribution."""
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models.generate import make_sampler

    # crafted distribution: probs ~ [0.4, 0.3, 0.15, ...tail]; top_p=0.6
    # keeps {0, 1, 2} (prev mass 0, 0.4, 0.7>0.6? no: prev of idx2 is
    # 0.7 -> excluded; crossing token idx1 kept since its prev 0.4<=0.6)
    p = np.asarray([0.4, 0.3, 0.15, 0.05, 0.04, 0.03, 0.02, 0.01])
    logits = jnp.asarray(np.log(p))[None, :]
    sample = make_sampler(temperature=1.0, top_p=0.6, top_p_candidates=8)
    draws = jax.vmap(lambda k: sample(logits, k)[0])(
        jax.random.split(jax.random.key(0), 4000)
    )
    draws = np.asarray(draws)
    nucleus = {0, 1}  # prev mass: 0 -> 0.0, 1 -> 0.4, 2 -> 0.7 > 0.6
    assert set(np.unique(draws)) <= nucleus
    freq0 = (draws == 0).mean()
    assert abs(freq0 - 0.4 / 0.7) < 0.05  # renormalized within nucleus


def test_sampler_small_vocab_clamps_candidates():
    """Vocab smaller than top_p_candidates (default 128) / top_k must not
    crash lax.top_k — candidates clamp to the vocab size."""
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models.generate import make_sampler

    logits = jnp.asarray(np.log([0.5, 0.3, 0.2]))[None, :]  # vocab 3
    key = jax.random.key(1)
    for kwargs in (
        {"temperature": 1.0, "top_p": 0.9},          # nucleus, cand 128 > 3
        {"temperature": 1.0, "top_k": 50},           # plain top_k > vocab
        {"temperature": 1.0, "top_p": 0.9, "top_k": 50},
    ):
        tok = np.asarray(make_sampler(**kwargs)(logits, key))
        assert tok.shape == (1,) and 0 <= tok[0] < 3


def test_fused_generator_stop_token_freezes_lane():
    """A lane that samples a stop id re-emits it, reports done, and its
    recurrent state stays frozen at the stop step (bit-identical to a
    run that halts there)."""
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import init_state, unroll_params
    from web_rwkv_gguf_tpu.models.generate import make_generator
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    info, params = synthetic_v7_params(
        n_layer=2, n_emb=32, head_size=8, n_vocab=64,
        lora_w=8, lora_a=8, lora_g=8, lora_v=8,
    )
    params = unroll_params(params)
    tok = jnp.zeros((1, 1), jnp.int32)
    key = jax.random.key(0)

    free = make_generator(info, steps=8)
    toks_free, _, _, _, done = free(params, init_state(info, 1), tok, key)
    seq = [int(t) for t in np.asarray(toks_free)[0]]
    assert not bool(np.asarray(done)[0])
    stop = seq[3]  # greedy is deterministic: this WILL appear at step 3
    first = seq.index(stop)  # may appear earlier if the model loops

    gen = make_generator(info, steps=8, stop_ids=(stop,))
    toks, _, st_stop, _, done = gen(params, init_state(info, 1), tok, key)
    seq_s = [int(t) for t in np.asarray(toks)[0]]
    assert bool(np.asarray(done)[0])
    assert seq_s[: first + 1] == seq[: first + 1]
    assert all(t == stop for t in seq_s[first:])

    # state must equal a run truncated at the stop step
    trunc = make_generator(info, steps=first + 1)
    _, _, st_ref, _, _ = trunc(params, init_state(info, 1), tok, key)
    for a, b in zip(jax.tree.leaves(st_stop), jax.tree.leaves(st_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_generate_stop_early_exit(model):
    """Engine.generate with a stop token trims at the stop and exits the
    segment loop early (max_tokens never reached)."""
    info, params = model
    eng = Engine(info, params, num_batch=1, token_chunk_size=32)
    base = eng.generate([[1, 2, 3]], 12, segment=4)
    eng2 = Engine(info, params, num_batch=1, token_chunk_size=32)
    stop = base[0][2]
    out = eng2.generate([[1, 2, 3]], 48, stop_tokens={stop}, segment=4)
    first = base[0].index(stop)
    assert out[0] == base[0][: first + 1]


def test_persistent_compilation_cache_config(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX at a disk cache (idempotent,
    env-disable honored) so warm restarts skip the 5-7 s decode compile."""
    import importlib
    import jax

    from web_rwkv_gguf_tpu.utils import compile_cache as cc

    importlib.reload(cc)
    monkeypatch.setenv("WEB_RWKV_TPU_CACHE", str(tmp_path / "c"))
    p = cc.enable_compilation_cache()
    assert p == str(tmp_path / "c")
    assert jax.config.jax_compilation_cache_dir == p
    # idempotent: second call returns the active dir, no reconfig
    assert cc.enable_compilation_cache("/elsewhere") == p

    importlib.reload(cc)
    monkeypatch.setenv("WEB_RWKV_TPU_CACHE", "0")
    assert cc.enable_compilation_cache() is None


def test_engine_decode_precise_knob():
    """Engine(decode_precise=) is PER-ENGINE (round-4 fix): the config
    global is only set for the duration of the engine's own entry
    points, so two engines with different settings coexist and the
    process default is never left mutated."""
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import load_model
    from web_rwkv_gguf_tpu.ops.pallas import config as pcfg
    from web_rwkv_gguf_tpu.runtime import Engine, RnnInput, RnnInputBatch

    info, params = load_model(GgufFile(fixtures.make_v7_gguf()))
    before = pcfg.wide_precise
    eng_f = Engine(info, params, num_batch=1, decode_precise=False)
    eng_t = Engine(info, params, num_batch=1, decode_precise=True)
    eng_n = Engine(info, params, num_batch=1)
    assert pcfg.wide_precise == before  # constructors never mutate

    seen = {}

    def spy(eng, name):
        orig = eng._forward_last

        def wrapped(*a, **k):
            seen[name] = pcfg.wide_precise
            return orig(*a, **k)

        eng._forward_last = wrapped

    spy(eng_f, "f")
    spy(eng_t, "t")
    spy(eng_n, "n")
    for eng in (eng_f, eng_t, eng_n):
        eng.infer(RnnInput([RnnInputBatch([1, 2, 3])], 16))
    # each engine's traced calls saw ITS OWN value; None saw the default
    assert seen == {"f": False, "t": True, "n": before}
    assert pcfg.wide_precise == before


def test_engine_generate_first_token_on_device_sampler():
    """The first generated token uses the same sampler semantics as the
    on-device segment loop (round-4 fix): with top_k=1 a hot
    temperature must still produce the argmax token, which the old
    host-side temperature-softmax draw ignored."""
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import load_model
    from web_rwkv_gguf_tpu.runtime import Engine

    info, params = load_model(GgufFile(fixtures.make_v7_gguf()))
    prompt = [1, 2, 3]
    eng = Engine(info, params, num_batch=1)
    greedy = eng.generate([prompt], max_tokens=2, temperature=0.0)
    eng2 = Engine(info, params, num_batch=1)
    topk1 = eng2.generate([prompt], max_tokens=2, temperature=5.0, top_k=1)
    assert topk1[0][0] == greedy[0][0]


def test_auto_prefill_dense_policy():
    """Engine(prefill_dense=None) policy: densify only when the limit
    is KNOWN to fit (reported bytes_limit, or the TPU 16 GiB floor);
    unknown memory on non-TPU backends must stay conservative — a
    guessed limit could OOM a small device at construction."""
    from web_rwkv_gguf_tpu.runtime.engine import auto_prefill_dense

    GB = 1 << 30
    # reported limit drives the decision on any platform
    assert auto_prefill_dense(1 * GB, {"bytes_limit": 16 * GB}, "gpu")
    assert not auto_prefill_dense(5 * GB, {"bytes_limit": 16 * GB}, "gpu")
    # TPU with no stats (this environment): 16 GiB floor applies
    assert auto_prefill_dense(1 * GB, {}, "tpu")
    assert auto_prefill_dense(1 * GB, None, "tpu")
    assert not auto_prefill_dense(5 * GB, {}, "tpu")
    # unknown memory off-TPU: never densify without an opt-in
    assert not auto_prefill_dense(1 * GB, {}, "gpu")
    assert not auto_prefill_dense(1 * GB, None, "cpu")
    # nothing quantized to densify
    assert not auto_prefill_dense(0, {"bytes_limit": 16 * GB}, "tpu")


def test_generate_caches_generator(model):
    """generate() must reuse one fused generator per sampling config —
    rebuilding it re-traces the whole segment scan every call (measured
    7x call overhead over the device tunnel)."""
    info, params = model
    eng = Engine(info, params, num_batch=2)
    out1 = eng.generate([[1, 2, 3], [4, 5]], 6)
    n_gen = len(eng._gen_cache)
    out2 = eng.generate([[1, 2, 3], [4, 5]], 6)
    assert len(eng._gen_cache) == n_gen == 1
    assert len(eng._sampler_cache) == 1
    assert [len(o) for o in out1] == [len(o) for o in out2]


def test_auto_decode_dense_policy():
    """Batches >= DECODE_DENSE_MIN_B auto-promote to dense bf16
    residents through the fused kernel's plain-dot branch when HBM fits
    (measured fused-vs-fused crossover vs the narrow quantized path:
    dense 15.8k vs 12.2k at B=8, 22.9k vs 16.5k at B=16); smaller
    batches and memory-tight devices stay quantized."""
    from web_rwkv_gguf_tpu.runtime.engine import (
        DECODE_DENSE_MIN_B, auto_decode_dense,
    )

    GB = 1 << 30
    stats = {"bytes_limit": 16 * GB}
    assert auto_decode_dense(DECODE_DENSE_MIN_B, 1 * GB, stats, "tpu")
    assert auto_decode_dense(16, 1 * GB, stats, "tpu")
    assert not auto_decode_dense(1, 1 * GB, stats, "tpu")
    assert not auto_decode_dense(DECODE_DENSE_MIN_B - 1, 1 * GB, stats, "tpu")
    # dense copy would not clearly fit -> stay quantized
    assert not auto_decode_dense(16, 8 * GB, stats, "tpu")
    # unknown memory off-TPU: never densify without an opt-in
    assert not auto_decode_dense(16, 1 * GB, None, "cpu")


def test_auto_decode_precise_policy():
    """High-batch engines default to the plain-bf16 rounding class (the
    reference's own f16-dequant accuracy class) — measured 16.5k vs
    13.7k tok/s at B=16 (scripts/bench_b16_dense_ab.py); smaller batches
    keep the FMA-exact process default."""
    from web_rwkv_gguf_tpu.runtime.engine import (
        DECODE_FAST_MIN_B, auto_decode_precise,
    )

    assert auto_decode_precise(1, True) is True
    assert auto_decode_precise(DECODE_FAST_MIN_B - 1, True) is True
    assert auto_decode_precise(DECODE_FAST_MIN_B, True) is False
    assert auto_decode_precise(32, True) is False
    # explicit process default propagates below the threshold
    assert auto_decode_precise(1, False) is False


def test_engine_high_batch_precision_default(model):
    """Engine(num_batch>=16) resolves decode_precise=None to the fast
    class; decode_precise=True restores FMA-exact."""
    from web_rwkv_gguf_tpu.runtime.engine import DECODE_FAST_MIN_B

    info, params = model
    eng_hi = Engine(info, params, num_batch=DECODE_FAST_MIN_B)
    eng_lo = Engine(info, params, num_batch=1)
    eng_hi_exact = Engine(info, params, num_batch=DECODE_FAST_MIN_B,
                          decode_precise=True)
    assert eng_hi._decode_precise is False
    assert eng_lo._decode_precise is True
    assert eng_hi_exact._decode_precise is True


def test_engine_decode_dense_promotion(model):
    """Engine(decode_dense=True) serves dense bf16 residents (quantized
    arrays kept as the cold copy) and matches the quantized engine's
    decode within dequant rounding."""
    from web_rwkv_gguf_tpu.models import load_model as _lm
    from web_rwkv_gguf_tpu.models.matrix import Matrix
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType

    reader = GgufFile(fixtures.make_v7_gguf(
        n_layer=2, n_emb=32, head_size=8, quantize=GgmlDType.Q8_0,
    ))
    info, params = _lm(reader)
    eng_q = Engine(info, params, num_batch=1, decode_dense=False)
    eng_d = Engine(info, params, num_batch=1, decode_dense=True)
    assert eng_d.params_quantized is params

    def kinds(tree):
        out = set()

        def walk(t):
            if isinstance(t, Matrix):
                out.add(t.kind)
            elif isinstance(t, dict):
                for v in t.values():
                    walk(v)
            elif isinstance(t, list):
                for v in t:
                    walk(v)

        walk(tree)
        return out

    assert kinds(eng_d.params.get("blocks")) == {"dense"}
    assert "dense" not in kinds(params["blocks"])

    prompt = [1, 2, 3, 4]
    toks_q = eng_q.generate([prompt], 8)
    toks_d = eng_d.generate([prompt], 8)
    # greedy tokens agree (dense vs quantized-exact paths may round
    # differently only at logit-tie granularity on this tiny model)
    assert toks_q == toks_d


def test_engine_pool_routing_and_parity(model):
    """EnginePool splits lanes into near-equal groups capped at
    lanes_per_engine, shares prepped params across engines, and its
    generate() matches a single engine lane-for-lane (greedy)."""
    from web_rwkv_gguf_tpu.runtime import EnginePool

    info, params = model
    pool = EnginePool(info, params, 5, lanes_per_engine=3,
                      decode_dense=False)
    assert pool.group_sizes == [3, 2]
    assert pool.num_lanes == 5
    # engines share the same device weight buffers (prepped once)
    p0 = pool.engines[0].params
    for eng in pool.engines[1:]:
        assert eng.params is p0

    prompts = [[1 + i, 2, 3] for i in range(5)]
    got = pool.generate(prompts, 6, segment=3)
    ref_eng = Engine(info, params, num_batch=1, decode_dense=False)
    for i, p in enumerate(prompts):
        want = ref_eng.generate([p], 6, segment=3)[0]
        assert got[i] == want, f"lane {i}"
        ref_eng.reset_state()


def test_engine_pool_shares_dense_buffers():
    """Pooled engines must share ONE set of device weight buffers: the
    pool densifies once (explicit opt-in here; the auto path resolves
    at pool level too) and every engine holds the same params object."""
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType
    from web_rwkv_gguf_tpu.runtime import EnginePool

    reader = GgufFile(fixtures.make_v7_gguf(
        n_layer=2, n_emb=32, head_size=8, quantize=GgmlDType.Q8_0,
    ))
    info, params = load_model(reader)
    pool = EnginePool(info, params, 4, lanes_per_engine=2,
                      decode_dense=True)
    assert pool.params_quantized is params
    assert len(pool.engines) == 2
    assert pool.engines[0].params is pool.engines[1].params
    # per-engine prefill caches (if any) also share buffers
    p0 = pool.engines[0]._params_prefill
    assert all(e._params_prefill is p0 for e in pool.engines)


def test_engine_pool_default_cap():
    """Default lanes_per_engine is the fused kernel's batch cap."""
    from web_rwkv_gguf_tpu.ops.pallas.layer7 import MAX_SCAN_BATCH
    from web_rwkv_gguf_tpu.runtime import EnginePool

    reader = GgufFile(fixtures.make_v7_gguf(n_layer=2, n_emb=32, head_size=8))
    info, params = load_model(reader)
    pool = EnginePool(info, params, MAX_SCAN_BATCH + 1, decode_dense=False)
    assert len(pool.engines) == 2
    assert max(pool.group_sizes) <= MAX_SCAN_BATCH
    assert sum(pool.group_sizes) == MAX_SCAN_BATCH + 1
