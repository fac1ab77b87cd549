"""Hook system + embedding-input tests (ref: the reference's Hook enum /
Token::Embed paths)."""

import numpy as np
import jax.numpy as jnp
import pytest

from web_rwkv_gguf_tpu.gguf import GgufFile
from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model

import fixtures


@pytest.fixture(scope="module", params=["v4", "v7"])
def model(request):
    maker = {"v4": fixtures.make_v4_gguf, "v7": fixtures.make_v7_gguf}[request.param]
    reader = GgufFile(maker())
    return load_model(reader)


def test_hooked_matches_scan(model):
    """hooks={} (observation only) must reproduce the scan path exactly."""
    info, params = model
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    lens = jnp.asarray([4], jnp.int32)
    x1, s1 = forward_chunk(info, params, init_state(info, 1), tokens, lens)
    x2, s2 = forward_chunk(info, params, init_state(info, 1), tokens, lens, hooks={})
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-5)
    for k in s1:
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]), rtol=1e-5, atol=1e-5)


def test_hook_observation(model):
    info, params = model
    seen = []

    def tap(layer, **t):
        seen.append((layer, tuple(sorted(t))))
        return None

    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    forward_chunk(
        info, params, init_state(info, 1), tokens, jnp.asarray([3], jnp.int32),
        hooks={"post_att_layer_norm": tap, "post_att": tap, "post_embed": tap},
    )
    layers = [l for l, _ in seen]
    assert -1 in layers  # post_embed
    assert layers.count(0) == 2 and layers.count(1) == 2


def test_hook_modification(model):
    """A modifying hook must change the output (zero out attention of
    layer 0)."""
    info, params = model
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)

    def zero_att(layer, x):
        return {"x": jnp.where(layer == 0, jnp.zeros_like(x), x)}

    x1, _ = forward_chunk(info, params, init_state(info, 1), tokens, lens, hooks={})
    x2, _ = forward_chunk(
        info, params, init_state(info, 1), tokens, lens,
        hooks={"post_att_time_mix": zero_att},
    )
    assert float(np.abs(np.asarray(x1) - np.asarray(x2)).max()) > 1e-4


def test_input_embeds_matches_token_lookup(model):
    """Feeding raw embedding rows must equal the token-id path."""
    info, params = model
    tokens = np.array([[3, 1, 4]])
    embeds = np.asarray(params["emb"])[tokens[0]][None].astype(np.float32)
    lens = jnp.asarray([3], jnp.int32)
    x1, _ = forward_chunk(
        info, params, init_state(info, 1), jnp.asarray(tokens, jnp.int32), lens
    )
    x2, _ = forward_chunk(
        info, params, init_state(info, 1), None, lens,
        input_embeds=jnp.asarray(embeds),
    )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-5)


def test_vision_infer():
    from web_rwkv_gguf_tpu.runtime import VisionInput, infer_vision

    reader = GgufFile(fixtures.make_v7_gguf(n_emb=32, head_size=8))
    info, params = load_model(reader)
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(4, 4, 2, 3)).astype(np.float32)  # 4*4*2=32=C, N=3
    emb, state = infer_vision(info, params, VisionInput(patches))
    assert emb.shape == (32,)
    assert np.isfinite(emb).all()


@pytest.mark.parametrize("ver", ["v4", "v5", "v6", "v7"])
def test_hook_surface_complete(ver):
    """Table test: every reference Hook variant (snake_cased — v4.rs:
    307-334, v5.rs:335-364, v6.rs:367-406, v7.rs:386-421) has a working
    tap that fires during a forward+head pass, at every layer for
    per-layer taps."""
    from web_rwkv_gguf_tpu.models.forward import HOOK_NAMES, logits_head

    maker = {
        "v4": fixtures.make_v4_gguf,
        "v5": fixtures.make_v5_gguf,
        "v6": fixtures.make_v6_gguf,
        "v7": fixtures.make_v7_gguf,
    }[ver]
    info, params = load_model(GgufFile(maker()))
    names = HOOK_NAMES[info.version]

    fired: dict[str, list[int]] = {n: [] for n in names}

    def make_tap(name):
        def tap(layer, **t):
            fired[name].append(layer)
            return None
        return tap

    hooks = {n: make_tap(n) for n in names}
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    x, _ = forward_chunk(info, params, init_state(info, 1), tokens, lens,
                         hooks=hooks)
    logits_head(params, x[:, -1], hooks=hooks)

    model_level = {"post_embed_loaded", "post_embed_layer_norm", "pre_head",
                   "post_head_layer_norm", "post_head"}
    missing = [n for n in names if not fired[n]]
    assert not missing, f"taps never fired: {missing}"
    for n in names:
        if n in model_level:
            assert fired[n] == [-1], n
        else:
            assert sorted(fired[n]) == list(range(info.num_layer)), n


@pytest.mark.parametrize("ver", ["v5", "v6"])
def test_hook_modification_new_taps(ver):
    """Modifying through a newly added tap changes the output (observe AND
    modify works through the shared update mechanism)."""
    maker = {"v5": fixtures.make_v5_gguf, "v6": fixtures.make_v6_gguf}[ver]
    info, params = load_model(GgufFile(maker()))
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)

    def half_gate(layer, x, g):
        return {"g": g * 0.5}

    x1, _ = forward_chunk(info, params, init_state(info, 1), tokens, lens,
                          hooks={})
    x2, _ = forward_chunk(info, params, init_state(info, 1), tokens, lens,
                          hooks={"pre_att_gate": half_gate})
    assert float(np.abs(np.asarray(x1) - np.asarray(x2)).max()) > 1e-4
