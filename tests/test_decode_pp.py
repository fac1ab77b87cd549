"""Pipelined fused decode (parallel/decode_pp.py): the layer-scan mega
kernel split over pipeline stages must reproduce the single-device path
exactly — same kernels per stage, only the (x, v0) handoff differs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from web_rwkv_gguf_tpu.models import init_state
from web_rwkv_gguf_tpu.models.forward import GN_EPS, L2_EPS, LN_EPS, embed_tokens
from web_rwkv_gguf_tpu.ops.pallas import config as pcfg
from web_rwkv_gguf_tpu.ops.pallas.layer7 import (
    DecodeBlocks7, layer_scan7, prep_decode7,
)
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params


@pytest.fixture(autouse=True)
def _interpret_mode():
    pcfg.interpret = True
    yield
    pcfg.interpret = False


def _tiny(quant="q4k", n_layer=4):
    return synthetic_v7_params(
        n_layer=n_layer, n_emb=256, head_size=16, n_vocab=64, n_hidden=256,
        lora_w=8, lora_a=8, lora_g=16, lora_v=8, quant=quant,
    )


def _split_mega(mega, n_stages):
    """Host-side stage slices of the stacked decode blocks."""
    L = mega.static["L"]
    lps = L // n_stages
    outs = []
    for s in range(n_stages):
        arrs = {k: a[s * lps : (s + 1) * lps] for k, a in mega.arrays.items()}
        outs.append(DecodeBlocks7(arrs, {**mega.static, "L": lps}))
    return outs


@pytest.mark.parametrize("rescale,quant", [(None, "q4k"), (2, "q4k"),
                                           (None, "q6k")])
def test_layer_scan7_stage_split_matches_full(rescale, quant):
    """Running the stack as two v0-carry stage calls must equal one full
    call bit-for-bit (the same kernel runs the same layers; only the v0
    anchor and the rescale offset arrive as operands). q6k covers the
    single-field (n1f) native form under the carry."""
    B = 2
    info, params = _tiny(quant=quant)
    mega = prep_decode7(params, info)
    stages = _split_mega(mega, 2)
    lps = mega.static["L"] // 2

    state_f = init_state(info, B)
    state_s = init_state(info, B)
    mask = jnp.ones((B,), jnp.float32)
    for t in (3, 9):
        tok = (jnp.arange(B, dtype=jnp.int32)[:, None] * 7 + t) % 64
        x = embed_tokens(params, tok)[:, 0]
        xo_f, state_f = layer_scan7(mega, state_f, x, mask, rescale,
                                    LN_EPS, GN_EPS, L2_EPS)

        parts = []
        zeros = jnp.zeros_like(x)
        xo, v0 = x, zeros
        for s, smega in enumerate(stages):
            lst = jax.tree.map(lambda a: a[s * lps : (s + 1) * lps], state_s)
            meta = jnp.asarray([[1.0 if s else 0.0, float(s * lps)]])
            xo, new_lst, v0 = layer_scan7(
                smega, lst, xo, mask, rescale, LN_EPS, GN_EPS, L2_EPS,
                v0_carry=(v0, meta),
            )
            parts.append(new_lst)
        state_s = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts
        )

        np.testing.assert_array_equal(np.asarray(xo_f), np.asarray(xo))
        for kk in state_f:
            np.testing.assert_array_equal(
                np.asarray(state_f[kk]), np.asarray(state_s[kk]), err_msg=kk
            )


@pytest.mark.parametrize("version,rescale", [(6, None), (6, 2), (4, 2)])
def test_layer_scan56_stage_split_matches_full(version, rescale):
    """V4/V6: running the layer56 stack as two stage calls (with the
    global layer offset operand) must equal one full call bit-for-bit —
    the stage handoff is only the residual x."""
    from web_rwkv_gguf_tpu.ops.pallas.layer56 import layer_scan56, prep_decode56
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v56_params

    B = 2
    info, params = synthetic_v56_params(
        version=version, n_layer=4, n_emb=64, head_size=16, n_vocab=64,
        n_hidden=256, rank_tm=8, rank_td=8, quant="q4k",
    )
    mega = prep_decode56(params, info)
    assert mega is not None
    stages = _split_mega(mega, 2)
    lps = mega.static["L"] // 2

    state_f = init_state(info, B)
    state_s = init_state(info, B)
    mask = jnp.ones((B,), jnp.float32)
    for t in (3, 9):
        tok = (jnp.arange(B, dtype=jnp.int32)[:, None] * 7 + t) % 64
        x = embed_tokens(params, tok)[:, 0]
        xo_f, state_f = layer_scan56(mega, state_f, x, mask, rescale,
                                     LN_EPS, GN_EPS)

        parts = []
        xo = x
        for s, smega in enumerate(stages):
            lst = jax.tree.map(lambda a: a[s * lps : (s + 1) * lps], state_s)
            xo, new_lst = layer_scan56(
                smega, lst, xo, mask, rescale, LN_EPS, GN_EPS,
                goff=jnp.float32(s * lps),
            )
            parts.append(new_lst)
        state_s = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts
        )

        np.testing.assert_array_equal(np.asarray(xo_f), np.asarray(xo))
        for kk in state_f:
            np.testing.assert_array_equal(
                np.asarray(state_f[kk]), np.asarray(state_s[kk]), err_msg=kk
            )


@pytest.mark.parametrize("version", [6, 4])
def test_pipelined_decoder_v56(version):
    """V4/V6 pipelined fused decode end-to-end: the PipelinedDecoder
    preps mega56 itself, stage-splits the layer56 kernel, and its
    greedy stream equals the single-device greedy_scan_reference
    token-for-token."""
    from web_rwkv_gguf_tpu.models import prepare_decode
    from web_rwkv_gguf_tpu.parallel import PipelinedDecoder
    from web_rwkv_gguf_tpu.parallel.decode_pp import greedy_scan_reference
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v56_params

    S, G, B, steps = 2, 2, 2, 3
    info, params = synthetic_v56_params(
        version=version, n_layer=4, n_emb=64, head_size=16, n_vocab=64,
        n_hidden=256, rank_tm=8, rank_td=8, quant="q4k",
    )
    mesh = Mesh(np.array(jax.devices()[:S]), ("pp",))
    dec = PipelinedDecoder(info, params, mesh)  # no mega56: prepped inside
    token0 = jnp.asarray(
        (np.arange(G * B).reshape(G, B) * 7 + 1) % 64, jnp.int32
    )
    t1 = dec.generate(token0, steps)
    assert t1.shape == (G, B, steps)

    pd = prepare_decode(params, info, batch_hint=1)
    assert "mega56" in pd
    for g in range(G):
        ref, _ = greedy_scan_reference(info, pd, token0[g], steps)
        np.testing.assert_array_equal(
            np.asarray(t1[g]), np.asarray(ref), err_msg=f"g{g}"
        )


def test_pp_generator_matches_single_device():
    """Greedy pipelined generation over 4 stages == a single-device
    run of the SAME kernels, token for token, for every group. (The
    production generator's interpret-mode fallback is the composed
    path — a different rounding class whose argmax can differ on
    near-ties — so the reference is greedy_scan_reference.)"""
    from web_rwkv_gguf_tpu.parallel.decode_pp import (
        greedy_scan_reference, make_pp_generator, make_pp_params, pp_state,
    )

    S, G, B, steps = 4, 4, 2, 3
    info, params = _tiny()
    params = dict(params)
    params["mega7"] = prep_decode7(params, info)
    mesh = Mesh(np.array(jax.devices()[:S]), ("pp",))

    pp = make_pp_params(params, mesh)
    gen_pp = make_pp_generator(
        info, mesh, params["mega7"].static, n_groups=G, steps=steps,
    )
    token0 = jnp.asarray(
        (np.arange(G * B).reshape(G, B) * 5 + 3) % 64, jnp.int32
    )
    key = jax.random.PRNGKey(0)
    toks_pp, state_pp = gen_pp(pp, pp_state(info, G, B), token0, key)
    assert toks_pp.shape == (G, B, steps)

    for g in range(G):
        toks_1d, st_1d = greedy_scan_reference(info, params, token0[g], steps)
        np.testing.assert_array_equal(
            np.asarray(toks_pp[g]), np.asarray(toks_1d), err_msg=f"group {g}"
        )
        # per-group state parity: same kernels, but the two programs
        # fuse differently around the kernel (select/loop glue), so the
        # comparison is near-exact, not bit-exact (measured <= 2e-4)
        for kk in st_1d:
            np.testing.assert_allclose(
                np.asarray(state_pp[kk][:, g]), np.asarray(st_1d[kk]),
                rtol=1e-5, atol=5e-4, err_msg=f"state {kk} group {g}",
            )


def test_pp_generator_state_advances_per_group():
    """The pipelined run must leave each group with a distinct advanced
    state (groups decode independently)."""
    from web_rwkv_gguf_tpu.parallel.decode_pp import (
        make_pp_generator, make_pp_params, pp_state,
    )

    S, G, B, steps = 2, 3, 1, 2
    info, params = _tiny()
    params = dict(params)
    params["mega7"] = prep_decode7(params, info)
    mesh = Mesh(np.array(jax.devices()[:S]), ("pp",))
    pp = make_pp_params(params, mesh)
    gen = make_pp_generator(
        info, mesh, params["mega7"].static, n_groups=G, steps=steps,
    )
    token0 = jnp.asarray([[1], [7], [13]], jnp.int32)
    toks, state = gen(pp, pp_state(info, G, B), token0, jax.random.PRNGKey(1))
    wkv = np.asarray(state["wkv"])  # [L, G, B, H, K, V]
    assert np.abs(wkv).max() > 0
    assert not np.allclose(wkv[:, 0], wkv[:, 1])


def test_pipelined_decoder_api():
    """The PipelinedDecoder product surface: preps the decode blocks
    itself from loader params, carries state across generate() calls,
    and its greedy stream equals one continuous single-device greedy
    run of the same kernels (two segments == one 2x-long segment)."""
    from web_rwkv_gguf_tpu.parallel import PipelinedDecoder
    from web_rwkv_gguf_tpu.parallel.decode_pp import greedy_scan_reference

    S, G, B, steps = 2, 2, 2, 3
    info, params = _tiny(n_layer=4)
    mesh = Mesh(np.array(jax.devices()[:S]), ("pp",))

    dec = PipelinedDecoder(info, params, mesh)  # no mega7: prepped inside
    assert dec.num_stages == S
    token0 = jnp.asarray(
        (np.arange(G * B).reshape(G, B) * 7 + 1) % 64, jnp.int32
    )
    t1 = dec.generate(token0, steps)
    assert t1.shape == (G, B, steps)
    t2 = dec.generate(t1[..., -1], steps)  # state carries across calls

    params = dict(params)
    params["mega7"] = prep_decode7(params, info)
    for g in range(G):
        ref, _ = greedy_scan_reference(info, params, token0[g], 2 * steps)
        got = np.concatenate([np.asarray(t1[g]), np.asarray(t2[g])], axis=-1)
        np.testing.assert_array_equal(got, np.asarray(ref), err_msg=f"g{g}")

    # changing (G, B) with carried state must fail loudly, not with an
    # opaque jit shape error
    from web_rwkv_gguf_tpu.errors import EngineError

    with pytest.raises(EngineError, match="reset"):
        dec.generate(token0[:1], steps)

    dec.reset()
    t3 = dec.generate(token0, steps)  # fresh state == first segment
    np.testing.assert_array_equal(np.asarray(t3), np.asarray(t1))
