"""Jitted forward passes for RWKV V4..V7 over dense ``[B, T]`` chunks.

The whole layer stack runs as one ``lax.scan`` over stacked layer params
(compile time independent of depth); the WKV recurrence inside each layer
is a scan over T (``ops.wkv``, later a Pallas kernel). Padding tokens
(``t >= lengths[b]``) never touch recurrent state.

Op order mirrors the reference dispatchers exactly:
  V4 ref: src/runtime/v4.rs:630-792      V5 ref: src/runtime/v5.rs:700-885
  V6 ref: src/runtime/v6.rs:701-958      V7 ref: src/runtime/v7.rs:716-1007
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import basic as B
from ..ops import wkv as W
from .info import ModelInfo, ModelVersion

LN_EPS = 1e-5  # ref: v7.rs:47
GN_EPS = 64.0e-5  # ref: v7.rs:48
L2_EPS = 1.0e-12  # ref: v7.rs:46


# ---------------------------------------------------------------------------
# state
# ---------------------------------------------------------------------------


def init_state(info: ModelInfo, batch: int) -> dict:
    """Zero-initialized recurrent state (V4's max-trick row starts at
    f32::MIN, ref: v4.rs:152-184)."""
    L, C, H, hs = info.num_layer, info.num_emb, info.num_head, info.head_size
    f32 = jnp.float32
    if info.version == ModelVersion.V4:
        return {
            "att_shift": jnp.zeros((L, batch, C), f32),
            "aa": jnp.zeros((L, batch, C), f32),
            "bb": jnp.zeros((L, batch, C), f32),
            "pp": jnp.full((L, batch, C), W.F32_MIN, f32),
            "ffn_shift": jnp.zeros((L, batch, C), f32),
        }
    return {
        "att_shift": jnp.zeros((L, batch, C), f32),
        "wkv": jnp.zeros((L, batch, H, hs, hs), f32),
        "ffn_shift": jnp.zeros((L, batch, C), f32),
    }


# ---------------------------------------------------------------------------
# hooks
# ---------------------------------------------------------------------------


class _NoHook:
    """Zero-overhead default: hook calls vanish at trace time."""

    __slots__ = ()

    def __call__(self, name, **tensors):
        return tensors


_NOHOOK = _NoHook()


class HookCtx:
    """Per-layer hook dispatcher (the reference's Hook system,
    ref: src/runtime/v7.rs:386-421 Hook enum + hook_op; sibling enums in
    v4.rs:307-334, v5.rs:335-364, v6.rs:367-406).

    ``hooks`` maps hook names to ``fn(layer_idx, **tensors) -> dict |
    None``; returned entries replace the named tensors, so hooks can both
    observe and modify intermediates. Hook names are the reference's
    variants snake_cased (``PostAttTokenShift`` → ``post_att_token_shift``
    etc.); :data:`HOOK_NAMES` lists every tap per version. Model-level
    taps (``post_embed_loaded``, ``post_embed_layer_norm``, ``pre_head``,
    ``post_head_layer_norm``, ``post_head``) fire with layer -1;
    ``post_embed`` is a legacy alias of ``post_embed_layer_norm`` and
    ``pre_att_decay_activate`` of ``pre_att_time_decay_activate`` (V6,
    raw decay + k — used by the puzzle15 example,
    ref: examples/puzzle15/main.rs:114-116). Using hooks switches the
    layer stack from ``lax.scan`` to an unrolled trace (taps are resolved
    at trace time, like the reference builds them into the op graph).
    """

    def __init__(self, hooks: dict, layer: int):
        self.hooks = hooks
        self.layer = layer

    def __call__(self, name, **tensors):
        fn = self.hooks.get(name)
        if fn is not None:
            out = fn(self.layer, **tensors)
            if out:
                tensors.update(out)
        return tensors


# Every reference Hook variant, snake_cased, per version (the table the
# hook parity test checks). Ref enums: v4.rs:307-334 (26), v5.rs:335-364
# (28), v6.rs:367-406 (38), v7.rs:386-421 (34).
_HOOKS_COMMON = (
    "post_embed_loaded", "post_embed_layer_norm",
    "pre_att", "post_att_layer_norm",
    "pre_att_token_shift", "post_att_token_shift",
    "pre_att_linear", "post_att_linear",
    "pre_att_time_mix", "post_att_time_mix",
    "pre_att_out", "post_att_out", "post_att",
    "pre_ffn", "post_ffn_layer_norm",
    "pre_ffn_token_shift", "post_ffn_token_shift",
    "pre_ffn_linear", "post_ffn_linear", "post_ffn_activate",
    "pre_ffn_channel_mix", "post_ffn_channel_mix", "post_ffn",
    "pre_head", "post_head_layer_norm", "post_head",
)
_HOOKS_GATE = ("pre_att_gate", "post_att_gate")
HOOK_NAMES = {
    ModelVersion.V4: _HOOKS_COMMON,
    ModelVersion.V5: _HOOKS_COMMON + _HOOKS_GATE,
    ModelVersion.V6: _HOOKS_COMMON + _HOOKS_GATE + (
        "pre_att_token_shift_adapt", "post_att_token_shift_adapt",
        "post_att_token_shift_adapt_activate",
        "pre_att_gated_token_shift", "post_att_gated_token_shift",
        "pre_att_time_decay_adapt", "post_att_time_decay_adapt",
        "post_att_time_decay_adapt_activate",
        "pre_att_time_decay_activate", "post_att_time_decay_activate",
    ),
    ModelVersion.V7: _HOOKS_COMMON + _HOOKS_GATE + (
        "pre_att_adapt", "post_att_adapt",
        "pre_att_control", "post_att_control",
        "pre_att_value_residual", "post_att_value_residual",
    ),
}


# ---------------------------------------------------------------------------
# kernel selection (Pallas on TPU, XLA reference elsewhere)
# ---------------------------------------------------------------------------


def _use_pallas() -> bool:
    from ..ops.pallas import config as _pcfg

    return _pcfg.use_pallas() and not _pcfg.interpret


# prefill chunks at/above this length use the chunk-parallel (MXU)
# formulation; below it the sequential scan wins. Measured on v5e-class
# hw with host-fetch-synced timing (block_until_ready is unreliable over
# this environment's tunnel): chunked wins from T=128 (0.80x for v7,
# ~even for v6) and stays ahead through T=1024; at T<=64 the paths are
# even, and v6 seq wins at T=32.
WKV7_CHUNKED_MIN_T = 128


def _decode_wkv_xla(T: int) -> bool:
    from ..ops.pallas import config as _pcfg

    return T == 1 and _pcfg.decode_wkv_xla


def _wkv7(state, r, w, k, v, a, b, mask):
    T = r.shape[1]
    if T >= WKV7_CHUNKED_MIN_T:
        from ..ops.wkv_chunked import wkv7_chunked

        return wkv7_chunked(state, r, w, k, v, a, b, mask)
    if _decode_wkv_xla(T):
        return W.wkv7_step(state, r, w, k, v, a, b, mask)
    if _use_pallas():
        from ..ops.pallas.wkv7 import wkv7_pallas

        return wkv7_pallas(state, r, w, k, v, a, b, mask)
    return W.wkv7(state, r, w, k, v, a, b, mask)


def _wkv4(state, k, v, r, u, w, mask):
    if _decode_wkv_xla(k.shape[1]):
        return W.wkv4_step(state, k, v, r, u, w, mask)
    if _use_pallas():
        from ..ops.pallas.wkv456 import wkv4_pallas

        return wkv4_pallas(state, k, v, r, u, w, mask)
    return W.wkv4(state, k, v, r, u, w, mask)


def _wkv5(state, r, k, v, u, w, mask):
    if r.shape[1] >= WKV7_CHUNKED_MIN_T:
        from ..ops.wkv_chunked import wkv6_chunked

        wt = jnp.broadcast_to(w[None, None], r.shape)
        return wkv6_chunked(state, r, k, v, u, wt, mask)
    if _decode_wkv_xla(r.shape[1]):
        return W.wkv5_step(state, r, k, v, u, w, mask)
    if _use_pallas():
        from ..ops.pallas.wkv456 import wkv5_pallas

        return wkv5_pallas(state, r, k, v, u, w, mask)
    return W.wkv5(state, r, k, v, u, w, mask)


def _wkv6(state, r, k, v, u, w, mask):
    if r.shape[1] >= WKV7_CHUNKED_MIN_T:
        from ..ops.wkv_chunked import wkv6_chunked

        return wkv6_chunked(state, r, k, v, u, w, mask)
    if _decode_wkv_xla(r.shape[1]):
        return W.wkv6_step(state, r, k, v, u, w, mask)
    if _use_pallas():
        from ..ops.pallas.wkv456 import wkv6_pallas

        return wkv6_pallas(state, r, k, v, u, w, mask)
    return W.wkv6(state, r, k, v, u, w, mask)


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def embed_tokens(params: dict, tokens: jax.Array) -> jax.Array:
    """Token ids → ln0-normalized embeddings in f32 (ref: v7.rs:649-660)."""
    x = params["emb"][tokens].astype(jnp.float32)
    return B.layer_norm(x, params["ln0"]["w"], params["ln0"]["b"], LN_EPS)


def logits_head(params: dict, x: jax.Array, hooks: dict | None = None) -> jax.Array:
    """Final LN + head matmul on selected rows (ref: v7.rs:1009-1036).

    ``hooks`` taps ``post_head_layer_norm`` / ``post_head`` (layer -1);
    ``pre_head`` fires at the end of :func:`forward_chunk` on the full
    residual stream."""
    hk = HookCtx(hooks, -1) if hooks else _NOHOOK
    x = B.layer_norm(x, params["ln_out"]["w"], params["ln_out"]["b"], LN_EPS)
    x = hk("post_head_layer_norm", x=x)["x"]
    logits = params["head"].matmul(x)
    return hk("post_head", x=logits)["x"]


def _trim_hidden(kf, wv):
    """Slice the ffn key activation to Wv's contraction width — the key
    matrix may carry tile-padded zero rows (loader.pad_matrix_rows).
    Wrapped matrices without a shape (TP adapters) are never padded."""
    if hasattr(wv, "dims"):
        kn = wv.dims()[1]
    elif hasattr(wv, "shape"):
        kn = wv.shape[-1]
    else:
        return kf
    return kf[..., :kn] if kf.shape[-1] != kn else kf


def _ffn_v4(ffn, x, shift, mask, lengths, hk=_NOHOOK):
    """Shared V4/V5 FFN: sq-relu key, sigmoid(r) gate
    (ref: v4.rs:725-785, channel_mix.wgsl:101-107)."""
    x = hk("pre_ffn_token_shift", x=x)["x"]
    kx = B.token_shift(x, shift, ffn["mix_k"], reversed_mix=False)
    rx = B.token_shift(x, shift, ffn["mix_r"], reversed_mix=False)
    t = hk("post_ffn_token_shift", kx=kx, rx=rx)
    t = hk("pre_ffn_linear", kx=t["kx"], rx=t["rx"])
    kx, rx = t["kx"], t["rx"]
    k_lin = ffn["Wk"].matmul(kx)
    r = ffn["Wr"].matmul(rx)
    t = hk("post_ffn_linear", k=k_lin, r=r)
    k_lin, r = t["k"], t["r"]
    k = _trim_hidden(B.squared_relu(k_lin), ffn["Wv"])
    k = hk("post_ffn_activate", k=k)["k"]
    v = ffn["Wv"].matmul(k)
    t = hk("pre_ffn_channel_mix", r=r, v=v)
    out = jax.nn.sigmoid(t["r"]) * t["v"]
    out = hk("post_ffn_channel_mix", x=out)["x"]
    new_shift = B.update_shift_state(x, lengths, shift)
    return out, new_shift


def _v_width(blocks) -> int:
    """Output width of the value projection — equals C single-device, or
    the local shard width under tensor parallelism (the value-residual
    carry v0 must match v's local width)."""
    att = blocks[0]["att"] if isinstance(blocks, list) else blocks["att"]
    wv = att["Wv"]
    return wv.dims()[0] if hasattr(wv, "dims") else wv.shape[-2]


def _heads(x, H):
    return x.reshape(x.shape[0], x.shape[1], H, -1)


def _flat(x):
    return x.reshape(x.shape[0], x.shape[1], -1)


# ---------------------------------------------------------------------------
# per-version layer bodies. Each takes (x [B,T,C] f32 residual, layer params,
# layer state, mask [B,T], lengths [B]) and returns (x, new layer state).
# ---------------------------------------------------------------------------


def _layer_v4(info, blk, lst, x, mask, lengths, hk=_NOHOOK):
    att, ffn = blk["att"], blk["ffn"]
    x = hk("pre_att", x=x)["x"]
    xx = B.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], LN_EPS)
    xx = hk("post_att_layer_norm", x=xx)["x"]
    xx = hk("pre_att_token_shift", x=xx)["x"]
    kx = B.token_shift(xx, lst["att_shift"], att["mix_k"], reversed_mix=False)
    vx = B.token_shift(xx, lst["att_shift"], att["mix_v"], reversed_mix=False)
    rx = B.token_shift(xx, lst["att_shift"], att["mix_r"], reversed_mix=False)
    t = hk("post_att_token_shift", kx=kx, vx=vx, rx=rx)
    t = hk("pre_att_linear", kx=t["kx"], vx=t["vx"], rx=t["rx"])
    kx, vx, rx = t["kx"], t["vx"], t["rx"]
    k = att["Wk"].matmul(kx)
    v = att["Wv"].matmul(vx)
    r = att["Wr"].matmul(rx)
    t = hk("post_att_linear", k=k, v=v, r=r)
    t = hk("pre_att_time_mix", k=t["k"], v=t["v"], r=t["r"])
    k, v, r = t["k"], t["v"], t["r"]
    state4 = jnp.stack([lst["aa"], lst["bb"], lst["pp"]], axis=-1)
    y, state4 = _wkv4(state4, k, v, r, att["time_first"], att["time_decay"], mask)
    y = hk("post_att_time_mix", x=y)["x"]
    y = hk("pre_att_out", x=y)["x"]
    dx = att["Wo"].matmul(y)
    dx = hk("post_att_out", x=dx)["x"]
    x = x + dx
    x = hk("post_att", x=x)["x"]

    x = hk("pre_ffn", x=x)["x"]
    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    xx2 = hk("post_ffn_layer_norm", x=xx2)["x"]
    out, ffn_shift = _ffn_v4(ffn, xx2, lst["ffn_shift"], mask, lengths, hk)
    x = x + out
    x = hk("post_ffn", x=x)["x"]

    new = {
        "att_shift": B.update_shift_state(xx, lengths, lst["att_shift"]),
        "aa": state4[..., 0],
        "bb": state4[..., 1],
        "pp": state4[..., 2],
        "ffn_shift": ffn_shift,
    }
    return x, new


def _layer_v5(info, blk, lst, x, mask, lengths, hk=_NOHOOK):
    H = info.num_head
    att, ffn = blk["att"], blk["ffn"]
    x = hk("pre_att", x=x)["x"]
    xx = B.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], LN_EPS)
    xx = hk("post_att_layer_norm", x=xx)["x"]
    sh = lst["att_shift"]
    xx = hk("pre_att_token_shift", x=xx)["x"]
    kx = B.token_shift(xx, sh, att["mix_k"], reversed_mix=False)
    vx = B.token_shift(xx, sh, att["mix_v"], reversed_mix=False)
    rx = B.token_shift(xx, sh, att["mix_r"], reversed_mix=False)
    gx = B.token_shift(xx, sh, att["mix_g"], reversed_mix=False)
    t = hk("post_att_token_shift", kx=kx, vx=vx, rx=rx, gx=gx)
    t = hk("pre_att_linear", kx=t["kx"], vx=t["vx"], rx=t["rx"], gx=t["gx"])
    kx, vx, rx, gx = t["kx"], t["vx"], t["rx"], t["gx"]
    k = att["Wk"].matmul(kx)
    v = att["Wv"].matmul(vx)
    r = att["Wr"].matmul(rx)
    g = att["Wg"].matmul(gx)
    t = hk("post_att_linear", k=k, v=v, r=r, g=g)
    t = hk("pre_att_time_mix", k=t["k"], v=t["v"], r=t["r"], g=t["g"])
    k, v, r, g = (_heads(t["k"], H), _heads(t["v"], H), _heads(t["r"], H),
                  t["g"])
    y, wkv = _wkv5(lst["wkv"], r, k, v, att["time_first"], att["time_decay"], mask)
    y = B.group_norm(_flat(y), att["gn"]["w"], att["gn"]["b"], H, GN_EPS)
    y = hk("post_att_time_mix", x=y)["x"]
    t = hk("pre_att_gate", x=y, g=g)
    y = t["x"] * jax.nn.silu(t["g"])
    y = hk("post_att_gate", x=y)["x"]
    y = hk("pre_att_out", x=y)["x"]
    dx = att["Wo"].matmul(y)
    dx = hk("post_att_out", x=dx)["x"]
    x = x + dx
    x = hk("post_att", x=x)["x"]

    x = hk("pre_ffn", x=x)["x"]
    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    xx2 = hk("post_ffn_layer_norm", x=xx2)["x"]
    out, ffn_shift = _ffn_v4(ffn, xx2, lst["ffn_shift"], mask, lengths, hk)
    x = x + out
    x = hk("post_ffn", x=x)["x"]

    new = {
        "att_shift": B.update_shift_state(xx, lengths, sh),
        "wkv": wkv,
        "ffn_shift": ffn_shift,
    }
    return x, new


def _layer_v6(info, blk, lst, x, mask, lengths, hk=_NOHOOK):
    H = info.num_head
    att, ffn = blk["att"], blk["ffn"]
    x = hk("pre_att", x=x)["x"]
    xx = B.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], LN_EPS)
    xx = hk("post_att_layer_norm", x=xx)["x"]
    sh = lst["att_shift"]

    # data-dependent 5-way lerp (ddlerp), ref: v6.rs:769-803
    xx = hk("pre_att_token_shift", x=xx)["x"]
    sx = B.token_shift(xx, sh, att["mix_x"], reversed_mix=True)
    sx = hk("post_att_token_shift", x=sx)["x"]
    sx = hk("pre_att_token_shift_adapt", x=sx)["x"]
    z = jnp.einsum(
        "btc,fc->btf", sx.astype(att["tm_w1"].dtype), att["tm_w1"],
        preferred_element_type=jnp.float32,
    )  # [B,T,5r]
    z = hk("post_att_token_shift_adapt", x=z)["x"]
    z = jnp.tanh(z)
    z = hk("post_att_token_shift_adapt_activate", x=z)["x"]
    r5 = att["tm_w1"].shape[0] // 5
    z = z.reshape(z.shape[0], z.shape[1], 5, r5)
    mix = jnp.einsum(
        "btfr,fcr->btfc", z.astype(att["tm_w2"].dtype), att["tm_w2"],
        preferred_element_type=jnp.float32,
    ) + att["time_mix"][None, None]  # [B,T,5,C]
    mix = hk("pre_att_gated_token_shift", mix=mix)["mix"]

    def shift_with(m):
        return B.token_shift(xx, sh, m, reversed_mix=True)

    wx = shift_with(mix[:, :, 0])
    kx = shift_with(mix[:, :, 1])
    vx = shift_with(mix[:, :, 2])
    rx = shift_with(mix[:, :, 3])
    gx = shift_with(mix[:, :, 4])
    t = hk("post_att_gated_token_shift", wx=wx, kx=kx, vx=vx, rx=rx, gx=gx)
    t = hk("pre_att_linear", wx=t["wx"], kx=t["kx"], vx=t["vx"], rx=t["rx"],
           gx=t["gx"])
    wx, kx, vx, rx, gx = t["wx"], t["kx"], t["vx"], t["rx"], t["gx"]

    k = att["Wk"].matmul(kx)
    v = att["Wv"].matmul(vx)
    r = att["Wr"].matmul(rx)
    g = att["Wg"].matmul(gx)
    t = hk("post_att_linear", k=k, v=v, r=r, g=g)
    k, v, r, g = _heads(t["k"], H), _heads(t["v"], H), _heads(t["r"], H), t["g"]

    # decay LoRA + StableExp (ref: v6.rs:831-849)
    wx = hk("pre_att_time_decay_adapt", x=wx)["x"]
    dz = jnp.einsum(
        "btc,dc->btd", wx.astype(att["td_w1"].dtype), att["td_w1"],
        preferred_element_type=jnp.float32,
    )
    dz = hk("post_att_time_decay_adapt", x=dz)["x"]
    dz = jnp.tanh(dz)
    dz = hk("post_att_time_decay_adapt_activate", x=dz)["x"]
    w_raw = jnp.einsum(
        "btd,cd->btc", dz.astype(att["td_w2"].dtype), att["td_w2"],
        preferred_element_type=jnp.float32,
    ) + att["time_decay"][None, None]
    # raw (pre-StableExp) decay and k exposed for hooks (the reference's
    # puzzle15 example does k <- exp(min(w,0))*k at
    # Hook::PreAttTimeDecayActivate, examples/puzzle15/main.rs:114-116);
    # "pre_att_decay_activate" is this repo's legacy alias for the same tap
    t = hk("pre_att_decay_activate", w=w_raw, k=k)
    t = hk("pre_att_time_decay_activate", w=t["w"], k=t["k"])
    w_raw, k = t["w"], t["k"]
    w = _heads(B.stable_exp(w_raw), H)
    w = hk("post_att_time_decay_activate", w=w)["w"]

    t = hk("pre_att_time_mix", r=r, k=k, v=v, w=w)
    r, k, v, w = t["r"], t["k"], t["v"], t["w"]
    y, wkv = _wkv6(lst["wkv"], r, k, v, att["time_first"], w, mask)
    y = B.group_norm(_flat(y), att["gn"]["w"], att["gn"]["b"], H, GN_EPS)
    y = hk("post_att_time_mix", x=y)["x"]
    t = hk("pre_att_gate", x=y, g=g)
    y = t["x"] * jax.nn.silu(t["g"])
    y = hk("post_att_gate", x=y)["x"]
    y = hk("pre_att_out", x=y)["x"]
    dx = att["Wo"].matmul(y)
    dx = hk("post_att_out", x=dx)["x"]
    x = x + dx
    x = hk("post_att", x=x)["x"]

    x = hk("pre_ffn", x=x)["x"]
    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    xx2 = hk("post_ffn_layer_norm", x=xx2)["x"]
    xx2 = hk("pre_ffn_token_shift", x=xx2)["x"]
    kx2 = B.token_shift(xx2, lst["ffn_shift"], ffn["mix_k"], reversed_mix=True)
    rx2 = B.token_shift(xx2, lst["ffn_shift"], ffn["mix_r"], reversed_mix=True)
    t = hk("post_ffn_token_shift", kx=kx2, rx=rx2)
    t = hk("pre_ffn_linear", kx=t["kx"], rx=t["rx"])
    kx2, rx2 = t["kx"], t["rx"]
    k_lin = ffn["Wk"].matmul(kx2)
    rf = ffn["Wr"].matmul(rx2)
    t = hk("post_ffn_linear", k=k_lin, r=rf)
    k_lin, rf = t["k"], t["r"]
    kf = _trim_hidden(B.squared_relu(k_lin), ffn["Wv"])
    kf = hk("post_ffn_activate", k=kf)["k"]
    vf = ffn["Wv"].matmul(kf)
    t = hk("pre_ffn_channel_mix", r=rf, v=vf)
    out = jax.nn.sigmoid(t["r"]) * t["v"]
    out = hk("post_ffn_channel_mix", x=out)["x"]
    x = x + out
    x = hk("post_ffn", x=x)["x"]

    new = {
        "att_shift": B.update_shift_state(xx, lengths, sh),
        "wkv": wkv,
        "ffn_shift": B.update_shift_state(xx2, lengths, lst["ffn_shift"]),
    }
    return x, new


def _lora(x_in, w_a, w_b, mid_act=None):
    # adapters are stored in the model compute dtype (bf16 by default,
    # like the reference's f16 adapter matmuls); accumulate in f32
    z = jnp.einsum(
        "btc,dc->btd", x_in.astype(w_a.dtype), w_a,
        preferred_element_type=jnp.float32,
    )
    if mid_act is not None:
        z = mid_act(z)
    return jnp.einsum(
        "btd,cd->btc", z.astype(w_b.dtype), w_b,
        preferred_element_type=jnp.float32,
    )


def _lora_stacked(att, wx, ax, gx, vx):
    """All four V7 inner adapters (w/a/g/v) in TWO MXU dots instead of
    eight: the shifted inputs stack to ``[B, T, 4, C]``, contract against
    the row-concatenated down matrix ``[D, C]``, and the cross-adapter
    blocks of the mid activations are masked to exact zeros so the
    column-concatenated up matrix ``[C, D]`` reproduces each adapter's
    individual output exactly (0·w contributions vanish in the f32
    accumulation). Mid activations: tanh for w, sigmoid for g
    (ref: v7.rs:829-874). Returns (w_lora, a_lora, g, v_mix_pre)."""
    down, up = att["lora_down"], att["lora_up"]
    dims = [att[k].shape[-2] for k in ("w1", "a1", "g1", "v1")]
    D = down.shape[-2]
    bounds = np.cumsum([0] + dims)
    mask = np.zeros((4, D), np.float32)
    for i in range(4):
        mask[i, bounds[i] : bounds[i + 1]] = 1.0
    xs = jnp.stack([wx, ax, gx, vx], axis=2)  # [B, T, 4, C]
    z = jnp.einsum(
        "btsc,dc->btsd", xs.astype(down.dtype), down,
        preferred_element_type=jnp.float32,
    )
    sel = jnp.arange(4).reshape(4, 1)
    za = jnp.where(sel == 0, jnp.tanh(z), z)
    za = jnp.where(sel == 2, jax.nn.sigmoid(za), za)
    za = za * jnp.asarray(mask)
    out = jnp.einsum(
        "btsd,cd->btsc", za.astype(up.dtype), up,
        preferred_element_type=jnp.float32,
    )
    return out[:, :, 0], out[:, :, 1], out[:, :, 2], out[:, :, 3]


def _v7_adapters(att, wx, ax, gx, vx):
    """Inner-LoRA adapter outputs (w_lora, a_lora, g, v_mix_pre); the
    stacked two-dot form applies at decode-sized chunks."""
    if "lora_down" in att and wx.shape[0] * wx.shape[1] <= 16:
        return _lora_stacked(att, wx, ax, gx, vx)
    w_lo = _lora(wx, att["w1"], att["w2"], jnp.tanh)
    a_lo = _lora(ax, att["a1"], att["a2"])
    g = _lora(gx, att["g1"], att["g2"], jax.nn.sigmoid)
    vm = _lora(vx, att["v1"], att["v2"])
    return w_lo, a_lo, g, vm


def _v7_value_residual(att, vm, v, v0, layer_idx):
    """Value residual from layer 0 (ref: v7.rs:895-921); ``vm`` is the
    raw v-adapter output (pre-sigmoid)."""
    v_mix = jax.nn.sigmoid(att["v0"][None, None] + vm)
    v_res = v + v_mix * (v0 - v)
    is_first = layer_idx == 0
    v = jnp.where(is_first, v, v_res)
    v0 = jnp.where(is_first, v, v0)
    return v, v0


def _v7_mix_inputs(att, H, rx, wx, kx, vx, ax, gx, v0, layer_idx, hk=_NOHOOK):
    """Projections + inner-LoRA adapters + control-k + value residual:
    the shared middle of the V7 attention block (used by both the
    standard and the sequence-parallel layer)."""
    t = hk("pre_att_linear", rx=rx, kx=kx, vx=vx)
    rx, kx, vx = t["rx"], t["kx"], t["vx"]
    r = att["Wr"].matmul(rx)
    k = att["Wk"].matmul(kx)
    v = att["Wv"].matmul(vx)
    t = hk("post_att_linear", r=r, k=k, v=v)
    r, k, v = t["r"], t["k"], t["v"]

    t = hk("pre_att_adapt", wx=wx, ax=ax, gx=gx, vx=vx)
    w_lo, a_lo, g, vm = _v7_adapters(att, t["wx"], t["ax"], t["gx"], t["vx"])
    w_in = att["w0"][None, None] + w_lo
    a = jax.nn.sigmoid(att["a0"][None, None] + a_lo)
    t = hk("post_att_adapt", w=w_in, a=a, g=g)
    w_in, a, g = t["w"], t["a"], t["g"]

    t = hk("pre_att_control", k=k, a=a, w=w_in)
    k, a, w_in = t["k"], t["a"], t["w"]
    kk = _flat(B.l2_normalize(_heads(k * att["k_k"][None, None], H), L2_EPS))
    k = k * (1.0 + (a - 1.0) * att["k_a"][None, None])  # ref: control_k_v7.wgsl:73
    # ``a`` and raw ``w`` are exposed here so hooks can modify the WKV
    # b-term after k-control (the reference's othello example does
    # a <- act_w(w)*a at Hook::PostAttControl, examples/othello/main.rs:113)
    t = hk("post_att_control", k=k, kk=kk, a=a, w=w_in)
    k, kk, a = t["k"], t["kk"], t["a"]

    v = hk("pre_att_value_residual", v=v)["v"]
    v, v0 = _v7_value_residual(att, vm, v, v0, layer_idx)
    v = hk("post_att_value_residual", v=v)["v"]

    w_dec = W.wkv7_act_w(w_in)
    rh, wh, kh, vh = (_heads(t_, H) for t_ in (r, w_dec, k, v))
    kkh = _heads(kk, H)
    t = hk("pre_att_time_mix", r=rh, w=wh, k=kh, v=vh, a=-kkh,
           b=kkh * _heads(a, H))
    return t["r"], t["w"], t["k"], t["v"], t["a"], t["b"], g, v0


def _fused_att_core_ok(hk, B, T, att) -> bool:
    """The fused decode attention core (one Pallas launch for WKV step +
    group_norm + bonus + gate) applies at single-lane decode with no
    hooks between time-mix and gate, on quantized layers. At B>1 the
    kernel's un-pipelined state DMA loses to the XLA composition
    (scripts/bench_att_core.py: 1.9x at B=1, 0.5-0.9x at B=2..8); on
    dense layers XLA fuses the whole composition into the surrounding
    dense matmuls and the extra kernel boundary measures net-negative
    (1795 -> 1714 tok/s on the bf16 0.1B)."""
    if T != 1 or B != 1:
        return False
    if not (hk is _NOHOOK or not hk.hooks):
        return False
    if getattr(att.get("Wo"), "kind", "dense") == "dense":
        return False
    from ..ops.pallas import config as _pcfg

    return _pcfg.use_pallas()


def _layer_v7(info, blk, lst, x, v0, layer_idx, mask, lengths, hk=_NOHOOK):
    H = info.num_head
    att, ffn = blk["att"], blk["ffn"]
    x = hk("pre_att", x=x)["x"]
    xx = B.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], LN_EPS)
    xx = hk("post_att_layer_norm", x=xx)["x"]
    xx = hk("pre_att_token_shift", x=xx)["x"]
    sh = lst["att_shift"]

    if "x_stack" in att:
        # one fused lerp for all six shifts (r,w,k,v,a,g order)
        sx6 = B.token_shift_multi(xx, sh, att["x_stack"])
        rx, wx, kx, vx, ax, gx = (sx6[:, :, i] for i in range(6))
    else:
        rx = B.token_shift(xx, sh, att["x_r"], reversed_mix=True)
        wx = B.token_shift(xx, sh, att["x_w"], reversed_mix=True)
        kx = B.token_shift(xx, sh, att["x_k"], reversed_mix=True)
        vx = B.token_shift(xx, sh, att["x_v"], reversed_mix=True)
        ax = B.token_shift(xx, sh, att["x_a"], reversed_mix=True)
        gx = B.token_shift(xx, sh, att["x_g"], reversed_mix=True)
    t = hk("post_att_token_shift", rx=rx, wx=wx, kx=kx, vx=vx, ax=ax, gx=gx)
    rx, wx, kx, vx, ax, gx = t["rx"], t["wx"], t["kx"], t["vx"], t["ax"], t["gx"]

    if _fused_att_core_ok(hk, x.shape[0], x.shape[1], att):
        # raw projections + adapters only; activation/l2-norm/control-k/
        # WKV/group-norm/bonus/gate all run inside one Pallas launch
        from ..ops.pallas.wkv7 import att_core7_step

        if "Wrkv_g" in att:
            from ..ops.pallas.matmul import quant_gemv_grouped

            mdim, kdim_c = att["Wr"].dims()
            xs = jnp.stack([rx[:, 0], kx[:, 0], vx[:, 0]]).astype(jnp.bfloat16)
            rkv = quant_gemv_grouped(xs, att["Wr"].kind, att["Wrkv_g"],
                                     mdim, kdim_c)
            r, k, v = (rkv[i][:, None] for i in range(3))
        else:
            r = att["Wr"].matmul(rx)
            k = att["Wk"].matmul(kx)
            v = att["Wv"].matmul(vx)
        w_lo, a_lo, g, vm = _v7_adapters(att, wx, ax, gx, vx)
        w_in = att["w0"][None, None] + w_lo
        a_in = att["a0"][None, None] + a_lo
        v, v0 = _v7_value_residual(att, vm, v, v0, layer_idx)
        hs = att["r_k"].shape[-1]
        y1, wkv = att_core7_step(
            lst["wkv"], _heads(r, H)[:, 0], _heads(w_in, H)[:, 0],
            _heads(k, H)[:, 0], _heads(v, H)[:, 0], _heads(a_in, H)[:, 0],
            _heads(g, H)[:, 0], att["k_k"].reshape(H, hs),
            att["k_a"].reshape(H, hs), att["gn"]["w"].reshape(H, -1),
            att["gn"]["b"].reshape(H, -1), att["r_k"], mask[:, 0],
            GN_EPS, L2_EPS,
        )
        y = y1.reshape(x.shape[0], 1, -1)
    else:
        rh, wh, kh, vh, ah, bh, g, v0 = _v7_mix_inputs(
            att, H, rx, wx, kx, vx, ax, gx, v0, layer_idx, hk
        )
        y, wkv = _wkv7(lst["wkv"], rh, wh, kh, vh, ah, bh, mask)
        y = B.group_norm(_flat(y), att["gn"]["w"], att["gn"]["b"], H, GN_EPS)
        y = y + _flat(W.wkv7_bonus(rh, kh, vh, att["r_k"]))
        y = hk("post_att_time_mix", x=y)["x"]
        t = hk("pre_att_gate", x=y, g=g)
        y = t["x"] * t["g"]
        y = hk("post_att_gate", x=y)["x"]
    y = hk("pre_att_out", x=y)["x"]
    dx = att["Wo"].matmul(y)
    dx = hk("post_att_out", x=dx)["x"]
    x = x + dx
    x = hk("post_att", x=x)["x"]

    x = hk("pre_ffn", x=x)["x"]
    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    xx2 = hk("post_ffn_layer_norm", x=xx2)["x"]
    xx2 = hk("pre_ffn_token_shift", x=xx2)["x"]
    kx2 = B.token_shift(xx2, lst["ffn_shift"], ffn["x_k"], reversed_mix=True)
    kx2 = hk("post_ffn_token_shift", kx=kx2)["kx"]
    kx2 = hk("pre_ffn_linear", kx=kx2)["kx"]
    k_lin = ffn["Wk"].matmul(kx2)
    k_lin = hk("post_ffn_linear", k=k_lin)["k"]
    kf = _trim_hidden(B.squared_relu(k_lin), ffn["Wv"])
    kf = hk("post_ffn_activate", k=kf)["k"]
    vf = ffn["Wv"].matmul(kf)
    # channel_mix_v7: out = v (ref: channel_mix.wgsl:101-102)
    vf = hk("pre_ffn_channel_mix", v=vf)["v"]
    vf = hk("post_ffn_channel_mix", x=vf)["x"]
    x = x + vf
    x = hk("post_ffn", x=x)["x"]

    new = {
        "att_shift": B.update_shift_state(xx, lengths, sh),
        "wkv": wkv,
        "ffn_shift": B.update_shift_state(xx2, lengths, lst["ffn_shift"]),
    }
    return x, v0, new


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------


def forward_chunk(
    info: ModelInfo,
    params: dict,
    state: dict,
    tokens: jax.Array,  # [B, T] int32
    lengths: jax.Array,  # [B] int32 valid token counts
    *,
    rescale: int | None = None,
    hooks: dict | None = None,
    input_embeds: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    """Run one chunk through all layers.

    Returns ``(x, new_state)`` where ``x`` is the final residual stream
    ``[B, T, C]`` in f32 (apply :func:`logits_head` to selected rows to
    get logits). ``rescale`` halves the residual every N layers for
    parity with reference rescaled loads (ref: v7.rs:1002-1004).

    ``hooks`` (see :class:`HookCtx`) switches to an unrolled layer loop
    with observation/modification taps. ``input_embeds`` [B, T, C]
    replaces the token-id embedding lookup (the reference's
    ``Token::Embed`` / vision path, ref: src/runtime/infer/mod.rs:21-56);
    ln0 is still applied.
    """
    if input_embeds is not None:
        T = input_embeds.shape[1]
        x0 = input_embeds.astype(jnp.float32)
    else:
        T = tokens.shape[1]
        x0 = params["emb"][tokens].astype(jnp.float32)
    mask = jnp.arange(T)[None, :] < lengths[:, None]
    if hooks is not None:
        # pre-ln0 embedding rows (ref: Hook::PostEmbedLoaded)
        x0 = HookCtx(hooks, -1)("post_embed_loaded", x=x0)["x"]
    x = B.layer_norm(x0, params["ln0"]["w"], params["ln0"]["b"], LN_EPS)
    x = jnp.where(mask[..., None], x, 0.0)

    version = info.version
    L = info.num_layer
    blocks = params["blocks"]
    layer_ids = jnp.arange(L)
    do_rescale = rescale is not None and rescale < L

    # whole-stack decode kernel: one Pallas launch runs every layer with
    # cross-layer DMA/compute pipelining (ops/pallas/layer7.py); numerics
    # match the composed path (pinned by test_pallas.py::test_layer_scan7).
    # Batches above MAX_SCAN_BATCH run the kernel over equal batch
    # slices (B=32 -> 2x16): per-lane numerics are identical (every
    # kernel op is batch-lane-independent) and the split keeps the
    # layer-pipelined kernel where the composed path would take over.
    if (
        version == ModelVersion.V7
        and hooks is None
        and T == 1
        and "mega7" in params
        and not isinstance(blocks, list)
        and not isinstance(state, list)
        and _use_pallas()
    ):
        from ..ops.pallas.layer7 import layer_scan7, scan_batch_slice

        B0 = x.shape[0]
        bs = scan_batch_slice(B0)
        if bs is not None:
            args = (rescale if do_rescale else None, LN_EPS, GN_EPS, L2_EPS)
            if bs == B0:
                xo, new_state = layer_scan7(
                    params["mega7"], state, x[:, 0], mask[:, 0], *args
                )
                return xo[:, None], new_state
            xs, sts = [], []
            for i in range(B0 // bs):
                sl = slice(i * bs, (i + 1) * bs)
                st_i = jax.tree.map(lambda a: a[:, sl], state)
                xo_i, st_o = layer_scan7(
                    params["mega7"], st_i, x[sl, 0], mask[sl, 0], *args
                )
                xs.append(xo_i)
                sts.append(st_o)
            xo = jnp.concatenate(xs, axis=0)
            new_state = jax.tree.map(
                lambda *a: jnp.concatenate(a, axis=1), *sts
            )
            return xo[:, None], new_state

    # V4/V5/V6 whole-stack decode kernel (ops/pallas/layer56.py) — same
    # routing rules as the V7 branch above
    if (
        version in (ModelVersion.V4, ModelVersion.V5, ModelVersion.V6)
        and hooks is None
        and T == 1
        and "mega56" in params
        and not isinstance(blocks, list)
        and not isinstance(state, list)
        and _use_pallas()
    ):
        from ..ops.pallas.layer56 import layer_scan56, scan_batch_slice

        B0 = x.shape[0]
        bs = scan_batch_slice(B0)
        if bs is not None:
            args = (rescale if do_rescale else None, LN_EPS, GN_EPS)
            if bs == B0:
                xo, new_state = layer_scan56(
                    params["mega56"], state, x[:, 0], mask[:, 0], *args
                )
                return xo[:, None], new_state
            xs, sts = [], []
            for i in range(B0 // bs):
                sl = slice(i * bs, (i + 1) * bs)
                st_i = jax.tree.map(lambda a: a[:, sl], state)
                xo_i, st_o = layer_scan56(
                    params["mega56"], st_i, x[sl, 0], mask[sl, 0], *args
                )
                xs.append(xo_i)
                sts.append(st_o)
            xo = jnp.concatenate(xs, axis=0)
            new_state = jax.tree.map(
                lambda *a: jnp.concatenate(a, axis=1), *sts
            )
            return xo[:, None], new_state

    # per-layer (list) blocks — e.g. mixed per-layer quant formats —
    # cannot lax.scan; run them through the unrolled path (same for
    # per-layer list STATE, which only the unrolled path understands)
    if (isinstance(blocks, list) or isinstance(state, list)) and hooks is None:
        hooks = {}

    if hooks is not None:
        x = HookCtx(hooks, -1)("post_embed_layer_norm", x=x)["x"]
        x = HookCtx(hooks, -1)("post_embed", x=x)["x"]  # legacy alias
        # state may arrive as a per-layer LIST (the fused generation loop
        # carries it that way so no [L, ...] stack/slice happens per step);
        # the output state mirrors the input's form
        state_is_list = isinstance(state, list)
        new_states = []
        v0 = jnp.zeros(x.shape[:-1] + (_v_width(blocks),), x.dtype)
        for i in range(L):
            if isinstance(blocks, list):
                blk = blocks[i]
            else:
                blk = jax.tree.map(lambda a: a[i], blocks)
            lst = state[i] if state_is_list else jax.tree.map(lambda a: a[i], state)
            hk = HookCtx(hooks, i)
            if version == ModelVersion.V7:
                x, v0, new = _layer_v7(
                    info, blk, lst, x, v0, jnp.asarray(i), mask, lengths, hk
                )
            else:
                layer_fn = {
                    ModelVersion.V4: _layer_v4,
                    ModelVersion.V5: _layer_v5,
                    ModelVersion.V6: _layer_v6,
                }[version]
                x, new = layer_fn(info, blk, lst, x, mask, lengths, hk)
            if do_rescale and (i + 1) % rescale == 0:
                x = x * 0.5
            new_states.append(new)
        if state_is_list:
            new_state = new_states
        else:
            new_state = jax.tree.map(lambda *xs: jnp.stack(xs), *new_states)
        x = HookCtx(hooks, -1)("pre_head", x=x)["x"]
        return x, new_state

    if version == ModelVersion.V7:

        def body(carry, xs):
            x, v0 = carry
            blk, lst, idx = xs
            x, v0, new = _layer_v7(info, blk, lst, x, v0, idx, mask, lengths)
            if do_rescale:
                x = jnp.where((idx + 1) % rescale == 0, x * 0.5, x)
            return (x, v0), new

        v0_init = jnp.zeros(x.shape[:-1] + (_v_width(blocks),), x.dtype)
        (x, _), new_state = jax.lax.scan(body, (x, v0_init), (blocks, state, layer_ids))
        return x, new_state

    layer_fn = {
        ModelVersion.V4: _layer_v4,
        ModelVersion.V5: _layer_v5,
        ModelVersion.V6: _layer_v6,
    }[version]

    def body(carry, xs):
        blk, lst, idx = xs
        x, new = layer_fn(info, blk, lst, carry, mask, lengths)
        if do_rescale:
            x = jnp.where((idx + 1) % rescale == 0, x * 0.5, x)
        return x, new

    x, new_state = jax.lax.scan(body, x, (blocks, state, layer_ids))
    return x, new_state
