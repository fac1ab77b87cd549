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
    ref: src/runtime/v7.rs Hook enum + hook_op).

    ``hooks`` maps hook names to ``fn(layer_idx, **tensors) -> dict |
    None``; returned entries replace the named tensors, so hooks can both
    observe and modify intermediates. Hook names follow the reference:
    ``pre_att``, ``post_att_layer_norm``, ``post_att_token_shift``,
    ``post_att_linear``, ``post_att_adapt``, ``post_att_control``,
    ``post_att_value_residual``, ``post_att_time_mix``, ``post_att_gate``,
    ``post_att``, ``pre_ffn``, ``post_ffn_layer_norm``,
    ``post_ffn_activate``, ``post_ffn``, plus ``post_embed`` /
    ``pre_head`` at the model level, and ``pre_att_decay_activate``
    (V6, raw decay + k — the reference's PreAttTimeDecayActivate). Using hooks switches the layer stack
    from ``lax.scan`` to an unrolled trace (taps are resolved at trace
    time, like the reference builds them into the op graph).
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


def logits_head(params: dict, x: jax.Array) -> jax.Array:
    """Final LN + head matmul on selected rows (ref: v7.rs:1009-1036)."""
    x = B.layer_norm(x, params["ln_out"]["w"], params["ln_out"]["b"], LN_EPS)
    return params["head"].matmul(x)


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


def _ffn_v4(ffn, x, shift, mask, lengths):
    """Shared V4/V5 FFN: sq-relu key, sigmoid(r) gate
    (ref: v4.rs:725-785, channel_mix.wgsl:101-107)."""
    kx = B.token_shift(x, shift, ffn["mix_k"], reversed_mix=False)
    rx = B.token_shift(x, shift, ffn["mix_r"], reversed_mix=False)
    k = _trim_hidden(B.squared_relu(ffn["Wk"].matmul(kx)), ffn["Wv"])
    v = ffn["Wv"].matmul(k)
    r = ffn["Wr"].matmul(rx)
    out = jax.nn.sigmoid(r) * v
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
    kx = B.token_shift(xx, lst["att_shift"], att["mix_k"], reversed_mix=False)
    vx = B.token_shift(xx, lst["att_shift"], att["mix_v"], reversed_mix=False)
    rx = B.token_shift(xx, lst["att_shift"], att["mix_r"], reversed_mix=False)
    k = att["Wk"].matmul(kx)
    v = att["Wv"].matmul(vx)
    r = att["Wr"].matmul(rx)
    state4 = jnp.stack([lst["aa"], lst["bb"], lst["pp"]], axis=-1)
    y, state4 = _wkv4(state4, k, v, r, att["time_first"], att["time_decay"], mask)
    y = hk("post_att_time_mix", x=y)["x"]
    x = x + att["Wo"].matmul(y)
    x = hk("post_att", x=x)["x"]

    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    out, ffn_shift = _ffn_v4(ffn, xx2, lst["ffn_shift"], mask, lengths)
    x = x + out

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
    kx = B.token_shift(xx, sh, att["mix_k"], reversed_mix=False)
    vx = B.token_shift(xx, sh, att["mix_v"], reversed_mix=False)
    rx = B.token_shift(xx, sh, att["mix_r"], reversed_mix=False)
    gx = B.token_shift(xx, sh, att["mix_g"], reversed_mix=False)
    k = _heads(att["Wk"].matmul(kx), H)
    v = _heads(att["Wv"].matmul(vx), H)
    r = _heads(att["Wr"].matmul(rx), H)
    g = att["Wg"].matmul(gx)
    y, wkv = _wkv5(lst["wkv"], r, k, v, att["time_first"], att["time_decay"], mask)
    y = B.group_norm(_flat(y), att["gn"]["w"], att["gn"]["b"], H, GN_EPS)
    y = hk("post_att_time_mix", x=y)["x"]
    y = y * jax.nn.silu(g)
    x = x + att["Wo"].matmul(y)
    x = hk("post_att", x=x)["x"]

    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    out, ffn_shift = _ffn_v4(ffn, xx2, lst["ffn_shift"], mask, lengths)
    x = x + out

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
    sx = B.token_shift(xx, sh, att["mix_x"], reversed_mix=True)
    z = jnp.tanh(
        jnp.einsum("btc,fc->btf", sx, att["tm_w1"], preferred_element_type=jnp.float32)
    )  # [B,T,5r]
    r5 = att["tm_w1"].shape[0] // 5
    z = z.reshape(z.shape[0], z.shape[1], 5, r5)
    mix = jnp.einsum(
        "btfr,fcr->btfc", z, att["tm_w2"], preferred_element_type=jnp.float32
    ) + att["time_mix"][None, None]  # [B,T,5,C]

    def shift_with(m):
        return B.token_shift(xx, sh, m, reversed_mix=True)

    wx = shift_with(mix[:, :, 0])
    kx = shift_with(mix[:, :, 1])
    vx = shift_with(mix[:, :, 2])
    rx = shift_with(mix[:, :, 3])
    gx = shift_with(mix[:, :, 4])

    k = _heads(att["Wk"].matmul(kx), H)
    v = _heads(att["Wv"].matmul(vx), H)
    r = _heads(att["Wr"].matmul(rx), H)
    g = att["Wg"].matmul(gx)

    # decay LoRA + StableExp (ref: v6.rs:831-849)
    dz = jnp.tanh(
        jnp.einsum("btc,dc->btd", wx, att["td_w1"], preferred_element_type=jnp.float32)
    )
    w_raw = jnp.einsum(
        "btd,cd->btc", dz, att["td_w2"], preferred_element_type=jnp.float32
    ) + att["time_decay"][None, None]
    # raw (pre-StableExp) decay and k exposed for hooks (the reference's
    # puzzle15 example does k <- exp(min(w,0))*k at
    # Hook::PreAttTimeDecayActivate, examples/puzzle15/main.rs:114-116)
    t = hk("pre_att_decay_activate", w=w_raw, k=k)
    w_raw, k = t["w"], t["k"]
    w = _heads(B.stable_exp(w_raw), H)

    y, wkv = _wkv6(lst["wkv"], r, k, v, att["time_first"], w, mask)
    y = B.group_norm(_flat(y), att["gn"]["w"], att["gn"]["b"], H, GN_EPS)
    y = hk("post_att_time_mix", x=y)["x"]
    y = y * jax.nn.silu(g)
    x = x + att["Wo"].matmul(y)
    x = hk("post_att", x=x)["x"]

    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    kx2 = B.token_shift(xx2, lst["ffn_shift"], ffn["mix_k"], reversed_mix=True)
    rx2 = B.token_shift(xx2, lst["ffn_shift"], ffn["mix_r"], reversed_mix=True)
    kf = _trim_hidden(B.squared_relu(ffn["Wk"].matmul(kx2)), ffn["Wv"])
    vf = ffn["Wv"].matmul(kf)
    rf = ffn["Wr"].matmul(rx2)
    x = x + jax.nn.sigmoid(rf) * vf

    new = {
        "att_shift": B.update_shift_state(xx, lengths, sh),
        "wkv": wkv,
        "ffn_shift": B.update_shift_state(xx2, lengths, lst["ffn_shift"]),
    }
    return x, new


def _lora(x_in, w_a, w_b, mid_act=None):
    z = jnp.einsum("btc,dc->btd", x_in, w_a, preferred_element_type=jnp.float32)
    if mid_act is not None:
        z = mid_act(z)
    return jnp.einsum("btd,cd->btc", z, w_b, preferred_element_type=jnp.float32)


def _v7_value_residual(att, vx, v, v0, layer_idx):
    """Value residual from layer 0 (ref: v7.rs:895-921)."""
    v_mix = jax.nn.sigmoid(att["v0"][None, None] + _lora(vx, att["v1"], att["v2"]))
    v_res = v + v_mix * (v0 - v)
    is_first = layer_idx == 0
    v = jnp.where(is_first, v, v_res)
    v0 = jnp.where(is_first, v, v0)
    return v, v0


def _v7_mix_inputs(att, H, rx, wx, kx, vx, ax, gx, v0, layer_idx, hk=_NOHOOK):
    """Projections + inner-LoRA adapters + control-k + value residual:
    the shared middle of the V7 attention block (used by both the
    standard and the sequence-parallel layer)."""
    r = att["Wr"].matmul(rx)
    k = att["Wk"].matmul(kx)
    v = att["Wv"].matmul(vx)
    t = hk("post_att_linear", r=r, k=k, v=v)
    r, k, v = t["r"], t["k"], t["v"]

    lora = _lora
    w_in = att["w0"][None, None] + lora(wx, att["w1"], att["w2"], jnp.tanh)
    a = jax.nn.sigmoid(att["a0"][None, None] + lora(ax, att["a1"], att["a2"]))
    g = lora(gx, att["g1"], att["g2"], jax.nn.sigmoid)
    t = hk("post_att_adapt", w=w_in, a=a, g=g)
    w_in, a, g = t["w"], t["a"], t["g"]

    kk = _flat(B.l2_normalize(_heads(k * att["k_k"][None, None], H), L2_EPS))
    k = k * (1.0 + (a - 1.0) * att["k_a"][None, None])  # ref: control_k_v7.wgsl:73
    # ``a`` and raw ``w`` are exposed here so hooks can modify the WKV
    # b-term after k-control (the reference's othello example does
    # a <- act_w(w)*a at Hook::PostAttControl, examples/othello/main.rs:113)
    t = hk("post_att_control", k=k, kk=kk, a=a, w=w_in)
    k, kk, a = t["k"], t["kk"], t["a"]

    v, v0 = _v7_value_residual(att, vx, v, v0, layer_idx)
    v = hk("post_att_value_residual", v=v)["v"]

    w_dec = W.wkv7_act_w(w_in)
    rh, wh, kh, vh = (_heads(t_, H) for t_ in (r, w_dec, k, v))
    kkh = _heads(kk, H)
    return rh, wh, kh, vh, -kkh, kkh * _heads(a, H), g, v0


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
    sh = lst["att_shift"]

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
        w_in = att["w0"][None, None] + _lora(wx, att["w1"], att["w2"], jnp.tanh)
        a_in = att["a0"][None, None] + _lora(ax, att["a1"], att["a2"])
        g = _lora(gx, att["g1"], att["g2"], jax.nn.sigmoid)
        v, v0 = _v7_value_residual(att, vx, v, v0, layer_idx)
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
        y = y * g
        y = hk("post_att_gate", x=y)["x"]
    x = x + att["Wo"].matmul(y)
    x = hk("post_att", x=x)["x"]

    x = hk("pre_ffn", x=x)["x"]
    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    xx2 = hk("post_ffn_layer_norm", x=xx2)["x"]
    kx2 = B.token_shift(xx2, lst["ffn_shift"], ffn["x_k"], reversed_mix=True)
    kf = _trim_hidden(B.squared_relu(ffn["Wk"].matmul(kx2)), ffn["Wv"])
    kf = hk("post_ffn_activate", k=kf)["k"]
    vf = ffn["Wv"].matmul(kf)
    x = x + vf  # channel_mix_v7: out = v (ref: channel_mix.wgsl:101-102)
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
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        from ..ops import basic as _B

        x = _B.layer_norm(
            input_embeds.astype(jnp.float32), params["ln0"]["w"],
            params["ln0"]["b"], LN_EPS,
        )
    else:
        T = tokens.shape[1]
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        x = embed_tokens(params, tokens)
    x = jnp.where(mask[..., None], x, 0.0)

    version = info.version
    L = info.num_layer
    blocks = params["blocks"]
    layer_ids = jnp.arange(L)
    do_rescale = rescale is not None and rescale < L

    # per-layer (list) blocks — e.g. mixed per-layer quant formats —
    # cannot lax.scan; run them through the unrolled path (same for
    # per-layer list STATE, which only the unrolled path understands)
    if (isinstance(blocks, list) or isinstance(state, list)) and hooks is None:
        hooks = {}

    if hooks is not None:
        x = HookCtx(hooks, -1)("post_embed", x=x)["x"]
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
