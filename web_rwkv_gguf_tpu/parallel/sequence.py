"""Sequence-parallel prefill: shard a long prompt's TIME axis over devices.

The WKV recurrence looks inherently sequential, but each device's chunk
acts on the state as an affine map ``S_out = M·S_in + O`` per head (see
ops/wkv_chunked.py: ``Ŝ_L = (I + B̂ᵀT⁻¹Â) Ŝ₀ + ...``). Devices compute
their local ``(M, O)`` with MXU matmuls, all-gather the small per-chunk
maps (H·K·(K+V) floats), compose prefixes locally, and then each device
knows its true incoming state and finishes its outputs — two passes over
the local tokens, full parallelism across devices. Token-shift needs only
the single boundary activation from the left neighbor (``ppermute``).

This is the RWKV-native answer to ring-attention/Ulysses (cf. SURVEY.md
§2.6): cross-device traffic is O(H·K²) per layer regardless of sequence
length (O(C) for the diagonal V4/V5/V6 transitions). All model
versions; lengths must equal the full T (no padding) — sequence
parallelism targets long dense prompts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.forward import GN_EPS, LN_EPS, _flat, _v7_mix_inputs
from ..models.info import ModelInfo, ModelVersion
from ..ops import basic as B
from ..ops import wkv as W
from ..ops.wkv_chunked import _tri_solve_unit_lower
from ..errors import UnsupportedFeature


# --------------------------------------------------------------------------
# chunk transition map: S_out = M S_in + O  for one device's token block
# --------------------------------------------------------------------------


def _wkv7_transition(r, w, k, v, a, b, *, chunk=16):
    """Per-head affine map of this token block: returns (M [B,H,K,K],
    O [B,H,K,V]) such that S_after = diag-composed(M)·S_before + O.

    Composed from sub-chunk maps: M_c = diag(P_L)(I + B̂ᵀT⁻¹Â),
    O_c = diag(P_L)(B̂ᵀT⁻¹·strict_tril(ÂK̂ᵀ)V + K̂ᵀV)."""
    f32 = jnp.float32
    Bb, T, H, K = r.shape
    V = v.shape[-1]
    assert T % chunk == 0
    n = T // chunk

    def to_chunks(x):
        return x.astype(f32).reshape(Bb, n, chunk, H, -1).transpose(1, 0, 3, 2, 4)

    rc, wc, kc, vc, ac, bc = map(to_chunks, (r, w, k, v, a, b))
    strict = jnp.tril(jnp.ones((chunk, chunk), f32), k=-1)
    eyeK = jnp.eye(K, dtype=f32)

    def step(carry, xs):
        M_acc, O_acc = carry
        _, ww, kk, vv, aa, bb = xs
        P = jnp.cumprod(ww, axis=2)
        P_prev = P / ww
        inv_P = 1.0 / P
        a_h = aa * P_prev
        b_h = bb * inv_P
        k_h = kk * inv_P

        ab = jnp.einsum("bhik,bhjk->bhij", a_h, b_h, preferred_element_type=f32) * strict
        ak = jnp.einsum("bhik,bhjk->bhij", a_h, k_h, preferred_element_type=f32) * strict

        # U = T⁻¹(Â S_in + L_ak V): split into state-dependent and constant parts
        TinvA = _tri_solve_unit_lower(ab, a_h)  # [B,H,L,K]
        TinvC = _tri_solve_unit_lower(
            ab, jnp.einsum("bhij,bhjd->bhid", ak, vv, preferred_element_type=f32)
        )  # [B,H,L,V]

        BtTA = jnp.einsum("bhlk,bhlj->bhkj", b_h, TinvA, preferred_element_type=f32)
        M_c = eyeK + BtTA  # [B,H,K,K] (acting on Ŝ)
        O_c = (
            jnp.einsum("bhlk,bhld->bhkd", b_h, TinvC, preferred_element_type=f32)
            + jnp.einsum("bhlk,bhld->bhkd", k_h, vv, preferred_element_type=f32)
        )
        PL = P[:, :, -1, :, None]
        M_c = PL * M_c
        O_c = PL * O_c

        M_new = jnp.einsum("bhij,bhjk->bhik", M_c, M_acc, preferred_element_type=f32)
        O_new = (
            jnp.einsum("bhij,bhjd->bhid", M_c, O_acc, preferred_element_type=f32) + O_c
        )
        return (M_new, O_new), None

    M0 = jnp.broadcast_to(eyeK, (Bb, H, K, K))
    O0 = jnp.zeros((Bb, H, K, V), f32)
    (M, O), _ = jax.lax.scan(step, (M0, O0), (rc, wc, kc, vc, ac, bc))
    return M, O


# --------------------------------------------------------------------------
# sequence-parallel V7 layer pieces (inside shard_map over axis "seq")
# --------------------------------------------------------------------------


def _sp_prev_token(x, boundary, axis):
    """x [B, T_loc, C] → previous-token tensor with the boundary activation
    fetched from the left neighbor; device 0 receives ``boundary`` (the
    carried cross-chunk shift state, so chunk chains compose)."""
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    last = x[:, -1, :]
    perm = [(i, (i + 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(last, axis, perm)
    from_left = jnp.where(idx == 0, boundary, from_left)
    return jnp.concatenate([from_left[:, None, :], x[:, :-1, :]], axis=1)


def _sp_token_shift(x, x_prev, mix):
    return x + mix * (x_prev - x)  # v7 reversed lerp


def _sp_wkv7(S0, rh, wh, kh, vh, ah, bh, axis):
    """Sequence-parallel WKV: local transitions → all-gather → prefix
    composition → local chunk with the true incoming state."""
    f32 = jnp.float32
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)

    M, O = _wkv7_transition(rh, wh, kh, vh, ah, bh)
    Ms = jax.lax.all_gather(M, axis)  # [n, B, H, K, K]
    Os = jax.lax.all_gather(O, axis)

    # prefix-compose maps of devices 0..idx-1 applied to the global S0
    def compose(carry, xs):
        S = carry
        Mi, Oi, i = xs
        S_next = jnp.einsum("bhij,bhjd->bhid", Mi, S, preferred_element_type=f32) + Oi
        S = jnp.where(i < idx, S_next, S)
        return S, None

    S_in, _ = jax.lax.scan(
        compose, S0.astype(f32), (Ms, Os, jnp.arange(n))
    )

    from ..ops.wkv_chunked import wkv7_chunked

    mask = jnp.ones(rh.shape[:2], bool)
    y, S_out = wkv7_chunked(S_in, rh, wh, kh, vh, ah, bh, mask)
    # device n-1 holds the final state
    return y, S_out


def _sp_wkv6(S0, rh, kh, vh, u, wh, axis):
    """Sequence-parallel V5/V6 WKV: the transition is diagonal, so the
    per-device map is (D = ∏w, O = final state from zero init)."""
    from ..ops.wkv_chunked import wkv6_chunked

    f32 = jnp.float32
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    mask = jnp.ones(rh.shape[:2], bool)

    D = jnp.prod(wh.astype(f32), axis=1)[..., None]  # [B, H, K, 1]
    _, O = wkv6_chunked(jnp.zeros_like(S0), rh, kh, vh, u, wh, mask)

    Ds = jax.lax.all_gather(D, axis)
    Os = jax.lax.all_gather(O, axis)

    def compose(S, xs):
        Di, Oi, i = xs
        S_next = Di * S + Oi
        return jnp.where(i < idx, S_next, S), None

    S_in, _ = jax.lax.scan(compose, S0.astype(f32), (Ds, Os, jnp.arange(n)))
    return wkv6_chunked(S_in, rh, kh, vh, u, wh, mask)


def _sp_wkv4(s0, k, v, r, u, w, axis):
    """Sequence-parallel V4 WKV. The decay is STATIC per channel, so a
    device's chunk acts on the true state value as ``A_out = e^{T·w}·A_in
    + A_local`` — affine with a known coefficient. In the stabilized
    ``(a, b, p)`` representation (value = a·e^p) the composition is one
    max-trick blend; the second pass reruns the plain serial scan from
    the composed incoming state, so outputs are the exact recurrence
    given S_in (same structure as :func:`_sp_wkv6`)."""
    f32 = jnp.float32
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    T = k.shape[1]
    mask = jnp.ones(k.shape[:2], bool)

    zero = jnp.stack(
        [jnp.zeros_like(s0[..., 0]), jnp.zeros_like(s0[..., 0]),
         jnp.full_like(s0[..., 0], W.F32_MIN)], axis=-1,
    )
    _, loc = W.wkv4(zero, k, v, r, u, w, mask)  # local-from-zero final
    locs = jax.lax.all_gather(loc, axis)  # [n, B, C, 3]
    decay = T * w.astype(f32)  # log-decay a chunk applies to the old state

    def compose(S, xs):
        li, i = xs
        a0, b0, p0 = S[..., 0], S[..., 1], S[..., 2]
        aL, bL, pL = li[..., 0], li[..., 1], li[..., 2]
        p0d = p0 + decay
        q = jnp.maximum(p0d, pL)
        e1 = jnp.exp(p0d - q)
        e2 = jnp.exp(pL - q)
        S_next = jnp.stack(
            [e1 * a0 + e2 * aL, e1 * b0 + e2 * bL, q], axis=-1
        )
        return jnp.where(i < idx, S_next, S), None

    S_in, _ = jax.lax.scan(compose, s0.astype(f32), (locs, jnp.arange(n)))
    return W.wkv4(S_in, k, v, r, u, w, mask)


def _layer_v4_sp(info, blk, lst, x, axis):
    """Sequence-parallel mirror of models.forward._layer_v4."""
    att, ffn = blk["att"], blk["ffn"]
    xx = B.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], LN_EPS)
    xprev = _sp_prev_token(xx, lst["att_shift"], axis)

    def shift(mix):  # v4: non-reversed lerp
        return xprev + mix * (xx - xprev)

    k = att["Wk"].matmul(shift(att["mix_k"]))
    v = att["Wv"].matmul(shift(att["mix_v"]))
    r = att["Wr"].matmul(shift(att["mix_r"]))

    s0 = jnp.stack([lst["aa"], lst["bb"], lst["pp"]], axis=-1)
    y, s4 = _sp_wkv4(s0, k, v, r, att["time_first"], att["time_decay"], axis)
    x = x + att["Wo"].matmul(y)

    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    xprev2 = _sp_prev_token(xx2, lst["ffn_shift"], axis)
    kx2 = xprev2 + ffn["mix_k"] * (xx2 - xprev2)
    rx2 = xprev2 + ffn["mix_r"] * (xx2 - xprev2)
    kf = B.squared_relu(ffn["Wk"].matmul(kx2))
    x = x + jax.nn.sigmoid(ffn["Wr"].matmul(rx2)) * ffn["Wv"].matmul(kf)

    new = {
        "att_shift": xx[:, -1, :],
        "aa": s4[..., 0], "bb": s4[..., 1], "pp": s4[..., 2],
        "ffn_shift": xx2[:, -1, :],
    }
    return x, new


def _layer_v5_sp(info, blk, lst, x, axis):
    """Sequence-parallel mirror of models.forward._layer_v5."""
    from ..models.forward import _heads

    H = info.num_head
    att, ffn = blk["att"], blk["ffn"]
    xx = B.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], LN_EPS)
    xprev = _sp_prev_token(xx, lst["att_shift"], axis)

    def shift(mix):  # v5: non-reversed lerp
        return xprev + mix * (xx - xprev)

    k = _heads(att["Wk"].matmul(shift(att["mix_k"])), H)
    v = _heads(att["Wv"].matmul(shift(att["mix_v"])), H)
    r = _heads(att["Wr"].matmul(shift(att["mix_r"])), H)
    g = att["Wg"].matmul(shift(att["mix_g"]))

    wt = jnp.broadcast_to(
        att["time_decay"][None, None], r.shape
    )
    y, wkv = _sp_wkv6(lst["wkv"], r, k, v, att["time_first"], wt, axis)
    y = B.group_norm(_flat(y), att["gn"]["w"], att["gn"]["b"], H, GN_EPS)
    y = y * jax.nn.silu(g)
    x = x + att["Wo"].matmul(y)

    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    xprev2 = _sp_prev_token(xx2, lst["ffn_shift"], axis)
    kx2 = xprev2 + ffn["mix_k"] * (xx2 - xprev2)
    rx2 = xprev2 + ffn["mix_r"] * (xx2 - xprev2)
    kf = B.squared_relu(ffn["Wk"].matmul(kx2))
    x = x + jax.nn.sigmoid(ffn["Wr"].matmul(rx2)) * ffn["Wv"].matmul(kf)

    new = {"att_shift": xx[:, -1, :], "wkv": wkv, "ffn_shift": xx2[:, -1, :]}
    return x, new


def _layer_v6_sp(info, blk, lst, x, axis):
    """Sequence-parallel mirror of models.forward._layer_v6."""
    H = info.num_head
    att, ffn = blk["att"], blk["ffn"]
    xx = B.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], LN_EPS)
    xprev = _sp_prev_token(xx, lst["att_shift"], axis)

    sx = _sp_token_shift(xx, xprev, att["mix_x"])
    # same input-side dtype casts as models.forward._layer_v6 (adapters
    # are stored in the model compute dtype)
    z = jnp.tanh(
        jnp.einsum(
            "btc,fc->btf", sx.astype(att["tm_w1"].dtype), att["tm_w1"],
            preferred_element_type=jnp.float32,
        )
    )
    r5 = att["tm_w1"].shape[0] // 5
    z = z.reshape(z.shape[0], z.shape[1], 5, r5)
    mix = jnp.einsum(
        "btfr,fcr->btfc", z.astype(att["tm_w2"].dtype), att["tm_w2"],
        preferred_element_type=jnp.float32,
    ) + att["time_mix"][None, None]

    wx = _sp_token_shift(xx, xprev, mix[:, :, 0])
    kx = _sp_token_shift(xx, xprev, mix[:, :, 1])
    vx = _sp_token_shift(xx, xprev, mix[:, :, 2])
    rx = _sp_token_shift(xx, xprev, mix[:, :, 3])
    gx = _sp_token_shift(xx, xprev, mix[:, :, 4])

    from ..models.forward import _heads

    k = _heads(att["Wk"].matmul(kx), H)
    v = _heads(att["Wv"].matmul(vx), H)
    r = _heads(att["Wr"].matmul(rx), H)
    g = att["Wg"].matmul(gx)

    dz = jnp.tanh(
        jnp.einsum(
            "btc,dc->btd", wx.astype(att["td_w1"].dtype), att["td_w1"],
            preferred_element_type=jnp.float32,
        )
    )
    w_raw = jnp.einsum(
        "btd,cd->btc", dz.astype(att["td_w2"].dtype), att["td_w2"],
        preferred_element_type=jnp.float32,
    ) + att["time_decay"][None, None]
    w = _heads(B.stable_exp(w_raw), H)

    y, wkv = _sp_wkv6(lst["wkv"], r, k, v, att["time_first"], w, axis)
    y = B.group_norm(_flat(y), att["gn"]["w"], att["gn"]["b"], H, GN_EPS)
    y = y * jax.nn.silu(g)
    x = x + att["Wo"].matmul(y)

    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    xprev2 = _sp_prev_token(xx2, lst["ffn_shift"], axis)
    kx2 = _sp_token_shift(xx2, xprev2, ffn["mix_k"])
    rx2 = _sp_token_shift(xx2, xprev2, ffn["mix_r"])
    kf = B.squared_relu(ffn["Wk"].matmul(kx2))
    vf = ffn["Wv"].matmul(kf)
    rf = ffn["Wr"].matmul(rx2)
    x = x + jax.nn.sigmoid(rf) * vf

    new = {"att_shift": xx[:, -1, :], "wkv": wkv, "ffn_shift": xx2[:, -1, :]}
    return x, new


def _layer_v7_sp(info, blk, lst, x, v0, layer_idx, axis):
    """Sequence-parallel mirror of models.forward._layer_v7 (kept in sync
    by the parity test in tests/test_seq_parallel.py)."""
    H = info.num_head
    att, ffn = blk["att"], blk["ffn"]
    xx = B.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], LN_EPS)
    xprev = _sp_prev_token(xx, lst["att_shift"], axis)

    rx = _sp_token_shift(xx, xprev, att["x_r"])
    wx = _sp_token_shift(xx, xprev, att["x_w"])
    kx = _sp_token_shift(xx, xprev, att["x_k"])
    vx = _sp_token_shift(xx, xprev, att["x_v"])
    ax = _sp_token_shift(xx, xprev, att["x_a"])
    gx = _sp_token_shift(xx, xprev, att["x_g"])

    rh, wh, kh, vh, ah, bh, g, v0 = _v7_mix_inputs(
        att, H, rx, wx, kx, vx, ax, gx, v0, layer_idx
    )
    y, wkv = _sp_wkv7(lst["wkv"], rh, wh, kh, vh, ah, bh, axis)
    y = B.group_norm(_flat(y), att["gn"]["w"], att["gn"]["b"], H, GN_EPS)
    y = y + _flat(W.wkv7_bonus(rh, kh, vh, att["r_k"]))
    y = y * g
    x = x + att["Wo"].matmul(y)

    xx2 = B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    xprev2 = _sp_prev_token(xx2, lst["ffn_shift"], axis)
    kx2 = _sp_token_shift(xx2, xprev2, ffn["x_k"])
    kf = B.squared_relu(ffn["Wk"].matmul(kx2))
    x = x + ffn["Wv"].matmul(kf)

    new = {"att_shift": xx[:, -1, :], "wkv": wkv, "ffn_shift": xx2[:, -1, :]}
    return x, v0, new


def make_seq_parallel_prefill(info: ModelInfo, mesh: Mesh, *, axis: str = "model"):
    """Build a jitted sequence-parallel prefill for V7.

    ``fn(params, state, tokens [B, T]) -> (x [B,T,C], new_state)`` with
    T sharded over ``axis``; all B sequences must be full-length (the
    long-prompt regime this mode is for), and T must divide evenly by
    the axis size × 16. Weights are replicated along ``axis``.
    """
    if info.version not in (ModelVersion.V4, ModelVersion.V5,
                            ModelVersion.V6, ModelVersion.V7):
        raise UnsupportedFeature(
            "sequence-parallel prefill supports V4/V5/V6/V7"
        )
    L = info.num_layer

    def inner(params, state, tokens):
        from ..models.forward import embed_tokens

        x = embed_tokens(params, tokens)
        v0 = jnp.zeros_like(x)
        blocks = params["blocks"]
        layer_ids = jnp.arange(L)

        if info.version in (ModelVersion.V4, ModelVersion.V5, ModelVersion.V6):
            layer_fn = {
                ModelVersion.V4: _layer_v4_sp,
                ModelVersion.V5: _layer_v5_sp,
                ModelVersion.V6: _layer_v6_sp,
            }[info.version]

            def body6(x, xs):
                blk, lst, idx = xs
                x, new = layer_fn(info, blk, lst, x, "seq")
                return x, new

            x, new_state = jax.lax.scan(body6, x, (blocks, state, layer_ids))

            def from_last(v):
                return jax.lax.all_gather(v, "seq")[-1]

            new_state = jax.tree.map(from_last, new_state)
            return x, new_state

        def body(carry, xs):
            x, v0 = carry
            blk, lst, idx = xs
            x, v0, new = _layer_v7_sp(info, blk, lst, x, v0, idx, "seq")
            return (x, v0), new

        (x, _), new_state = jax.lax.scan(body, (x, v0), (blocks, state, layer_ids))

        # shift states live on the LAST device; broadcast so every shard
        # returns identical (replicated) state
        def from_last(v):
            return jax.lax.all_gather(v, "seq")[-1]

        new_state = {
            "att_shift": from_last(new_state["att_shift"]),
            "ffn_shift": from_last(new_state["ffn_shift"]),
            "wkv": from_last(new_state["wkv"]),
        }
        return x, new_state

    # rename the mesh axis to "seq" inside the mapped fn for clarity
    seq_mesh = Mesh(mesh.devices, tuple("seq" if a == axis else a for a in mesh.axis_names))
    rep = P()
    mapped = shard_map(
        inner,
        mesh=seq_mesh,
        in_specs=(rep, rep, P(None, "seq")),
        out_specs=(P(None, "seq"), rep),
        check_vma=False,
    )
    return jax.jit(mapped)
