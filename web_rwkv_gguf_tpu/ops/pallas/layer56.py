"""Whole-stack RWKV-5/6 decode step as ONE Pallas kernel: grid over layers.

Same design as :mod:`.layer7` (see its module docstring for the layout
and pipelining rationale): the ENTIRE layer stack runs in one
``pallas_call`` with ``grid=(L,)``, the residual carry lives in VMEM
scratch, per-layer recurrent state streams through layer-indexed blocks,
and every quantized matrix uses the mega row-permuted bitcast-gemv
arrangement (:func:`.layer7._prep_matrix` / :func:`.layer7._gemv_val`).

V6 is the flagship here — most real-world RWKV GGUF files in circulation
are v6 "world" models, and without this kernel they decode on the
op-count-bound composed path (the reference serves v6 with the same
kernel quality as v7: src/runtime/v6.rs:701-958 +
src/shaders/time_mix_v6.wgsl). V5 is V6 minus the two data-dependent
adapters (static per-head decay, static token-shift mixes, non-reversed
lerp direction), and V4 is simpler still (per-CHANNEL max-trick WKV, no
heads/group-norm/gate, only r/k/v projections), so one kernel body
serves all three under a static ``version`` switch.

Per-layer math (identical to models/forward._layer_v4/_layer_v5/_layer_v6):
  V6: ddlerp 5-way token shift (time_mix_w1/w2 adapter), decay LoRA
      (time_decay_w1/w2) + StableExp, matrix-state WKV
      ``y = r·(u∘(k vᵀ) + S); S ← diag(w)·S + k vᵀ``, group-norm, silu
      gate, FFN with receptance (sigmoid(r)·v channel mix).
  V5: static mixes, static per-channel decay (activated at load),
      otherwise the same attention/FFN shape.
  V4: static mixes, scalar-channel WKV with the (aa, bb, pp)
      exponential-max-trick state (ref: src/shaders/time_mix_v4.wgsl,
      src/runtime/v4.rs:152-184), ``y = sigmoid(r)·wkv``; same FFN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config
from .layer7 import (
    _VMEM_LIMIT,
    DecodeBlocks7,
    MAX_SCAN_BATCH,
    _field1_tag,
    _form_keys,
    _from_heads,
    _gemv_val,
    _head_masks,
    _ln,
    _prep_matrix,
    _to_heads,
    scan_batch_slice,
)
from .layer7 import _expand_super as _expand_super  # noqa: F401 (re-export)

__all__ = ["prep_decode56", "layer_scan56", "scan_batch_slice", "MAX_SCAN_BATCH"]

_TAGS = ("rkvg", "wo", "fr", "fk", "fv")


def _layer_scan56_kernel(
    *refs,
    # statics
    B, C, H, hs, hidden, L, rescale, version,
    splits, native_tags, r5, eps_ln, eps_gn, wide, has_goff,
):
    """Ref layout (positional, mirrors layer_scan56's operand assembly):
    ln1, ln2, vecs, heads, gn, [v6: time_mix, tm_w1, tm_w2, td_w1,
    td_w2], per-tag quantized operand refs (codes + scale form), then
    state ins (x, att_shift, ffn_shift, wkv, mask), outs, and the
    residual VMEM scratch."""
    it = iter(refs)
    ln1_ref, ln2_ref = next(it), next(it)  # [1, 2, C]
    vecs_ref = next(it)  # [1, nv, C]
    if version != 4:
        heads_ref = next(it)  # [1, nh, H, hs] (time_first[, time_decay])
        gn_ref = next(it)  # [1, 2, C]
    if version == 6:
        tm_ref = next(it)  # [1, 5, C] static 5-way mixes (w,k,v,r,g)
        tmw1_ref = next(it)  # [1, 5r, C] bf16
        tmw2_ref = next(it)  # [1, 5, C, r] bf16
        tdw1_ref = next(it)  # [1, D, C] bf16
        tdw2_ref = next(it)  # [1, C, D] bf16
    wrefs = {}
    for tag, native in zip(_TAGS, native_tags):
        wrefs[tag] = tuple(next(it) for _ in range(len(_form_keys(native))))
    x_in_ref, ash_in_ref, fsh_in_ref = next(it), next(it), next(it)
    if version == 4:
        aa_in_ref, bb_in_ref, pp_in_ref = next(it), next(it), next(it)
    else:
        wkv_in_ref = next(it)
    mask_ref = next(it)
    goff_ref = next(it) if has_goff else None
    if version == 4:
        x_out_ref, ash_out_ref, fsh_out_ref = next(it), next(it), next(it)
        aa_out_ref, bb_out_ref, pp_out_ref = next(it), next(it), next(it)
    else:
        x_out_ref, ash_out_ref, fsh_out_ref, wkv_out_ref = (
            next(it), next(it), next(it), next(it),
        )
    x_scr = next(it)

    def st_off(tag, j=None):
        # identical scale-operand handling to layer7 — delegate through a
        # tiny shim so the native-factor forms stay in one place
        return _st_off_shim(wrefs, native_tags, tag, j)

    f1 = {tag: _field1_tag(nat) for tag, nat in zip(_TAGS, native_tags)}

    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        x_scr[:] = x_in_ref[:]

    x = x_scr[:]
    m_lane = mask_ref[:]  # [B, 1] f32

    ln1w, ln1b = ln1_ref[0, 0:1], ln1_ref[0, 1:2]
    xx = _ln(x, ln1w, ln1b, eps_ln)
    sh = ash_in_ref[0]  # [B, C]

    dn11 = (((1,), (1,)), ((), ()))

    def dot11(a, b):  # bf16 MXU dot, f32 accumulate, contract dims (1, 1)
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b, dimension_numbers=dn11,
            preferred_element_type=f32,
        )

    # --- token shifts --------------------------------------------------------
    if version == 6:
        # ddlerp (ref: v6.rs:769-803): base reversed shift with mix_x,
        # then a rank-r tanh adapter produces per-token 5-way mixes
        mix_x = vecs_ref[0, 0:1]
        sx = xx + mix_x * (sh - xx)
        tm = tm_ref[0]  # [5, C]
        shifted = []
        for s in range(5):
            w1s = tmw1_ref[0, s * r5 : (s + 1) * r5]  # [r, C] bf16
            z = jnp.tanh(dot11(sx, w1s))  # [B, r] f32
            w2s = tmw2_ref[0, s]  # [C, r] bf16
            mix_s = dot11(z, w2s) + tm[s : s + 1]  # [B, C]
            shifted.append(xx + mix_s * (sh - xx))
        wx, kx, vx, rx, gx = shifted  # stacked order (w, k, v, r, g)
    else:
        # V4/V5 static mixes, NON-reversed lerp: out = prev + mix·(x − prev)
        def shift5(idx):
            mv = vecs_ref[0, idx : idx + 1]
            return sh + mv * (xx - sh)

        if version == 4:
            kx, vx, rx = shift5(0), shift5(1), shift5(2)
        else:
            kx, vx, rx, gx = shift5(0), shift5(1), shift5(2), shift5(3)

    # --- r/k/v[/g] projections (grouped quantized gemv) ----------------------
    mdim = C
    rkvg_codes_ref = wrefs["rkvg"][0]
    proj_in = (rx, kx, vx) if version == 4 else (rx, kx, vx, gx)
    outs = []
    for j, xin in enumerate(proj_in):
        codes = rkvg_codes_ref[0, j * mdim : (j + 1) * mdim]
        st_j, off_j = st_off("rkvg", j)
        outs.append(
            _gemv_val(xin.astype(jnp.bfloat16), codes, st_j, off_j,
                      split=splits["rkvg"], m=mdim, k=C, wide=wide["rkvg"],
                      field1=f1["rkvg"])
        )
    if version == 4:
        # --- per-channel max-trick WKV (ref: time_mix_v4.wgsl:72-107) --------
        r, k, v = outs
        u = vecs_ref[0, 3:4]  # time_first
        w = vecs_ref[0, 4:5]  # -exp(time_decay), activated at load
        aa, bb, pp = aa_in_ref[0], bb_in_ref[0], pp_in_ref[0]
        ww = u + k
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        y_fl = jax.nn.sigmoid(r) * (e1 * aa + e2 * v) / (e1 * bb + e2)
        ww2 = w + pp
        q2 = jnp.maximum(ww2, k)
        e1n = jnp.exp(ww2 - q2)
        e2n = jnp.exp(k - q2)
        # jnp.where, not a linear blend: pp carries f32::MIN sentinels
        mb = m_lane > 0.0
        aa_out_ref[0] = jnp.where(mb, e1n * aa + e2n * v, aa)
        bb_out_ref[0] = jnp.where(mb, e1n * bb + e2n, bb)
        pp_out_ref[0] = jnp.where(mb, q2, pp)
    else:
        r, k, v, g_fl = outs

        # --- decay -----------------------------------------------------------
        m1, m2 = _head_masks(C, H, hs)
        if version == 6:
            # decay LoRA + StableExp (ref: v6.rs:831-849)
            dz = jnp.tanh(dot11(wx, tdw1_ref[0]))  # [B, D]
            w_raw = dot11(dz, tdw2_ref[0]) + vecs_ref[0, 1:2]  # + time_decay
            w_act = jnp.exp(-jnp.exp(w_raw))  # StableExp (ref: ops.rs:211-213)
            wh = _to_heads(w_act, m1, m2, B)  # [B, H, K]
        else:
            wh = heads_ref[0, 1][None]  # [1, H, K] pre-activated at load

        u = heads_ref[0, 0][None]  # [1, H, K] time_first

        # --- matrix-state WKV (ref: time_mix_v{5,6}.wgsl:82-157) -------------
        rh = _to_heads(r, m1, m2, B)
        kh = _to_heads(k, m1, m2, B)
        vh = _to_heads(v, m1, m2, B)
        gnw_h = _to_heads(gn_ref[0, 0:1], m1, m2, 1)
        gnb_h = _to_heads(gn_ref[0, 1:2], m1, m2, 1)

        S = wkv_in_ref[0]  # [B, H, K, V]
        kv = kh[:, :, :, None] * vh[:, :, None, :]
        y0 = jnp.sum(rh[:, :, :, None] * (u[:, :, :, None] * kv + S), axis=2)
        S_n = wh[:, :, :, None] * S + kv
        mst = m_lane[:, :, None, None]
        wkv_out_ref[0] = S + mst * (S_n - S)

        # group-norm over each head's V lanes + silu(g) gate
        mu = jnp.mean(y0, axis=2, keepdims=True)
        var = jnp.mean((y0 - mu) * (y0 - mu), axis=2, keepdims=True)
        yn = (y0 - mu) * jax.lax.rsqrt(var + eps_gn) * gnw_h + gnb_h
        y_fl = _from_heads(yn, m1, m2, B)  # [B, C]
        y_fl = y_fl * (g_fl * jax.nn.sigmoid(g_fl))  # silu gate

    # --- output projection + residual ----------------------------------------
    wo_st, wo_off = st_off("wo")
    dx = _gemv_val(
        y_fl.astype(jnp.bfloat16), wrefs["wo"][0][0], wo_st, wo_off,
        split=splits["wo"], m=C, k=C, wide=wide["wo"], field1=f1["wo"],
    )
    x = x + dx
    ash_out_ref[0] = sh + m_lane * (xx - sh)

    # --- FFN with receptance (ref: channel_mix.wgsl:83-108) ------------------
    ln2w, ln2b = ln2_ref[0, 0:1], ln2_ref[0, 1:2]
    xx2 = _ln(x, ln2w, ln2b, eps_ln)
    fsh = fsh_in_ref[0]
    nv0 = {6: 2, 5: 4, 4: 5}[version]
    fmk = vecs_ref[0, nv0 : nv0 + 1]
    fmr = vecs_ref[0, nv0 + 1 : nv0 + 2]
    if version == 6:
        kx2 = xx2 + fmk * (fsh - xx2)
        rx2 = xx2 + fmr * (fsh - xx2)
    else:
        kx2 = fsh + fmk * (xx2 - fsh)
        rx2 = fsh + fmr * (xx2 - fsh)
    fk_st, fk_off = st_off("fk")
    k_hid = _gemv_val(
        kx2.astype(jnp.bfloat16), wrefs["fk"][0][0], fk_st, fk_off,
        split=splits["fk"], m=hidden, k=C, wide=wide["fk"], field1=f1["fk"],
    )
    k_hid = jnp.maximum(k_hid, 0.0)
    k_hid = k_hid * k_hid
    fv_st, fv_off = st_off("fv")
    vf = _gemv_val(
        k_hid.astype(jnp.bfloat16), wrefs["fv"][0][0], fv_st, fv_off,
        split=splits["fv"], m=C, k=hidden, wide=wide["fv"], field1=f1["fv"],
    )
    fr_st, fr_off = st_off("fr")
    rf = _gemv_val(
        rx2.astype(jnp.bfloat16), wrefs["fr"][0][0], fr_st, fr_off,
        split=splits["fr"], m=C, k=C, wide=wide["fr"], field1=f1["fr"],
    )
    x = x + jax.nn.sigmoid(rf) * vf
    fsh_out_ref[0] = fsh + m_lane * (xx2 - fsh)

    if rescale is not None:
        # stage-split runs pass the stage's global layer offset so the
        # rescale modulo stays aligned with the single-device scan
        idx = i + (goff_ref[0, 0].astype(jnp.int32) if has_goff else 0)
        x = jnp.where((idx + 1) % rescale == 0, x * 0.5, x)

    x_scr[:] = x

    @pl.when(i == L - 1)
    def _final():
        x_out_ref[:] = x


def _st_off_shim(wrefs, native_tags, tag, j=None):
    """Per-group f32 scale / folded-offset rows for one matrix — the same
    native-factor folds as layer7's in-kernel ``st_off`` (see
    :func:`.layer7._layer_scan_kernel` for the per-form math)."""
    from .layer7 import _expand_super

    native = dict(zip(_TAGS, native_tags))[tag]
    sel = (lambda a: a[0, j]) if j is not None else (lambda a: a[0])
    if native == "dense":
        return None, None
    if native == "qk":
        _, stq_ref, mnq_ref, sd_ref, sdm_ref = wrefs[tag]
        qs = sel(stq_ref).astype(jnp.int32).astype(jnp.float32)
        qm = sel(mnq_ref).astype(jnp.int32).astype(jnp.float32)
        st = _expand_super(sel(sd_ref), 8) * qs
        off = _expand_super(sel(sdm_ref), 8) * qm + 16.0 * st
        return st, off
    if native == "n1f":
        _, scq_ref, sdn_ref = wrefs[tag]
        q = sel(scq_ref).astype(jnp.int32).astype(jnp.float32)
        sdn = sel(sdn_ref)
        s = _expand_super(sdn, q.shape[0] // sdn.shape[0]) * q
        return s, 192.0 * s
    if native == "b1f":
        _, stq_ref, mnq_ref, sd_ref, sdm_ref = wrefs[tag]
        qs = sel(stq_ref).astype(jnp.int32).astype(jnp.float32)
        qm = sel(mnq_ref).astype(jnp.int32).astype(jnp.float32)
        sd = sel(sd_ref)
        reps = qs.shape[0] // sd.shape[0]
        s = _expand_super(sd, reps) * qs
        off = _expand_super(sel(sdm_ref), reps) * qm + 128.0 * s
        return s, off
    _, st_ref, off_ref = wrefs[tag]
    return sel(st_ref), sel(off_ref)


# ---------------------------------------------------------------------------
# host-side prep
# ---------------------------------------------------------------------------


def prep_decode56(params: dict, info) -> DecodeBlocks7 | None:
    """Build stacked decode blocks for :func:`layer_scan56` from loaded
    V4/V5/V6 params, or None if ineligible (mixed per-layer formats,
    NF4 matrices, padded FFN, missing stacks). Dense bf16 stacks prep
    too (plain-dot branch, see :func:`.layer7._prep_matrix`)."""
    from ...models.info import ModelVersion

    version = {ModelVersion.V6: 6, ModelVersion.V5: 5,
               ModelVersion.V4: 4}[info.version]
    blocks = params.get("blocks")
    if isinstance(blocks, list) or not isinstance(blocks, dict):
        return None
    att, ffn = blocks["att"], blocks["ffn"]
    C, H, hs = info.num_emb, info.num_head, info.head_size
    if version != 4 and C != H * hs:
        return None
    if version == 6 and "tm_w1" not in att:
        return None

    proj_names = ("Wr", "Wk", "Wv") if version == 4 else ("Wr", "Wk", "Wv", "Wg")
    from .layer7 import _host_matrices

    fetch = _host_matrices(
        [att.get(k) for k in proj_names]
        + [att.get("Wo"), ffn.get("Wr"), ffn.get("Wk"), ffn.get("Wv")]
    )
    n_proj = len(proj_names)
    rkvg = [_prep_matrix(m) for m in fetch[:n_proj]]
    wo = _prep_matrix(fetch[n_proj])
    fr = _prep_matrix(fetch[n_proj + 1])
    fk = _prep_matrix(fetch[n_proj + 2])
    fv = _prep_matrix(fetch[n_proj + 3])
    preps = {"rkvg": rkvg[0], "wo": wo, "fr": fr, "fk": fk, "fv": fv}
    if any(p is None for p in rkvg) or any(p is None for p in preps.values()):
        return None
    for key in ("split", "native"):
        if any(p.get(key, False) != rkvg[0].get(key, False) for p in rkvg):
            return None
    for key in _form_keys(rkvg[0])[:2]:  # codes + first scale operand
        if any(p[key].shape != rkvg[0][key].shape for p in rkvg):
            return None
    hidden = fk["codes"].shape[1]
    fv_k = fv["codes"].shape[-1] * (2 if fv["split"] else 1)
    if fv_k != hidden:
        return None  # tile-padded FFN key: hidden widths disagree

    L = rkvg[0]["codes"].shape[0]

    def f32(a):  # device-native cast: no host round trip per vector
        return jnp.asarray(a, jnp.float32)

    def bf16(a):
        return jnp.asarray(a).astype(jnp.bfloat16)

    mega = {
        "ln1": jnp.stack([f32(blocks["ln1"]["w"]), f32(blocks["ln1"]["b"])],
                         axis=1),
        "ln2": jnp.stack([f32(blocks["ln2"]["w"]), f32(blocks["ln2"]["b"])],
                         axis=1),
        "rkvg_codes": jnp.concatenate([p["codes"] for p in rkvg], axis=1),
    }
    if version != 4:
        mega["gn"] = jnp.stack(
            [f32(att["gn"]["w"]), f32(att["gn"]["b"])], axis=1
        )
    if version == 4:
        mega["vecs"] = jnp.stack(
            [f32(att["mix_k"]), f32(att["mix_v"]), f32(att["mix_r"]),
             f32(att["time_first"]), f32(att["time_decay"]),  # -exp form
             f32(ffn["mix_k"]), f32(ffn["mix_r"])], axis=1,
        )  # [L, 7, C]
        r5 = 0
    elif version == 6:
        mega["vecs"] = jnp.stack(
            [f32(att["mix_x"]), f32(att["time_decay"]),
             f32(ffn["mix_k"]), f32(ffn["mix_r"])], axis=1,
        )  # [L, 4, C]
        mega["heads"] = f32(att["time_first"])[:, None]  # [L, 1, H, hs]
        mega["time_mix"] = f32(att["time_mix"])  # [L, 5, C] (w,k,v,r,g)
        mega["tm_w1"] = bf16(att["tm_w1"])  # [L, 5r, C]
        mega["tm_w2"] = bf16(att["tm_w2"])  # [L, 5, C, r]
        mega["td_w1"] = bf16(att["td_w1"])  # [L, D, C]
        mega["td_w2"] = bf16(att["td_w2"])  # [L, C, D]
        r5 = int(mega["tm_w1"].shape[1]) // 5
    else:
        mega["vecs"] = jnp.stack(
            [f32(att["mix_k"]), f32(att["mix_v"]), f32(att["mix_r"]),
             f32(att["mix_g"]), f32(ffn["mix_k"]), f32(ffn["mix_r"])], axis=1,
        )  # [L, 6, C]
        mega["heads"] = jnp.stack(
            [f32(att["time_first"]), f32(att["time_decay"])], axis=1,
        )  # [L, 2, H, hs]
        r5 = 0

    for tag, p in preps.items():
        for key in _form_keys(p)[1:]:
            if tag == "rkvg":
                mega[f"rkvg_{key}"] = jnp.stack([q[key] for q in rkvg], axis=1)
            else:
                mega[f"{tag}_{key}"] = p[key]
    for tag in ("wo", "fr", "fk", "fv"):
        mega[f"{tag}_codes"] = preps[tag]["codes"]

    static = {
        "version": version,
        "L": int(L), "C": int(C), "H": int(H), "hs": int(hs),
        "hidden": int(hidden), "r5": int(r5),
        "splits": tuple(preps[t]["split"] for t in _TAGS),
        "native_tags": tuple(preps[t].get("native", False) for t in _TAGS),
    }
    return DecodeBlocks7(mega, static)


# ---------------------------------------------------------------------------
# call wrapper
# ---------------------------------------------------------------------------


def layer_scan56(
    mega: DecodeBlocks7,
    state: dict,  # stacked pytree: att_shift [L,B,C], wkv [L,B,H,K,V], ffn_shift
    x: jax.Array,  # [B, C] post-ln0 residual input
    mask: jax.Array,  # [B] 0/1
    rescale: int | None,
    eps_ln: float, eps_gn: float,
    goff: jax.Array | None = None,  # global layer offset (pipeline stage)
) -> tuple[jax.Array, dict]:
    """Run the stacked V4/V5/V6 decode blocks: ``(x_out [B, C], new_state)``.

    V4 state is ``{att_shift, aa, bb, pp, ffn_shift}`` (all [L, B, C]);
    V5/V6 carry ``{att_shift, wkv, ffn_shift}``. ``goff`` (a scalar
    array) is only needed when a pipeline stage runs a layer SLICE with
    ``rescale`` active — it keeps the every-``rescale``-layers halving
    aligned with the global layer index."""
    s = mega.static
    version = s["version"]
    L, C, H, hs, hidden = s["L"], s["C"], s["H"], s["hs"], s["hidden"]
    B = x.shape[0]
    f32 = jnp.float32

    def blk(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _n=nd: (i,) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    operands = [mega["ln1"], mega["ln2"], mega["vecs"]]
    if version != 4:
        operands += [mega["heads"], mega["gn"]]
    in_specs = [blk(tuple(a.shape[1:])) for a in operands]
    if version == 6:
        for key in ("time_mix", "tm_w1", "tm_w2", "td_w1", "td_w2"):
            a = mega[key]
            operands.append(a)
            in_specs.append(blk(tuple(a.shape[1:])))
    native_tags = s["native_tags"]
    for tag, native in zip(_TAGS, native_tags):
        for part in _form_keys(native):
            a = mega[f"{tag}_{part}"]
            operands.append(a)
            in_specs.append(blk(tuple(a.shape[1:])))

    operands += [
        x.astype(f32),
        state["att_shift"].astype(f32),
        state["ffn_shift"].astype(f32),
    ]
    in_specs += [full((B, C)), blk((B, C)), blk((B, C))]
    if version == 4:
        operands += [
            state["aa"].astype(f32),
            state["bb"].astype(f32),
            state["pp"].astype(f32),
        ]
        in_specs += [blk((B, C))] * 3
    else:
        operands.append(state["wkv"].astype(f32))
        in_specs.append(blk((B, H, hs, hs)))
    operands.append(mask.astype(f32)[:, None])
    in_specs.append(full((B, 1)))
    has_goff = goff is not None
    if has_goff:
        operands.append(jnp.asarray(goff, f32).reshape(1, 1))
        in_specs.append(full((1, 1)))

    wide = B > config.scan_wide_batch
    wide_map = {tag: wide for tag in _TAGS}

    kernel = functools.partial(
        _layer_scan56_kernel,
        B=B, C=C, H=H, hs=hs, hidden=hidden, L=L, rescale=rescale,
        version=version,
        splits=dict(zip(_TAGS, s["splits"])), native_tags=native_tags,
        r5=s["r5"], eps_ln=eps_ln, eps_gn=eps_gn, wide=wide_map,
        has_goff=has_goff,
    )

    lbc = jax.ShapeDtypeStruct((L, B, C), f32)
    if version == 4:
        n_state = 5  # att_shift, ffn_shift, aa, bb, pp
        out_specs = (full((B, C)),) + (blk((B, C)),) * 5
        out_shape = (jax.ShapeDtypeStruct((B, C), f32),) + (lbc,) * 5
        state_bytes = 5 * L * B * C
    else:
        n_state = 3
        out_specs = (full((B, C)), blk((B, C)), blk((B, C)),
                     blk((B, H, hs, hs)))
        out_shape = (
            jax.ShapeDtypeStruct((B, C), f32), lbc, lbc,
            jax.ShapeDtypeStruct((L, B, H, hs, hs), f32),
        )
        state_bytes = 8 * L * B * H * hs * hs

    # state outputs alias their inputs (see layer7's rationale: avoids
    # re-copying the [L, B, H, K, V] WKV tensor into the loop carry)
    state_in0 = len(operands) - (2 if has_goff else 1) - n_state
    outs = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        input_output_aliases={state_in0 + j: 1 + j for j in range(n_state)},
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, C), f32)],  # residual carry
        interpret=config.interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * L * B * C * (5 * C + hidden * 2
                                   + (0 if version == 4 else H * hs)),
            bytes_accessed=int(
                mega["rkvg_codes"].size + mega["fk_codes"].size
                + mega["fv_codes"].size + mega["wo_codes"].size
                + mega["fr_codes"].size
                + state_bytes
            ),
            transcendentals=6 * L * B * C,
        ),
    )(*operands)
    if version == 4:
        x_out, ash, fsh, aa, bb, pp = outs
        return x_out, {"att_shift": ash, "aa": aa, "bb": bb, "pp": pp,
                       "ffn_shift": fsh}
    x_out, ash, fsh, wkv = outs
    return x_out, {"att_shift": ash, "wkv": wkv, "ffn_shift": fsh}
