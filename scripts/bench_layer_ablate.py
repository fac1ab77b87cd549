"""Split the per-layer decode cost (B=1, T=1) into matmuls / LoRA /
WKV / shifts+norms glue by disabling one piece at a time in a local copy
of the v7 layer body (fused 12-layer loop, chain-timed, host-fetch
synced — see CLAUDE.md timing notes).

Usage: python scripts/bench_layer_ablate.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from web_rwkv_gguf_tpu.models import unroll_params
from web_rwkv_gguf_tpu.models.forward import GN_EPS, L2_EPS, LN_EPS, _heads, _flat
from web_rwkv_gguf_tpu.ops import basic as B
from web_rwkv_gguf_tpu.ops import wkv as W
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params


def layer_step(att, ffn, blk, lst, x, v0, i, *, skip):
    """One v7 layer at T=1, pieces removable via `skip` (a set)."""
    C = x.shape[-1]
    H = 12
    xx = x if "norms" in skip else B.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], LN_EPS)
    sh = lst["att_shift"]
    if "shifts" in skip:
        rx = wx = kx = vx = ax = gx = xx
    else:
        rx = B.token_shift(xx, sh, att["x_r"], reversed_mix=True)
        wx = B.token_shift(xx, sh, att["x_w"], reversed_mix=True)
        kx = B.token_shift(xx, sh, att["x_k"], reversed_mix=True)
        vx = B.token_shift(xx, sh, att["x_v"], reversed_mix=True)
        ax = B.token_shift(xx, sh, att["x_a"], reversed_mix=True)
        gx = B.token_shift(xx, sh, att["x_g"], reversed_mix=True)

    if "rkv" in skip:
        r = k = v = xx
    else:
        r = att["Wr"].matmul(rx)
        k = att["Wk"].matmul(kx)
        v = att["Wv"].matmul(vx)

    if "lora" in skip:
        w_in = att["w0"][None, None] + 0.0 * wx
        a = jax.nn.sigmoid(att["a0"][None, None] + 0.0 * ax)
        g = jax.nn.sigmoid(gx)
        v_mix = jax.nn.sigmoid(att["v0"][None, None] + 0.0 * vx)
    else:
        def lora(x_in, w_a, w_b, mid_act=None):
            z = jnp.einsum("btc,dc->btd", x_in, w_a, preferred_element_type=jnp.float32)
            if mid_act is not None:
                z = mid_act(z)
            return jnp.einsum("btd,cd->btc", z, w_b, preferred_element_type=jnp.float32)

        w_in = att["w0"][None, None] + lora(wx, att["w1"], att["w2"], jnp.tanh)
        a = jax.nn.sigmoid(att["a0"][None, None] + lora(ax, att["a1"], att["a2"]))
        g = lora(gx, att["g1"], att["g2"], jax.nn.sigmoid)
        v_mix = jax.nn.sigmoid(att["v0"][None, None] + lora(vx, att["v1"], att["v2"]))

    if "ctrl" in skip:
        kk = k
    else:
        kk = _flat(B.l2_normalize(_heads(k * att["k_k"][None, None], H), L2_EPS))
        k = k * (1.0 + (a - 1.0) * att["k_a"][None, None])
    v = jnp.where(i == 0, v, v + v_mix * (v0 - v))
    v0 = jnp.where(i == 0, v, v0)

    w_dec = W.wkv7_act_w(w_in)
    rh, wh, kh, vh = (_heads(t_, H) for t_ in (r, w_dec, k, v))
    kkh = _heads(kk, H)
    ah, bh = -kkh, kkh * _heads(a, H)
    mask = jnp.ones(x.shape[:2], bool)
    if "wkv" in skip:
        y, wkv = vh, lst["wkv"]
    else:
        y, wkv = W.wkv7_step(lst["wkv"], rh, wh, kh, vh, ah, bh, mask)
    if "post" in skip:
        y = _flat(y)
    else:
        y = B.group_norm(_flat(y), att["gn"]["w"], att["gn"]["b"], H, GN_EPS)
        y = y + _flat(W.wkv7_bonus(rh, kh, vh, att["r_k"]))
        y = y * g
    x = x + (y if "wo" in skip else att["Wo"].matmul(y))

    xx2 = x if "norms" in skip else B.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], LN_EPS)
    kx2 = xx2 if "shifts" in skip else B.token_shift(
        xx2, lst["ffn_shift"], ffn["x_k"], reversed_mix=True)
    if "ffn" in skip:
        pass
    else:
        kf = B.squared_relu(ffn["Wk"].matmul(kx2))
        x = x + ffn["Wv"].matmul(kf)

    lengths = jnp.ones((x.shape[0],), jnp.int32)
    new = {
        "att_shift": B.update_shift_state(xx, lengths, sh),
        "wkv": wkv,
        "ffn_shift": B.update_shift_state(xx2, lengths, lst["ffn_shift"]),
    }
    return x, v0, new


def build_loop(info, params, skip, length):
    blocks = params["blocks"]
    L = info.num_layer

    def run(state, x0):
        def body(carry, _):
            state, x = carry
            v0 = jnp.zeros_like(x)
            new_states = []
            for i in range(L):
                blk = blocks[i]
                lst = jax.tree.map(lambda a: a[i], state)
                x, v0, new = layer_step(
                    blk["att"], blk["ffn"], blk, lst, x, v0, i, skip=skip
                )
            # feed output back (keep the chain honest); state unchanged
            # except per-layer news stacked like the real path
                new_states.append(new)
            state = jax.tree.map(lambda *xs: jnp.stack(xs), *new_states)
            x = x * 1e-3
            return (state, x), ()

        (state, x), _ = jax.lax.scan(body, (state, x0), None, length=length)
        return x

    return jax.jit(run)


def time_loop(info, params, skip, length_s=64, reps=3):
    from web_rwkv_gguf_tpu.models import init_state

    runs = {}
    for length in (length_s, 4 * length_s):
        run = build_loop(info, params, skip, length)
        state = init_state(info, 1)
        x0 = jnp.ones((1, 1, info.num_emb), jnp.float32)
        out = run(state, x0)
        _ = np.asarray(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state, x0)
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        runs[length] = best
    return 1e6 * (runs[4 * length_s] - runs[length_s]) / (3 * length_s)


def main():
    info, params = synthetic_v7_params(quant="q4k")
    params = unroll_params(params)
    base = time_loop(info, params, frozenset())
    print(f"full 12-layer step : {base:7.1f} us", flush=True)
    for name in ["rkv", "wo", "ffn", "lora", "wkv", "shifts", "norms", "post", "ctrl"]:
        us = time_loop(info, params, frozenset([name]))
        print(f"  -{name:7s}        : {us:7.1f} us  (piece ~{base-us:6.1f} us)",
              flush=True)


if __name__ == "__main__":
    main()
