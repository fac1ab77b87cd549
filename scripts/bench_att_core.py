"""A/B: fused Pallas decode attention core (att_core7_step) vs the XLA
composition (wkv7_step + group_norm + bonus + gate), chain-timed on chip.

Usage: python scripts/bench_att_core.py [B ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from web_rwkv_gguf_tpu.ops import basic as B_
from web_rwkv_gguf_tpu.ops import wkv as W
from web_rwkv_gguf_tpu.ops.pallas.wkv7 import att_core7_step

H, K, V = 12, 64, 64
EPS = 64e-5


def time_chain(step, carry, reps=3, length_s=256):
    def chain(carry, length):
        def body(c, _):
            return step(c), ()

        c, _ = jax.lax.scan(body, carry, None, length=length)
        return c

    runs = {}
    for length in (length_s, 4 * length_s):
        r = jax.jit(functools.partial(chain, length=length))
        out = r(carry)
        _ = np.asarray(jax.tree.leaves(out)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = r(carry)
            _ = np.asarray(jax.tree.leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        runs[length] = best
    return 1e6 * (runs[4 * length_s] - runs[length_s]) / (3 * length_s)


def main():
    Bs = [int(a) for a in sys.argv[1:]] or [1, 8]
    rng = np.random.default_rng(0)
    for B in Bs:
        f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
        S = f(B, H, K, V)
        gnw, gnb = 1 + 0.1 * f(H, V), 0.1 * f(H, V)
        rk = f(H, K)
        mask = jnp.ones((B,), bool)
        x0 = f(B, H, K)

        def derive(x):
            r = x
            w = jnp.exp(-jnp.abs(x))
            k = x * 0.7
            v = x[..., :V] * 0.3
            a = -x * 0.2
            b = x * 0.1
            g = jax.nn.sigmoid(x[..., :V])
            return r, w, k, v, a, b, g

        def step_fused(carry):
            S, x = carry
            r, w, k, v, a, b, g = derive(x)
            y, S = att_core7_step(S, r, w, k, v, a, b, g, gnw, gnb, rk, mask, EPS)
            return S, x + y[..., :K] * 1e-6

        def step_xla(carry):
            S, x = carry
            r, w, k, v, a, b, g = derive(x)
            y0, S = W.wkv7_step(S, r[:, None], w[:, None], k[:, None],
                                v[:, None], a[:, None], b[:, None],
                                mask[:, None])
            y = B_.group_norm(y0.reshape(B, 1, H * V), gnw.reshape(-1),
                              gnb.reshape(-1), H, EPS)
            y = y + W.wkv7_bonus(r[:, None], k[:, None], v[:, None], rk
                                 ).reshape(B, 1, H * V)
            y = (y * g.reshape(B, 1, H * V)).reshape(B, H, V)
            return S, x + y[..., :K] * 1e-6

        us_x = time_chain(step_xla, (S, x0))
        us_f = time_chain(step_fused, (S, x0))
        print(f"B={B}: XLA composition {us_x:6.2f} us | fused kernel "
              f"{us_f:6.2f} us  ({us_x/us_f:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
