"""Microbenchmark: WKV7 Pallas kernel at decode shapes, current vs
lane-packed variants.

The shipped kernel keeps per-head state ``[bb, H, K, V]`` with V=64 on
the 128-wide lane dim (half occupancy). The packed variant folds head
pairs onto the lane dim (``[bb, H/2, K, 2V]``) and reconstructs the
per-head broadcasts in-kernel via lane-slice concats.

Timing: the tunnel acknowledges block_until_ready before execution, so
each measurement chains N kernel calls (state-carried lax.scan) inside
one jit and fetches the result; the slope between two chain lengths
cancels the fetch RTT (see bench.py).

Usage: python scripts/bench_wkv_micro.py [B ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from web_rwkv_gguf_tpu.ops.pallas.wkv7 import wkv7_pallas, _VMEM_LIMIT


def _wkv7_packed_kernel(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                        y_ref, s1_ref):
    T = r_ref.shape[1]
    V2 = s0_ref.shape[-1]
    V = V2 // 2

    def pair(x_ref, t):  # [bb, T, Hp, 2K] -> [bb, Hp, K, 2V]
        x2 = x_ref[:, t]  # [bb, Hp, 2K]; lanes 0..K-1 = even head
        K = x2.shape[-1] // 2
        x0 = jax.lax.slice_in_dim(x2, 0, K, axis=2)
        x1 = jax.lax.slice_in_dim(x2, K, 2 * K, axis=2)
        x0 = jnp.broadcast_to(x0[:, :, :, None], x2.shape[:2] + (K, V))
        x1 = jnp.broadcast_to(x1[:, :, :, None], x2.shape[:2] + (K, V))
        return jnp.concatenate([x0, x1], axis=-1)

    def body(t, S):  # S: [bb, Hp, K, 2V]
        rt = pair(r_ref, t)
        wt = pair(w_ref, t)
        kt = pair(k_ref, t)
        at = pair(a_ref, t)
        bt = pair(b_ref, t)
        vt = v_ref[:, t][:, :, None, :]  # [bb, Hp, 1, 2V]

        sa = jnp.sum(at * S, axis=2, keepdims=True)
        S = wt * S + kt * vt + bt * sa
        y_ref[:, t] = jnp.sum(rt * S, axis=2)
        return S

    s1_ref[:] = jax.lax.fori_loop(0, T, body, s0_ref[:])


def wkv7_packed(state, r, w, k, v, a, b, mask):
    B, T, H, K = r.shape
    V = state.shape[-1]
    Hp = H // 2
    f32 = jnp.float32

    m = mask[..., None, None].astype(f32)
    w = jnp.where(m > 0, w.astype(f32), 1.0)
    k = k.astype(f32) * m
    b = b.astype(f32) * m

    def pack_vec(x):  # [B,T,H,K] -> [B,T,Hp,2K]
        return x.astype(f32).reshape(B, T, Hp, 2 * K)

    sp = state.astype(f32).reshape(B, Hp, 2, K, V).transpose(0, 1, 3, 2, 4)
    sp = sp.reshape(B, Hp, K, 2 * V)
    vp = v.astype(f32).reshape(B, T, Hp, 2 * V)

    vec_spec = pl.BlockSpec((B, T, Hp, 2 * K), lambda: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((B, T, Hp, 2 * V), lambda: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((B, Hp, K, 2 * V), lambda: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    y, s1 = pl.pallas_call(
        _wkv7_packed_kernel,
        grid=(),
        in_specs=[vec_spec, vec_spec, vec_spec, val_spec, vec_spec, vec_spec,
                  st_spec],
        out_specs=(val_spec, st_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, Hp, 2 * V), f32),
            jax.ShapeDtypeStruct((B, Hp, K, 2 * V), f32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(pack_vec(r), pack_vec(w), pack_vec(k), vp, pack_vec(a), pack_vec(b), sp)

    y = y.reshape(B, T, H, V)
    s1 = s1.reshape(B, Hp, K, 2, V).transpose(0, 1, 3, 2, 4).reshape(B, H, K, V)
    return y, s1


def chain(fn, B, T, H, K, n):
    """n state-carried kernel calls in one jit; inputs derived from state
    so nothing is elided."""

    @jax.jit
    def run(state, seed):
        def body(carry, _):
            state, x = carry
            r = x[:, None].repeat(T, 1)
            w = jax.nn.sigmoid(r) * 0.1 + 0.9
            k = r * 0.5
            v = r[..., :K]
            a = -r * 0.1
            b = r * 0.1
            mask = jnp.ones((B, T), bool)
            y, state = fn(state, r, w, k, v, a, b, mask)
            return (state, y[:, -1] * 1e-3 + x), None

        (state, x), _ = jax.lax.scan(body, (state, seed), None, length=n)
        return state, x

    return run


def timeit_chain(fn, B, T, H, K, n_small=256, n_big=1024, windows=4):
    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.standard_normal((B, H, K, K)), jnp.float32)
    seed = jnp.asarray(rng.standard_normal((B, H, K)), jnp.float32) * 0.1

    def window(n):
        run = chain(fn, B, T, H, K, n)
        s, x = run(state, seed)
        _ = np.asarray(x).ravel()[:1]  # warm
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            s, x = run(state, seed)
            _ = np.asarray(x).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best

    t_small, t_big = window(n_small), window(n_big)
    return (t_big - t_small) / (n_big - n_small)


def check():
    rng = np.random.default_rng(1)
    B, T, H, K = 2, 3, 4, 64
    s = jnp.asarray(rng.standard_normal((B, H, K, K)), jnp.float32)
    vecs = [jnp.asarray(rng.standard_normal((B, T, H, K)) * 0.3, jnp.float32)
            for _ in range(6)]
    r, w, k, v, a, b = vecs
    w = jax.nn.sigmoid(w)
    mask = jnp.ones((B, T), bool)
    y0, s0 = jax.jit(wkv7_pallas)(s, r, w, k, v, a, b, mask)
    y1, s1 = jax.jit(wkv7_packed)(s, r, w, k, v, a, b, mask)
    err = max(float(jnp.abs(y0 - y1).max()), float(jnp.abs(s0 - s1).max()))
    print(f"packed-vs-current max err: {err:.2e}", flush=True)
    assert err < 1e-5


def main():
    check()
    bs = [int(a) for a in sys.argv[1:]] or [1, 8]
    for H, K in [(12, 64), (32, 64)]:
        for B in bs:
            for T in (1,):
                if H % 2:
                    continue
                t_cur = timeit_chain(wkv7_pallas, B, T, H, K)
                t_pack = timeit_chain(wkv7_packed, B, T, H, K)
                print(
                    f"B={B} T={T} H={H} K={K}  current {t_cur*1e6:7.1f}us"
                    f"  packed {t_pack*1e6:7.1f}us  ratio {t_cur/t_pack:5.2f}x",
                    flush=True,
                )


if __name__ == "__main__":
    main()
