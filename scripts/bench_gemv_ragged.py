"""Prototype: ragged-M gemv (grid = ceil(m/bm), Pallas masks the edge
tile) vs the current whole-M single-grid-step kernel for m % 512 != 0.

Correctness first (vs Matrix.matmul XLA dequant path), then chain-timed.

Usage: python scripts/bench_gemv_ragged.py
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

from web_rwkv_gguf_tpu.models.matrix import Matrix
from web_rwkv_gguf_tpu.ops.pallas import matmul as pm
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q4_k


def q4k(m, k, seed):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((m, k)) * 0.05).astype(np.float32)
    return Matrix.from_gguf_blocks(GgmlDType.Q4_K, quantize_q4_k(w), (m, k))


def ragged_gemv(mat, bm=512):
    """qk gemv with grid=ceil(m/bm): st/mnt pre-padded to mp, codes block
    specs ragged (Pallas pads loads / masks stores on the edge tile)."""
    a = mat.arrays
    m, k = mat.dims()
    kdim, gsize = k // 2, 32
    g = k // gsize
    gh = g // 2
    mp = -(-m // bm) * bm
    scales = np.zeros((mp, g), np.float32)
    mins = np.zeros((mp, g), np.float32)
    scales[:m] = np.asarray(a["scales"], np.float32)
    mins[:m] = np.asarray(a["mins"], np.float32)

    def to_pos(arr):
        arr = arr.reshape(mp // bm, bm // 4, 4, g)
        return np.ascontiguousarray(arr.transpose(3, 0, 2, 1).reshape(g, mp))

    st = jnp.asarray(to_pos(scales))
    mnt = jnp.asarray(to_pos(mins))
    codes = a["codes"]
    e = jnp.asarray(pm._expand_matrix(gsize, kdim, np.float32), jnp.bfloat16)

    def run(x):
        n = x.shape[0]
        xb = x.astype(jnp.bfloat16)
        sxt = x.astype(jnp.float32).reshape(n, g, gsize).sum(-1).T
        xlo = (xb[:, None, :kdim] * e[None]).reshape(n * gh, kdim)
        xhi = (xb[:, None, kdim:] * e[None]).reshape(n * gh, kdim)
        kernel = functools.partial(
            pm._gemv_kernel, kind="qk", n=n, g=g, gh=gh, bm=bm,
            has_offset=True, offset_sign=-1.0, signed_codes=False,
        )
        out = pl.pallas_call(
            kernel,
            grid=(mp // bm,),
            in_specs=[
                pl.BlockSpec((bm, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n * gh, kdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n * gh, kdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (4 * n, bm // 4), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((4 * n, mp // 4), jnp.float32),
            interpret=__import__(
                "web_rwkv_gguf_tpu.ops.pallas.config", fromlist=["interpret"]
            ).interpret,
        )(codes, st, mnt, sxt, xlo, xhi)
        y = (
            out.reshape(n, 4, mp // bm, bm // 4)
            .transpose(0, 2, 3, 1)
            .reshape(n, mp)
        )
        return y[:, :m]

    return run


def time_chain(step, x, reps=4, length_s=256):
    def chain(x, length):
        def body(x, _):
            return step(x), ()

        x, _ = jax.lax.scan(body, x, None, length=length)
        return x

    runs = {}
    for length in (length_s, 4 * length_s):
        r = jax.jit(functools.partial(chain, length=length))
        out = r(x)
        _ = np.asarray(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = r(x)
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        runs[length] = best
    return 1e6 * (runs[4 * length_s] - runs[length_s]) / (3 * length_s)


def main():
    C = 768
    rng = np.random.default_rng(7)
    for m in (2688, 768):
        mat = q4k(m, C, m)
        x = jnp.asarray(rng.standard_normal((1, C)), jnp.bfloat16)
        y_ref = np.asarray(mat.matmul(x))  # current whole-M kernel
        try:
            fn = ragged_gemv(mat)
            y = np.asarray(fn(x))
            err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
            print(f"[{m},{C}] ragged correctness relerr: {err:.2e}", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"[{m},{C}] ragged FAILED: {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)
            continue

        def cur(x, mat=mat):
            y = mat.matmul(x)
            return x + y[:, :C].astype(x.dtype) * 1e-6

        def rag(x, fn=fn):
            y = fn(x)
            return x + y[:, :C].astype(x.dtype) * 1e-6

        us_c = time_chain(cur, x)
        us_r = time_chain(rag, x)
        print(f"[{m},{C}]: whole-M {us_c:6.2f} us | ragged {us_r:6.2f} us "
              f"({us_c/us_r:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
