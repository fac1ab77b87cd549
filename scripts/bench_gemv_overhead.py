"""Dissect the in-context gemv overhead at decode: dependency
serialization vs the output-untangle transpose vs launch cost.

  t0  single [2688,768] gemv per iter
  t1  real FFN segment: Wv·relu²(Wk·x)  (two DEPENDENT gemvs + glue)
  t2  same but consuming the kernel's raw position-ordered output
      (skips the untangle transpose; wrong values, right shapes/bytes)
  t3  two INDEPENDENT gemvs summed (same bytes as t1, no dependency)

Usage: python scripts/bench_gemv_overhead.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from web_rwkv_gguf_tpu.models.matrix import Matrix
from web_rwkv_gguf_tpu.ops.pallas.matmul import _quant_gemv, _gemv_block_m
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q4_k

C, Hn = 768, 2688


def q4k(m, k, seed):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((m, k)) * 0.05).astype(np.float32)
    return Matrix.from_gguf_blocks(GgmlDType.Q4_K, quantize_q4_k(w), (m, k))


def raw_gemv(mat, x):
    """quant_matmul minus the final untangle: returns [4, m/4] kernel
    output reshaped flat (position order — values permuted)."""
    m, k = mat.dims()
    a = mat.arrays
    out = _quant_gemv(
        x.astype(jnp.bfloat16), "qk", a["codes"],
        a["scales"].astype(jnp.float32), a["mins"].astype(jnp.float32),
        -1.0, m, k, k // 2, 32, pre_st=a.get("st"), pre_mnt=a.get("mnt"),
    )
    return out  # already untangled by _quant_gemv; see below


def time_chain(step, x, reps=3, length_s=256):
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
    wk = q4k(Hn, C, 0)   # [2688, 768]
    wv = q4k(C, Hn, 1)   # [768, 2688]
    wk2 = q4k(Hn, C, 2)

    x = jnp.ones((1, C), jnp.bfloat16)

    def t0(x):
        y = wk.matmul(x)
        return x + y[:, :C].astype(x.dtype) * 1e-6

    def t1(x):
        kf = jnp.square(jax.nn.relu(wk.matmul(x)))
        y = wv.matmul(kf.astype(jnp.bfloat16))
        return x + y.astype(x.dtype) * 1e-6

    def t3(x):
        y1 = wk.matmul(x)
        y2 = wk2.matmul(x)
        y = y1 + y2
        return x + y[:, :C].astype(x.dtype) * 1e-6

    for name, fn in [("t0 single gemv [2688,768]      ", t0),
                     ("t1 FFN pair (dependent)        ", t1),
                     ("t3 two independent gemvs       ", t3)]:
        us = time_chain(fn, x)
        print(f"{name}: {us:6.2f} us/iter", flush=True)


if __name__ == "__main__":
    main()
