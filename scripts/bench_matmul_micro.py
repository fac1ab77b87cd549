"""Microbenchmark: fused quant matmul vs dense bf16 gemv/gemm per shape.

Isolates the Pallas dequant-matmul cost on the real chip so kernel work
can be judged in-session (absolute numbers vary with tunnel load).
Usage: python scripts/bench_matmul_micro.py [N ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from web_rwkv_gguf_tpu.models.matrix import Matrix
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q4_k


def timeit(fn, *args, reps=50, windows=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 8]
    shapes = [(768, 768), (2688, 768), (768, 2688), (65536, 768)]
    rng = np.random.default_rng(0)
    for m, k in shapes:
        w = rng.standard_normal((m, k), np.float32).astype(np.float16)
        raw = np.frombuffer(quantize_q4_k(w.astype(np.float32).reshape(-1)), np.uint8)
        mat_q = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (m, k))
        mat_q = jax.tree.map(jnp.asarray, mat_q)
        wd = jnp.asarray(w, jnp.bfloat16)
        qbytes = sum(np.prod(a.shape) * a.dtype.itemsize for a in jax.tree.leaves(mat_q))
        for n in ns:
            x = jnp.asarray(rng.standard_normal((n, k), np.float32), jnp.bfloat16)
            f_q = jax.jit(lambda x, mt: mt.matmul(x))
            f_d = jax.jit(
                lambda x, w: jnp.einsum(
                    "nk,mk->nm", x, w, preferred_element_type=jnp.float32
                )
            )
            tq = timeit(f_q, x, mat_q)
            td = timeit(f_d, x, wd)
            bw_q = qbytes / tq / 1e9
            bw_d = (m * k * 2) / td / 1e9
            print(
                f"[{m:6d}x{k:5d}] N={n:3d}  q4k {tq*1e6:8.1f}us ({bw_q:7.1f} GB/s)"
                f"   bf16 {td*1e6:8.1f}us ({bw_d:7.1f} GB/s)   ratio {tq/td:5.2f}x"
            )


if __name__ == "__main__":
    main()
