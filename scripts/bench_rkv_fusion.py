"""A/B: three separate [C,C] q4k gemvs (r/k/v projections, distinct
inputs) vs ONE fused [3C,C] gemv fed the stacked [3,C] input, taking the
diagonal blocks of the [3,3C] output. Same weight DMA; two fewer kernel
launches. Chain-timed inside one jit + host fetch (see CLAUDE.md timing
notes).

Usage: python scripts/bench_rkv_fusion.py
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

C = 768


def q4k_matrix(m, k, seed):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((m, k)) * 0.05).astype(np.float32)
    raw = quantize_q4_k(w)
    return Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (m, k))


def time_chain(run, args, reps=3):
    out = run(*args)
    _ = np.asarray(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_us(make, length_s=512):
    runs = {}
    for length in (length_s, 4 * length_s):
        t0 = time.perf_counter()
        run, args = make(length)
        runs[length] = time_chain(run, args)
        print(f"    len={length}: {runs[length]*1e3:.1f} ms "
              f"(incl. {time.perf_counter()-t0:.0f}s w/ compile)",
              file=sys.stderr, flush=True)
    return 1e6 * (runs[4 * length_s] - runs[length_s]) / (3 * length_s)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    mr, mk, mv = (q4k_matrix(C, C, s) for s in (0, 1, 2))
    big = q4k_matrix(3 * C, C, 3)

    def make_sep(length):
        def run(x, mats):
            mr, mk, mv = mats

            def body(x, _):
                r = mr.matmul(x[:, 0])
                k = mk.matmul(x[:, 1])
                v = mv.matmul(x[:, 2])
                fb = jnp.stack([r, k, v], 1)
                return x + fb.astype(x.dtype) * 1e-6, ()

            x, _ = jax.lax.scan(body, x, None, length=length)
            return x

        x = jnp.ones((B, 3, C), jnp.bfloat16)
        return jax.jit(run), (x, (mr, mk, mv))

    def make_fused(length):
        def run(x, mat):
            def body(x, _):
                y = mat.matmul(x.reshape(3 * B, C))  # [3B, 3C]
                y = y.reshape(B, 3, 3, C)
                fb = jnp.stack([y[:, 0, 0], y[:, 1, 1], y[:, 2, 2]], 1)
                return x + fb.astype(x.dtype) * 1e-6, ()

            x, _ = jax.lax.scan(body, x, None, length=length)
            return x

        x = jnp.ones((B, 3, C), jnp.bfloat16)
        return jax.jit(run), (x, big)

    print(f"B={B}")
    us_sep = per_iter_us(make_sep)
    print(f"  3 separate [C,C] gemvs : {us_sep:7.2f} us/iter")
    us_fused = per_iter_us(make_fused)
    print(f"  1 fused [3C,C] gemv    : {us_fused:7.2f} us/iter  ({us_sep/us_fused:.2f}x)")

    # head gemv in-loop for reference
    head = q4k_matrix(65536, C, 4)

    def make_head(length):
        def run(x, mat):
            def body(x, _):
                y = mat.matmul(x)
                return x + y[:, :C].astype(x.dtype) * 1e-6, ()

            x, _ = jax.lax.scan(body, x, None, length=length)
            return x

        x = jnp.ones((B, C), jnp.bfloat16)
        return jax.jit(run), (x, head)

    us_head = per_iter_us(make_head, length_s=128)
    bytes_head = head.arrays["codes"].size + 2 * 24 * 65536 * 4 + 0
    print(f"  head [65536,C] gemv    : {us_head:7.2f} us/iter  "
          f"({bytes_head/us_head/1e3:.0f} GB/s incl. f32 scale operands)")


if __name__ == "__main__":
    main()
