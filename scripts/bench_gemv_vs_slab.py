"""Chain-timed A/B: bitcast gemv kernel vs slab kernel across small N.

The gemv kernel's MXU work scales as n*g*k*m (a k/gsize FLOP overhead
factor versus a plain gemv) while the slab kernel pays a fixed u8->i32
widen cost — so the crossover N matters for batched decode. Timing uses
state-carried chains inside one jit + host fetch (block_until_ready is
unreliable over this tunnel; see CLAUDE.md).

Usage: python scripts/bench_gemv_vs_slab.py [N ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from web_rwkv_gguf_tpu.models.matrix import Matrix
from web_rwkv_gguf_tpu.ops.pallas import matmul as pm
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q4_k


def make_chain(mat, n, m, k, length):
    def run(x, mt):
        def body(x, _):
            y = mt.matmul(x)  # [n, m] f32
            if m >= k:
                fb = jax.lax.dynamic_slice_in_dim(y, 0, k, 1)
            else:
                fb = jnp.tile(y, (1, -(-k // m)))[:, :k]
            return x + fb.astype(x.dtype) * 1e-6, ()

        x, _ = jax.lax.scan(body, x, None, length=length)
        return x

    return jax.jit(run)


def time_chain(run, x, mat, reps=3):
    out = run(x, mat)
    _ = np.asarray(out)  # compile + real sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x, mat)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def per_call_us(mat, n, m, k, est_us=2.0):
    # size chains so the long-short signal (~3 x 0.3 s) dominates the
    # ms-scale fetch-RTT variance of this tunnel
    short = max(64, min(4096, int(300.0 / max(est_us, 0.5))))
    long = 4 * short
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, k)), jnp.bfloat16)
    ts = time_chain(make_chain(mat, n, m, k, short), x, mat)
    tl = time_chain(make_chain(mat, n, m, k, long), x, mat)
    return (tl - ts) / (long - short) * 1e6


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    shapes = [(768, 768), (2688, 768), (768, 2688), (65536, 768)]
    rng = np.random.default_rng(0)
    orig_gbm = pm._gemv_block_m
    for m, k in shapes:
        w = rng.standard_normal((m, k), np.float32).astype(np.float16)
        raw = np.frombuffer(
            quantize_q4_k(w.astype(np.float32).reshape(-1)), np.uint8
        )
        mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (m, k))
        mat = jax.tree.map(jnp.asarray, mat)
        qbytes = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in jax.tree.leaves(mat)
        )
        floor0 = qbytes / 750e9 * 1e6
        for n in ns:
            pm._gemv_block_m = orig_gbm
            t_gemv = per_call_us(mat, n, m, k, est_us=max(floor0, 2.0))
            pm._gemv_block_m = lambda m_: None  # force slab kernel
            t_slab = per_call_us(mat, n, m, k, est_us=max(floor0 * 4, 2.0))
            pm._gemv_block_m = orig_gbm
            floor = floor0
            print(
                f"[{m:6d}x{k:5d}] N={n}  gemv {t_gemv:7.1f}us  "
                f"slab {t_slab:7.1f}us  dma-floor {floor:5.1f}us",
                flush=True,
            )


if __name__ == "__main__":
    main()
