"""Per-kernel micro-benchmark: µs and effective GB/s / GFLOP/s for the
fused dequant-matmul kernels vs dense (ref: examples/bench_q4k_shaders.rs
— warmup 10, runs 100)."""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--m", type=int, default=2688)
    p.add_argument("--k", type=int, default=768)
    p.add_argument("--n", type=int, action="append", default=None)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--runs", type=int, default=100)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models.matrix import Matrix
    from ..quant.formats import QuantScheme
    from ..utils.trace import device_sync
    from ..quant.ggml import GgmlDType, quantize_q4_k, quantize_q8_0

    M, K = args.m, args.k
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(M, K)) * 0.1).astype(np.float32)

    mats = {
        "dense_bf16": Matrix.dense(jnp.asarray(w, jnp.bfloat16)),
        "q4_k": Matrix.from_gguf_blocks(
            GgmlDType.Q4_K, np.frombuffer(quantize_q4_k(w.reshape(-1)), np.uint8), (M, K)
        ),
        "q8_0": Matrix.from_gguf_blocks(
            GgmlDType.Q8_0, np.frombuffer(quantize_q8_0(w.reshape(-1)), np.uint8), (M, K)
        ),
        "int8": Matrix.from_f16(w.astype(np.float16), QuantScheme.INT8),
    }

    print(f"matmul [{M}x{K}] on {jax.devices()[0].device_kind}")
    print(f"{'kernel':12} {'N':>4} {'us':>9} {'GFLOP/s':>9} {'wbytes':>9}")
    for name, mat in mats.items():
        wbytes = sum(np.asarray(a).nbytes for a in mat.arrays.values())
        if mat.kind == "dense":
            fn = jax.jit(
                lambda x, w: jnp.einsum("nk,mk->nm", x.astype(jnp.bfloat16), w,
                                        preferred_element_type=jnp.float32)
            )
            call = lambda x: fn(x, mat.arrays["w"])
        else:
            # Matrix.matmul dispatches to the Pallas kernels on TPU and the
            # XLA fallback elsewhere (so this bench runs on any backend)
            mat_dev = jax.tree.map(jnp.asarray, mat)
            fn = jax.jit(lambda x, mt: mt.matmul(x))
            call = lambda x: fn(x, mat_dev)
        for N in args.n or [1, 8, 64, 256]:
            x = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32), jnp.bfloat16)
            device_sync(call(x))
            for _ in range(args.warmup):
                call(x)
            device_sync(call(x))
            t0 = time.perf_counter()
            outs = [call(x) for _ in range(args.runs)]
            device_sync(outs[-1])
            dt = (time.perf_counter() - t0) / args.runs
            gflops = 2 * N * M * K / dt / 1e9
            print(f"{name:12} {N:4d} {dt*1e6:9.1f} {gflops:9.1f} {wbytes:9d}")


if __name__ == "__main__":
    main()
