"""Q6_K head gemv A/B on the real chip: nibble-pair (round-3) vs the
single-field byte-plane path (round 4).

The [65536, 768] Q6_K head of every Q4_K_M file ran the byte-kind
nibble-pair kernel: 4 bf16 planes over full K = 2x the MXU plane passes
and 2x the VPU unpack of the Q4_K path. The single-field path exploits
bf16(128+u) = 0x4300 | u (whole [128,256) binade integer-exact) to turn
whole bytes into planes: 2 planes, half the unpack/plane work.

Variants (chain-timed, difference of per-length minima — see CLAUDE.md):
  q4k   Q4_K head, native-factor narrow gemv   (round-3 headline ref)
  v0    Q6_K old nibble-pair kernel (derived f32 operands, pre-round-4)
  v1    Q6_K single-field native (new default)

Usage: python scripts/bench_q6k_head.py [B]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from web_rwkv_gguf_tpu.models.matrix import Matrix, scale_products
from web_rwkv_gguf_tpu.ops.pallas import matmul as MM
from web_rwkv_gguf_tpu.quant.ggml import GgmlDType, quantize_q4_k, quantize_q6_k

M, C = 65536, 768


def time_loop(fn, x, length_s=64, reps=3):
    def chain(x, length):
        def body(x, _):
            y = fn(x)
            return x + y[:, :C].astype(x.dtype) * 1e-6, ()

        x, _ = jax.lax.scan(body, x, None, length=length)
        return x

    import functools

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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((M, C)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((B, C)), jnp.bfloat16)

    print("probe:", jax.jit(lambda a: a + 1)(jnp.zeros(8)).block_until_ready()[0],
          flush=True)

    mat4 = Matrix.from_gguf_blocks(GgmlDType.Q4_K, quantize_q4_k(w), (M, C))
    mat6 = Matrix.from_gguf_blocks(GgmlDType.Q6_K, quantize_q6_k(w), (M, C))
    assert "scq" in mat6.arrays, "native factors missing"

    def run_q4k(x):
        return MM.quant_matmul(x, mat4.kind, mat4.arrays, M, C)

    def run_v1(x):
        return MM.quant_matmul(x, mat6.kind, mat6.arrays, M, C)

    # old path: strip natives so dispatch derives f32 operands in-trace
    # and runs the nibble-pair kernel (exactly the round-3 route)
    a6 = {k: v for k, v in mat6.arrays.items()
          if k not in ("scq", "sdn", "q6s", "q6d")}
    sp, _ = scale_products("qk_nomin", mat6.arrays)
    a6["scales"] = jnp.asarray(np.asarray(sp, np.float32))

    def run_v0(x):
        return MM.quant_matmul(x, "qk_nomin", a6, M, C)

    ref = None
    for name, fn in [("q4k native ", run_q4k), ("v0 pair    ", run_v0),
                     ("v1 sf      ", run_v1), ("v0 repeat  ", run_v0)]:
        y = np.asarray(jax.jit(fn)(x))
        if ref is None:
            ref = y
        us = time_loop(fn, x)
        print(f"B={B} {name}: {us:7.1f} us/call", flush=True)
    # numeric check: v1 vs v0 (same quantized values, different kernels)
    y0 = np.asarray(jax.jit(run_v0)(x))
    y1 = np.asarray(jax.jit(run_v1)(x))
    print("v1-vs-v0 relerr:",
          float(np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-9)), flush=True)


if __name__ == "__main__" and "--bm" not in sys.argv:
    main()


def main_bm():
    """bm sweep for the single-field Q6_K head kernel."""
    B = 1
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((M, C)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((B, C)), jnp.bfloat16)
    print("probe:", jax.jit(lambda a: a + 1)(jnp.zeros(8)).block_until_ready()[0],
          flush=True)
    mat6 = Matrix.from_gguf_blocks(GgmlDType.Q6_K, quantize_q6_k(w), (M, C))

    real = MM._gemv_block_m
    for bm in (1024, 2048, 4096):
        MM._gemv_block_m = (
            lambda _bm: (lambda mm, kd=None: _bm if mm % _bm == 0 else real(mm, kd))
        )(bm)
        try:
            fn = lambda x: MM.quant_matmul(x, mat6.kind, mat6.arrays, M, C)
            _ = np.asarray(jax.jit(fn)(x))
            us = time_loop(fn, x)
            print(f"B={B} sf bm={bm}: {us:7.1f} us/call", flush=True)
        except Exception as e:
            print(f"B={B} sf bm={bm}: FAILED {str(e)[:110]}", flush=True)
        finally:
            MM._gemv_block_m = real


if __name__ == "__main__" and "--bm" in sys.argv:
    main_bm()
