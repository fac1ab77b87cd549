"""Head-gemv kernel variants A/B on the real chip.

The [65536, 768] Q4_K decode gemv measures ~101 us in-loop (372 GB/s
effective incl. f32 scale operands) — above the ~50 us DMA floor, i.e.
VPU-unpack-bound. Variants probe which knob moves it:

  v0  current kernel (baseline)
  v1  f32 MXU dots (skip the f32->bf16 cast of the unpacked planes)
  v2  bm=1024/2048 (fewer grid steps, bigger DMA chunks)
  v3  byte-plane-first extraction (B=(w>>8b)&0xFF, then lo/hi from B)

Chain-timed inside one jit + host fetch (block_until_ready lies over
this tunnel; see CLAUDE.md).

Usage: python scripts/bench_head_variants.py
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

M, C = 65536, 768


def _gemv_kernel_var(codes_ref, st_ref, mnt_ref, sxt_ref, xlo_ref, xhi_ref,
                     out_ref, *, n, g, gh, bm, variant):
    w = pltpu.bitcast(codes_ref[:], jnp.int32)  # [BM/4, kdim]
    q = bm // 4
    dotdt = jnp.float32 if variant == "f32dot" else jnp.bfloat16

    def dot(xm, part):
        return jax.lax.dot_general(
            xm, part, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for b in range(4):
        if variant == "byteplane":
            byte = (w >> (8 * b)) & 0xFF
            lo = (byte & 0xF).astype(jnp.float32).astype(dotdt)
            hi = (byte >> 4).astype(jnp.float32).astype(dotdt)
        else:
            lo = ((w >> (8 * b)) & 0xF).astype(jnp.float32).astype(dotdt)
            hi = ((w >> (8 * b + 4)) & 0xF).astype(jnp.float32).astype(dotdt)
        plo = dot(xlo_ref[:].astype(dotdt), lo)  # [N*Gh, BM/4]
        phi = dot(xhi_ref[:].astype(dotdt), hi)

        sblk = st_ref[:, b * q : (b + 1) * q].astype(jnp.float32)
        mnblk = mnt_ref[:, b * q : (b + 1) * q].astype(jnp.float32)
        for nn in range(n):
            p = jnp.concatenate(
                [plo[nn * gh : (nn + 1) * gh], phi[nn * gh : (nn + 1) * gh]],
                axis=0,
            )
            y = jnp.sum(p * sblk, axis=0, keepdims=True)
            sx = sxt_ref[:, nn : nn + 1]
            y = y - jnp.sum(mnblk * sx, axis=0, keepdims=True)
            out_ref[nn * 4 + b : nn * 4 + b + 1, :] = y


def build_gemv(mat, bm, variant, scale_dtype=jnp.float32):
    a = mat.arrays
    m, k = mat.dims()
    kdim = k // 2
    gsize = 32
    g = k // gsize
    gh = g // 2
    codes = a["codes"]
    # re-tile the position-ordered scales for this bm
    scales = np.asarray(a["scales"], np.float32)
    mins = np.asarray(a["mins"], np.float32)

    def to_pos(arr):
        arr = arr.reshape(m // bm, bm // 4, 4, g)
        return np.ascontiguousarray(arr.transpose(3, 0, 2, 1).reshape(g, m))

    st = jnp.asarray(to_pos(scales), scale_dtype)
    mnt = jnp.asarray(to_pos(mins), scale_dtype)
    e = jnp.asarray(pm._expand_matrix(gsize, kdim, np.float32), jnp.bfloat16)

    def run(x):  # [1, k] bf16
        n = x.shape[0]
        xb = x.astype(jnp.bfloat16)
        sxt = x.astype(jnp.float32).reshape(n, g, gsize).sum(-1).T
        xlo = (xb[:, None, :kdim] * e[None]).reshape(n * gh, kdim)
        xhi = (xb[:, None, kdim:] * e[None]).reshape(n * gh, kdim)
        kernel = functools.partial(
            _gemv_kernel_var, n=n, g=g, gh=gh, bm=bm, variant=variant
        )
        out = pl.pallas_call(
            kernel,
            grid=(m // bm,),
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
            out_shape=jax.ShapeDtypeStruct((4 * n, m // 4), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * m * k,
                bytes_accessed=codes.size + st.size * st.dtype.itemsize * 2
                + n * k * 2 + n * m * 4,
                transcendentals=0,
            ),
        )(codes, st, mnt, sxt, xlo, xhi)
        return (
            out.reshape(n, 4, m // bm, bm // 4).transpose(0, 2, 3, 1).reshape(n, m)
        )

    return run


def time_loop(fn, x, length_s=128, reps=3):
    def chain(x, length):
        def body(x, _):
            y = fn(x)
            return x + y[:, :C].astype(x.dtype) * 1e-6, ()

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
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((M, C)) * 0.05).astype(np.float32)
    raw = quantize_q4_k(w)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (M, C))
    x = jnp.asarray(rng.standard_normal((1, C)), jnp.bfloat16)

    ref = None
    for name, bm, variant, sdt in [
        ("v0 current  bm=512 ", 512, "base", jnp.float32),
        ("v1 f32 dots bm=512 ", 512, "f32dot", jnp.float32),
        ("v2 bm=2048         ", 2048, "base", jnp.float32),
        ("v2 bm=4096         ", 4096, "base", jnp.float32),
        ("v3 byteplane bm=512", 512, "byteplane", jnp.float32),
        ("v4 bf16 st bm=2048 ", 2048, "base", jnp.bfloat16),
    ]:
        try:
            fn = build_gemv(mat, bm, variant, sdt)
            y = np.asarray(fn(x))
            if ref is None:
                ref = y
            err = float(np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9))
            us = time_loop(fn, x)
            gbs = (mat.arrays["codes"].size + 2 * 24 * M * (2 if sdt == jnp.bfloat16 else 4)) / us / 1e3
            print(f"{name}: {us:7.2f} us  ({gbs:4.0f} GB/s)  relerr={err:.2e}",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:120]}", flush=True)


if __name__ == "__main__" and "--tiled" not in sys.argv and "--final" not in sys.argv:
    main()


# --- contiguous per-tile scale layout variants (appended) -----------------


def build_gemv_tiled(mat, bm, scale_dtype=jnp.float32):
    """st/mnt stored [m//bm, g, bm] so each grid step's scale block is one
    contiguous DMA (the [g, m] layout loads bm-column slices with row
    stride m — measured well under HBM speed)."""
    a = mat.arrays
    m, k = mat.dims()
    kdim = k // 2
    gsize = 32
    g = k // gsize
    gh = g // 2
    codes = a["codes"]
    scales = np.asarray(a["scales"], np.float32)
    mins = np.asarray(a["mins"], np.float32)

    def to_pos_tiled(arr):
        arr = arr.reshape(m // bm, bm // 4, 4, g)
        return np.ascontiguousarray(arr.transpose(0, 3, 2, 1))  # [nb, g, 4, bm/4]

    st = jnp.asarray(to_pos_tiled(scales).reshape(m // bm, g, bm), scale_dtype)
    mnt = jnp.asarray(to_pos_tiled(mins).reshape(m // bm, g, bm), scale_dtype)
    e = jnp.asarray(pm._expand_matrix(gsize, kdim, np.float32), jnp.bfloat16)

    def kernel(codes_ref, st_ref, mnt_ref, sxt_ref, xlo_ref, xhi_ref, out_ref,
               *, n, g, gh, bm):
        w = pltpu.bitcast(codes_ref[:], jnp.int32)
        q = bm // 4

        def dot(xm, part):
            return jax.lax.dot_general(
                xm, part, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        for b in range(4):
            lo = ((w >> (8 * b)) & 0xF).astype(jnp.float32).astype(jnp.bfloat16)
            hi = ((w >> (8 * b + 4)) & 0xF).astype(jnp.float32).astype(jnp.bfloat16)
            plo = dot(xlo_ref[:], lo)
            phi = dot(xhi_ref[:], hi)
            sblk = st_ref[0, :, b * q : (b + 1) * q].astype(jnp.float32)
            mnblk = mnt_ref[0, :, b * q : (b + 1) * q].astype(jnp.float32)
            for nn in range(n):
                p = jnp.concatenate(
                    [plo[nn * gh : (nn + 1) * gh], phi[nn * gh : (nn + 1) * gh]], axis=0)
                y = jnp.sum(p * sblk, axis=0, keepdims=True)
                sx = sxt_ref[:, nn : nn + 1]
                y = y - jnp.sum(mnblk * sx, axis=0, keepdims=True)
                out_ref[nn * 4 + b : nn * 4 + b + 1, :] = y

    def run(x):
        n = x.shape[0]
        xb = x.astype(jnp.bfloat16)
        sxt = x.astype(jnp.float32).reshape(n, g, gsize).sum(-1).T
        xlo = (xb[:, None, :kdim] * e[None]).reshape(n * gh, kdim)
        xhi = (xb[:, None, kdim:] * e[None]).reshape(n * gh, kdim)
        out = pl.pallas_call(
            functools.partial(kernel, n=n, g=g, gh=gh, bm=bm),
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g, bm), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g, bm), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n * gh, kdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n * gh, kdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (4 * n, bm // 4), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4 * n, m // 4), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * m * k,
                bytes_accessed=codes.size + st.size * st.dtype.itemsize * 2
                + n * k * 2 + n * m * 4,
                transcendentals=0,
            ),
        )(codes, st, mnt, sxt, xlo, xhi)
        return out.reshape(n, 4, m // bm, bm // 4).transpose(0, 2, 3, 1).reshape(n, m)

    return run


def main_tiled():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((M, C)) * 0.05).astype(np.float32)
    raw = quantize_q4_k(w)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (M, C))
    x = jnp.asarray(rng.standard_normal((1, C)), jnp.bfloat16)
    ref = np.asarray(build_gemv(mat, 512, "base")(x))
    for name, bm, sdt in [
        ("v5 tiled f32 bm=2048 ", 2048, jnp.float32),
        ("v5 tiled f32 bm=4096 ", 4096, jnp.float32),
        ("v6 tiled bf16 bm=4096", 4096, jnp.bfloat16),
    ]:
        try:
            fn = build_gemv_tiled(mat, bm, sdt)
            y = np.asarray(fn(x))
            err = float(np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9))
            us = time_loop(fn, x)
            nb = mat.arrays["codes"].size + 2 * 24 * M * (2 if sdt == jnp.bfloat16 else 4)
            print(f"{name}: {us:7.2f} us  ({nb/us/1e3:4.0f} GB/s)  relerr={err:.2e}",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:160]}", flush=True)


if __name__ == "__main__" and "--tiled" in sys.argv and "--final" not in sys.argv:
    main_tiled()


def main_final():
    """All contenders in ONE session (in-session comparisons only), with a
    baseline repeat at the end to detect drift."""
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((M, C)) * 0.05).astype(np.float32)
    raw = quantize_q4_k(w)
    mat = Matrix.from_gguf_blocks(GgmlDType.Q4_K, raw, (M, C))
    x = jnp.asarray(rng.standard_normal((1, C)), jnp.bfloat16)
    cases = [
        ("A strided f32 bm=512 ", lambda: build_gemv(mat, 512, "base")),
        ("B strided f32 bm=4096", lambda: build_gemv(mat, 4096, "base")),
        ("C strided bf16 bm=2048", lambda: build_gemv(mat, 2048, "base", jnp.bfloat16)),
        ("D tiled   f32 bm=4096", lambda: build_gemv_tiled(mat, 4096)),
        ("E tiled   bf16 bm=4096", lambda: build_gemv_tiled(mat, 4096, jnp.bfloat16)),
        ("A strided f32 bm=512 (repeat)", lambda: build_gemv(mat, 512, "base")),
    ]
    for name, mk in cases:
        fn = mk()
        us = time_loop(fn, x)
        print(f"{name}: {us:7.2f} us", flush=True)


if __name__ == "__main__" and "--final" in sys.argv:
    main_final()


def bench_bm_sweep(argv=None):
    """Head gemv timing across M-tile sizes at a given batch:
    python -c "import sys; sys.path.insert(0,'.'); \
        from scripts.bench_head_variants import bench_bm_sweep; bench_bm_sweep()" [B]
    """
    import sys as _sys
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import log
    from web_rwkv_gguf_tpu.ops.pallas import matmul as MM
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    B = int((argv or _sys.argv[1:] or ["1"])[0])
    info, params = synthetic_v7_params(quant="q4k")
    head = params["head"]
    m, k = head.dims()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, k)).astype(np.float32))

    real = MM._gemv_block_m
    for bm in (8192, 4096, 2048, 1024):
        MM._gemv_block_m = (lambda _bm: (lambda mm, kd=None: _bm if mm % _bm == 0 else real(mm, kd)))(bm)
        try:
            jf = jax.jit(lambda x: MM.quant_matmul(x, head.kind, head.arrays, m, k))
            y = jf(x); _ = np.asarray(y)

            def chain(n):
                yy = x
                t0 = time.perf_counter()
                o = None
                for _ in range(n):
                    o = jf(yy)
                    yy = o[:, :k]
                _ = np.asarray(o[:, :8])
                return time.perf_counter() - t0
            chain(4)
            t1 = min(chain(16) for _ in range(3))
            t2 = min(chain(48) for _ in range(3))
            log(f"B={B} head bm={bm}: {1e6*(t2-t1)/32:8.1f} us/call")
        except Exception as e:
            log(f"B={B} head bm={bm}: FAILED {str(e)[:90]}")
        finally:
            MM._gemv_block_m = real
