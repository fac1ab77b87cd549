"""Wide-gemv scale-expansion strategies A/B on the real chip (round 4).

The wide (batched) gemv expands per-group scales along K into the code
planes. Round-3 does it with an MXU mask dot ([g,m'] rows @ [g,k] 0/1)
— one extra weight-plane-sized MXU pass per half (x2 with the
double-bf16 correction). Candidate: stream the scales TRANSPOSED
([m', g], the storage-major orientation) and expand by exact VPU
lane-broadcast concats — no MXU pass, no expansion rounding (the
slab kernel's N>=512 branch proves the concat lowers).

Shapes: the B=8 layer-stack hot matrices — ffn.Wv [768, 2688] (g=84)
and an rkv-like [768, 768] (g=24), plus the [2688, 768] ffn.Wk.

Usage: python scripts/bench_wide_expand_ab.py [B]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _planes(codes):
    w = pltpu.bitcast(codes, jnp.int32)
    base = jnp.int32(0x43004300)
    mk7 = jnp.int32(0x007F007F)
    pa = pltpu.bitcast(base | (w & mk7), jnp.bfloat16)
    pb = pltpu.bitcast(base | ((w >> 8) & mk7), jnp.bfloat16)
    return pa, pb


def _kernel(codes_ref, st_ref, off_ref, x_ref, out_ref, *, n, g, k, gsize,
            m, expand, precise):
    """Single-field wide gemv; ``expand`` picks the scale expansion:
    'dot' = MXU mask dot from [g, m'] rows; 'lane' = VPU broadcast
    concat from [m', g] transposed rows."""
    pa, pb = _planes(codes_ref[:])
    f32 = jnp.float32
    m2 = m // 2
    e2 = (
        jax.lax.broadcasted_iota(jnp.int32, (g, k), 1) // gsize
        == jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
    ).astype(jnp.bfloat16)
    xb = x_ref[:]

    if expand == "dot":
        def sexp(rows):  # [g, m'] -> [m', k]
            hi = rows.astype(jnp.bfloat16)
            dn = (((0,), (0,)), ((), ()))
            out = jax.lax.dot_general(hi, e2, dimension_numbers=dn,
                                      preferred_element_type=f32)
            if precise:
                lo = (rows - hi.astype(f32)).astype(jnp.bfloat16)
                out = out + jax.lax.dot_general(lo, e2, dimension_numbers=dn,
                                                preferred_element_type=f32)
            return out
        s_a = sexp(st_ref[:, :m2])
        s_b = sexp(st_ref[:, m2:])
    else:
        def sexp_t(rows):  # [m', g] -> [m', k] exact lane broadcast
            parts = [
                jnp.broadcast_to(rows[:, j : j + 1], (m2, gsize))
                for j in range(g)
            ]
            return jnp.concatenate(parts, axis=1)
        s_a = sexp_t(st_ref[:m2])
        s_b = sexp_t(st_ref[m2:])

    def mdot(plane, s_exp):
        w_eff = plane.astype(f32) * s_exp
        hi = w_eff.astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        out = jax.lax.dot_general(xb, hi, dimension_numbers=dn,
                                  preferred_element_type=f32)
        if precise:
            lo = (w_eff - hi.astype(f32)).astype(jnp.bfloat16)
            out = out + jax.lax.dot_general(xb, lo, dimension_numbers=dn,
                                            preferred_element_type=f32)
        return out

    y_a = mdot(pa, s_a)
    y_b = mdot(pb, s_b)
    sx = jax.lax.dot_general(
        xb, e2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    corr = jax.lax.dot_general(
        sx, off_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    out_ref[:] = jnp.concatenate([y_a, y_b], axis=1) - corr


def build(m, k, gsize, n, expand, precise=True, seed=0):
    rng = np.random.default_rng(seed)
    g = k // gsize
    codes = jnp.asarray(rng.integers(32, 96, (m, k), dtype=np.uint8))
    s = (rng.random((g, m)).astype(np.float32) + 0.5) * 0.01
    st = jnp.asarray(s if expand == "dot" else np.ascontiguousarray(s.T))
    off = jnp.asarray(192.0 * s)
    kern = functools.partial(
        _kernel, n=n, g=g, k=k, gsize=gsize, m=m, expand=expand,
        precise=precise,
    )
    st_spec = (
        pl.BlockSpec((g, m), lambda: (0, 0), memory_space=pltpu.VMEM)
        if expand == "dot"
        else pl.BlockSpec((m, g), lambda: (0, 0), memory_space=pltpu.VMEM)
    )

    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((m, k), lambda: (0, 0), memory_space=pltpu.VMEM),
                st_spec,
                pl.BlockSpec((g, m), lambda: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, k), lambda: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, m), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * m * k, bytes_accessed=m * k + g * m * 8,
                transcendentals=0,
            ),
        )(codes, st, off, x.astype(jnp.bfloat16))

    return run


def time_loop(fn, x, k_width, length_s=128, reps=3):
    def chain(x, length):  # x f32 so the feedback never rounds away
        def body(x, _):
            y = fn(x)
            return x.at[:, :k_width].add(y[:, :k_width] * 1e-3), ()
        x, _ = jax.lax.scan(body, x, None, length=length)
        return x

    runs = {}
    for length in (length_s, 4 * length_s):
        r = jax.jit(functools.partial(chain, length=length))
        _ = np.asarray(r(x))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(r(x))
            best = min(best, time.perf_counter() - t0)
        runs[length] = best
    return 1e6 * (runs[4 * length_s] - runs[length_s]) / (3 * length_s)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(1)
    print("probe:", jax.jit(lambda a: a + 1)(jnp.zeros(8)).block_until_ready()[0],
          flush=True)
    for name, m, k, gsize in [
        ("fv [768,2688] g=168", 768, 2688, 16),
        ("rkv [768,768] g=48 ", 768, 768, 16),
        ("fk [2688,768] g=48 ", 2688, 768, 16),
    ]:
        ref = None
        x = jnp.asarray(rng.standard_normal((B, k)).astype(np.float32) * 0.5)
        for expand in ("dot", "lane", "dot"):
            for precise in (True, False):
                fn = build(m, k, gsize, B, expand, precise)
                y = np.asarray(jax.jit(fn)(x))
                if ref is None:
                    ref = y
                err = float(np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9))
                us = time_loop(fn, x, min(k, m))
                print(f"B={B} {name} {expand:4s} precise={int(precise)}: "
                      f"{us:7.1f} us  relerr={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
