"""Fused dequantize-matmul Pallas kernels.

One kernel family covers all block-quantized storage kinds (see
models/matrix.py): per M-tile, the packed codes are DMA'd to VMEM,
expanded to bf16 on the VPU (shift/mask + per-group FMA against the
de-interleaved scales), and contracted on the MXU — the dense weight
matrix is never materialized in HBM, so decode reads ≈ the quantized
byte count (the "speed-of-light" target the reference chased with its
WGSL K-quant shaders, ref: src/shaders/matmul_vec_q4k_v2.wgsl, and did
not reach — see BASELINE.md notes).

Layouts (from quant/repack.py):
  qk       codes u8 [M, K/2] split-halves nibbles; scales/mins [M, K/G]
  qk_b     codes u8 [M, K] (0..31);                scales/mins [M, K/G]
  qk_nomin codes i8 [M, K];                        scales       [M, K/G]
  int8     codes u8 [M, K]; mn/mx                  [M, K/128]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config


def _expand_groups(s: jax.Array, gsize: int) -> jax.Array:
    """[.., G] → [.., G*gsize] by repeating each group value.

    Mosaic cannot lower ``jnp.repeat`` here (minor-dim reshape), so emit
    an unrolled lane-slice concat: each group scalar broadcasts over its
    32/16-lane span.
    """
    g = s.shape[-1]
    parts = [
        jnp.broadcast_to(s[..., i : i + 1], s.shape[:-1] + (gsize,))
        for i in range(g)
    ]
    return jnp.concatenate(parts, axis=-1)


def _kernel(x_ref, codes_ref, scales_ref, out_ref, *, kind, gsize, k, extra_refs):
    x = x_ref[:]  # [N, K] bf16
    codes = codes_ref[:]
    # dequant arithmetic in f32, rounded to bf16 once — same rounding as
    # the XLA reference path (dequantize f32 → cast bf16 → MXU)
    if kind == "qk":
        # Mosaic has no u8→f32 cast; widen to i32 for the bit ops first
        ci = codes.astype(jnp.int32)
        lo = (ci & 0x0F).astype(jnp.float32)
        hi = (ci >> 4).astype(jnp.float32)
        q = jnp.concatenate([lo, hi], axis=-1)  # [TM, K]
    elif codes.dtype == jnp.uint8:
        q = codes.astype(jnp.int32).astype(jnp.float32)
    else:
        q = codes.astype(jnp.float32)

    if kind == "int8":
        mn_ref, mx_ref = extra_refs
        mn = mn_ref[:]
        mx = mx_ref[:]
        scale = _expand_groups((mx - mn) * (1.0 / 255.0), gsize)
        off = _expand_groups(mn, gsize)
        w = q * scale + off
    elif kind in ("qk", "qk_b"):
        (mins_ref,) = extra_refs
        scale = _expand_groups(scales_ref[:], gsize)
        mins = _expand_groups(mins_ref[:], gsize)
        w = q * scale - mins
    else:  # qk_nomin
        scale = _expand_groups(scales_ref[:], gsize)
        w = q * scale

    out_ref[:] = jax.lax.dot_general(
        x, w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def quant_matmul(
    x: jax.Array,  # [N, K]
    kind: str,
    arrays: dict,
    m: int,
    k: int,
    *,
    block_m: int = 512,
) -> jax.Array:
    """y[n, m] = Σ_k x[n,k]·W[m,k] with W stored quantized. Returns f32."""
    n = x.shape[0]
    x = x.astype(jnp.bfloat16)

    if kind == "int8":
        scales = arrays["mn"]  # placeholder slot; extras carry mn/mx
        extras = (arrays["mn"].astype(jnp.float32), arrays["mx"].astype(jnp.float32))
        codes = arrays["codes"]
        kdim = k
    elif kind == "qk":
        scales = arrays["scales"].astype(jnp.float32)
        extras = (arrays["mins"].astype(jnp.float32),)
        codes = arrays["codes"]
        kdim = k // 2
    elif kind == "qk_b":
        scales = arrays["scales"].astype(jnp.float32)
        extras = (arrays["mins"].astype(jnp.float32),)
        codes = arrays["codes"]
        kdim = k
    else:  # qk_nomin
        scales = arrays["scales"].astype(jnp.float32)
        extras = ()
        codes = arrays["codes"]
        kdim = k

    g = scales.shape[-1]
    gsize = k // g

    # VMEM budget: the kernel holds ~5 f32 intermediates of [block_m, K]
    # (unpack, scale/min expansion, dequantized tile) — keep the tile
    # under ~2M elements so the scoped allocation stays well inside the
    # 16 MB VMEM limit
    while block_m > 64 and block_m * k > 400_000:
        block_m //= 2
    while m % block_m:
        block_m //= 2
    grid = (m // block_m,)

    in_specs = [
        pl.BlockSpec((n, x.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for e in extras:
        in_specs.append(
            pl.BlockSpec((block_m, e.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _body_dispatch, kind=kind, gsize=gsize, k=k, n_extras=len(extras)
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n, block_m), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k,
            bytes_accessed=codes.size + scales.size * 4 + n * k * 2 + n * m * 4,
            transcendentals=0,
        ),
    )(x, codes, scales, *extras)
    return out


def _body_dispatch(x_ref, codes_ref, scales_ref, *rest, kind, gsize, k, n_extras):
    extra_refs = rest[:n_extras]
    out_ref = rest[n_extras]
    _kernel(
        x_ref, codes_ref, scales_ref, out_ref,
        kind=kind, gsize=gsize, k=k, extra_refs=extra_refs,
    )
