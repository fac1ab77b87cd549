"""Fused dequantize-matmul Pallas kernels.

One kernel family covers all block-quantized storage kinds (see
models/matrix.py): per M-tile, the packed codes are DMA'd to VMEM,
expanded to bf16 on the VPU (shift/mask + per-group FMA against the
de-interleaved scales), and contracted on the MXU — the dense weight
matrix is never materialized in HBM, so decode reads ≈ the quantized
byte count (the "speed-of-light" target the reference chased with its
WGSL K-quant shaders, ref: src/shaders/matmul_vec_q4k_v2.wgsl, and did
not reach — see BASELINE.md notes).

The f32 dequant intermediates are the VMEM pressure point, so the kernel
processes K in slabs (static unrolled loop) and accumulates partial dot
products: only [block_m, SLAB_K]-sized temporaries are ever live.

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

# dequant temporaries per K-slab: several i32/f32 copies live at once
# (unpack, group expansion, dequant, and both halves for "qk"), so keep
# block_m·SLAB small enough that ~20 bytes/element stays well under the
# 16 MB scoped-VMEM limit together with the code/scale blocks
_MAX_TILE_ELEMS = 131_072


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


def _dequant_slab(kind, codes, scales, extras, gsize):
    """Dequantize one [TM, slab] slice of codes to bf16 (f32 arithmetic,
    rounded once — same rounding as the XLA reference path)."""
    if codes.dtype == jnp.uint8:
        q = codes.astype(jnp.int32).astype(jnp.float32)
    else:
        q = codes.astype(jnp.float32)
    if kind == "int8":
        mn, mx = extras
        scale = _expand_groups((mx - mn) * (1.0 / 255.0), gsize)
        off = _expand_groups(mn, gsize)
        w = q * scale + off
    elif kind in ("qk", "qk_b"):
        (mins,) = extras
        scale = _expand_groups(scales, gsize)
        w = q * scale - _expand_groups(mins, gsize)
    else:  # qk_nomin
        w = q * _expand_groups(scales, gsize)
    return w.astype(jnp.bfloat16)


def _kernel(x_ref, codes_ref, scales_ref, out_ref, *, kind, gsize, k,
            slab, extra_refs):
    x = x_ref[:]  # [N, K] bf16
    acc = None

    def dot(xs, w):
        return jax.lax.dot_general(
            xs, w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if kind == "qk":
        # split-halves: code byte j covers elements j and j+K/2
        half = k // 2
        for s in range(0, half, slab):
            e = min(s + slab, half)
            ci = codes_ref[:, s:e].astype(jnp.int32)
            gs, ge = s // gsize, e // gsize
            ghs, ghe = (half + s) // gsize, (half + e) // gsize
            lo = _dequant_slab(
                kind, ci & 0x0F, scales_ref[:, gs:ge],
                tuple(r[:, gs:ge] for r in extra_refs), gsize,
            )
            hi = _dequant_slab(
                kind, ci >> 4, scales_ref[:, ghs:ghe],
                tuple(r[:, ghs:ghe] for r in extra_refs), gsize,
            )
            part = dot(x[:, s:e], lo) + dot(x[:, half + s : half + e], hi)
            acc = part if acc is None else acc + part
    else:
        for s in range(0, k, slab):
            e = min(s + slab, k)
            gs, ge = s // gsize, e // gsize
            w = _dequant_slab(
                kind, codes_ref[:, s:e], scales_ref[:, gs:ge],
                tuple(r[:, gs:ge] for r in extra_refs), gsize,
            )
            part = dot(x[:, s:e], w)
            acc = part if acc is None else acc + part

    out_ref[:] = acc


def _pick_slab(block_m: int, k: int, gsize: int) -> int:
    """Largest K-slab (multiple of lcm(gsize, 128)) within the VMEM budget."""
    step = gsize
    while step % 128:
        step += gsize
    slab = max(step, (_MAX_TILE_ELEMS // block_m) // step * step)
    return min(slab, -(-k // step) * step)


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

    while m % block_m:
        block_m //= 2
    grid = (m // block_m,)
    slab = _pick_slab(block_m, k, gsize)

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
        _body_dispatch, kind=kind, gsize=gsize, k=k, slab=slab,
        n_extras=len(extras),
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


def _body_dispatch(x_ref, codes_ref, scales_ref, *rest, kind, gsize, k, slab,
                   n_extras):
    extra_refs = rest[:n_extras]
    out_ref = rest[n_extras]
    _kernel(
        x_ref, codes_ref, scales_ref, out_ref,
        kind=kind, gsize=gsize, k=k, slab=slab, extra_refs=extra_refs,
    )
