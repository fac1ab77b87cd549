"""Fused dequantize-matmul Pallas kernels.

One kernel family covers all block-quantized storage kinds (see
models/matrix.py): per M-tile, the packed codes are DMA'd to VMEM,
expanded to bf16 (shift/mask + scale), and contracted on the MXU — the
dense weight matrix is never materialized in HBM, so decode reads ≈ the
quantized byte count (the "speed-of-light" target the reference chased
with its WGSL K-quant shaders, ref: src/shaders/matmul_vec_q4k_v2.wgsl,
and did not reach — see BASELINE.md notes).

Two design points keep the dequant off the VPU's critical path:

* **Scale expansion runs on the MXU.** Broadcasting per-32-group scales
  across their lane span is a lane-crossing relayout on the VPU (Mosaic
  lowers it to unrolled slice concats). Instead the kernel computes
  ``scales[:, gs:ge] @ E`` where ``E[g, j] = (j // gsize == g)`` is a
  constant 0/1 expansion matrix — one small matmul per K-slab, leaving
  only mask/shift/cast/multiply per dequantized element.
* **Group offsets (mins) never expand at all.** The offset term of
  ``w = q·s − mn`` factors out of the contraction:
  ``Σ_k mn[m,⌊k/g⌋]·x[k] = Σ_g mn[m,g]·(Σ_{k∈g} x[k])`` — the group
  sums of ``x`` are one matmul against ``Eᵀ`` and the correction is a
  tiny ``[N,G]×[G,M]`` matmul, all in f32 (more accurate than the
  rounded-dense reference path).

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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config

# dequant temporaries per K-slab: several i32/f32 copies live at once
# (unpack, expanded scales, dequant, and both halves for "qk"), so keep
# block_m·SLAB small enough that ~20 bytes/element stays well under the
# 16 MB scoped-VMEM limit together with the code/scale blocks
_MAX_TILE_ELEMS = 131_072


def _expand_matrix(gsize: int, width: int, dtype) -> np.ndarray:
    """[G, width] 0/1 matrix with E[g, j] = (j // gsize == g)."""
    g = width // gsize
    e = np.zeros((g, width), dtype)
    for i in range(g):
        e[i, i * gsize : (i + 1) * gsize] = 1
    return e


def _dotf32(a, b):
    """[M, G] f32 × [G, W] f32 → [M, W] f32 on the MXU."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _lut_tree(idx, lut_ref):
    """Map 4-bit codebook indices to f32 values via a binary select tree
    (the NF4/SF4 16-entry LUT lives in VMEM; lane-dim gathers are not
    available in Mosaic, so the lookup is 15 vector selects).
    Ref: matmul_vec_nf4.wgsl:52-79 reads the same LUT per nibble."""
    ls = [lut_ref[0, i] for i in range(16)]
    bits = [((idx >> i) & 1) > 0 for i in range(4)]
    lvl = [jnp.where(bits[0], ls[2 * i + 1], ls[2 * i]) for i in range(8)]
    lvl = [jnp.where(bits[1], lvl[2 * i + 1], lvl[2 * i]) for i in range(4)]
    lvl = [jnp.where(bits[2], lvl[2 * i + 1], lvl[2 * i]) for i in range(2)]
    return jnp.where(bits[3], lvl[1], lvl[0])


def _kernel(x_ref, codes_ref, scales_ref, *rest, kind, gsize, k, slab,
            has_offset, offset_sign, has_lut=False):
    refs = list(rest)
    off_ref = refs.pop(0) if has_offset else None
    lut_ref = refs.pop(0) if has_lut else None
    eslab_ref = refs.pop(0)
    efull_ref = refs.pop(0) if has_offset else None
    out_ref = refs.pop(0)

    x = x_ref[:]  # [N, K] bf16
    acc = None

    def dot(xs, w):
        return jax.lax.dot_general(
            xs, w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def to_f32(c):
        if c.dtype == jnp.uint8 or c.dtype == jnp.int8:
            return c.astype(jnp.int32).astype(jnp.float32)
        return c.astype(jnp.float32)

    def expand(sc_block, width):
        if x.shape[0] >= config.slab_vpu_expand_min_n:
            # lane-broadcast concat on the VPU: frees the MXU of the
            # expansion pass. Wins once the main gemm saturates the MXU
            # (large N); below the threshold the dot rides the MXU for
            # free while the VPU is the busy unit (widen + multiply) —
            # see config.slab_vpu_expand_min_n for the measured A/B.
            tm = sc_block.shape[0]
            parts = [
                jnp.broadcast_to(sc_block[:, j : j + 1], (tm, gsize))
                for j in range(sc_block.shape[-1])
            ]
            return jnp.concatenate(parts, axis=1)
        # [TM, Gw] f32 @ [Gw, width] f32 → [TM, width] f32 (MXU)
        return _dotf32(sc_block, eslab_ref[: sc_block.shape[-1], :width])

    if kind in ("qk", "nf4"):
        # split-plane nibbles: for "qk" code byte j covers elements j and
        # j+K/2 (split-halves repack); for "nf4" byte j covers elements 2j
        # (lo) and 2j+1 (hi) and the CALLER de-interleaves x into
        # [evens | odds] so the same plane/group math applies, with the
        # per-64 absmax tiled twice as the scale array
        half = k // 2
        for s in range(0, half, slab):
            e = min(s + slab, half)
            ci = codes_ref[:, s:e].astype(jnp.int32)
            gs, ge = s // gsize, e // gsize
            ghs, ghe = (half + s) // gsize, (half + e) // gsize
            if has_lut:
                lo_q = _lut_tree(ci & 0x0F, lut_ref)
                hi_q = _lut_tree(ci >> 4, lut_ref)
            else:
                lo_q = (ci & 0x0F).astype(jnp.float32)
                hi_q = (ci >> 4).astype(jnp.float32)
            lo = (lo_q * expand(scales_ref[:, gs:ge], e - s)).astype(jnp.bfloat16)
            hi = (hi_q * expand(scales_ref[:, ghs:ghe], e - s)).astype(jnp.bfloat16)
            part = dot(x[:, s:e], lo) + dot(x[:, half + s : half + e], hi)
            acc = part if acc is None else acc + part
    else:
        for s in range(0, k, slab):
            e = min(s + slab, k)
            gs, ge = s // gsize, e // gsize
            w = (to_f32(codes_ref[:, s:e])
                 * expand(scales_ref[:, gs:ge], e - s)).astype(jnp.bfloat16)
            part = dot(x[:, s:e], w)
            acc = part if acc is None else acc + part

    if has_offset:
        # Σ_g off[m,g]·(Σ_{k∈g} x[k]): group sums via Eᵀ, then one small
        # f32 matmul — offsets are never expanded across lanes
        xs = dot(x, efull_ref[:])  # [N, G] f32
        corr = jax.lax.dot_general(
            xs, off_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + offset_sign * corr

    out_ref[:] = acc


# ---------------------------------------------------------------------------
# decode gemv: bitcast-packed unpack, grouped partials on the MXU
# ---------------------------------------------------------------------------
#
# The slab kernel above widens u8 codes to i32 lanes before dequantizing —
# a sublane-unpack relayout that caps it at ~¼ of HBM speed for small N.
# For gemv-shaped calls this kernel instead REINTERPRETS the code block:
# `pltpu.bitcast(u8[BM, K], i32)` packs rows 4s..4s+3 into one i32 lane
# (row 4s+b at bits 8b, little-endian — verified identical on hw and in
# interpret mode), so nibble/byte extraction is pure lane-local ALU with
# no relayout. The extracted planes are contracted on the MXU against
# per-group masked copies of x (output width N·G ≤ 128 is free for a
# gemv), giving per-group partial sums; per-32-group scales then apply as
# a [G, BM/4] multiply + sublane reduction — never expanded across K.
# Group offsets (mins) factor out exactly as in the slab kernel. Runs at
# the DMA floor (~3x the slab kernel) on the decode path.
#
# The kernel's natural output order interleaves rows (position
# tile·BM + b·BM/4 + s holds logical row tile·BM + 4s + b); one cheap
# XLA reshape/transpose outside restores logical order, and the scale
# operands are pre-permuted into position order at trace time (they are
# loop-invariant in a decode scan, so XLA hoists the permutation).


def _gemv_kernel(codes_ref, st_ref, *rest, kind, n, g, gh, bm, has_offset,
                 offset_sign, signed_codes, kdim, gsize, has_lut=False):
    refs = list(rest)
    mnt_ref = refs.pop(0) if has_offset else None
    lut_ref = refs.pop(0) if has_lut else None
    x_ref = refs.pop(0)  # [N, K] bf16 (raw input row(s))
    out_ref = refs.pop(0)

    w = pltpu.bitcast(codes_ref[:], jnp.int32)  # [BM/4, kdim]
    q = bm // 4
    split = kind in ("qk", "nf4")

    # per-group masked-x operands and group sums, built IN-kernel: as XLA
    # producer ops these cost ~1 us of launch overhead per call — a third
    # of a small gemv's whole budget at decode — vs trivial VPU work here
    groups = gh if split else g
    gmask = (
        jax.lax.broadcasted_iota(jnp.int32, (groups, kdim), 1) // gsize
        == jax.lax.broadcasted_iota(jnp.int32, (groups, kdim), 0)
    ).astype(jnp.bfloat16)
    x = x_ref[:]

    def group_expand(xpart):  # [N, kdim] → [N*groups, kdim] masked copies
        x3 = jnp.expand_dims(xpart, 1)  # [N, 1, kdim]
        return (x3 * jnp.expand_dims(gmask, 0)).reshape(n * groups, kdim)

    if split:
        xlo = group_expand(x[:, :kdim])
        xhi = group_expand(x[:, kdim:])
        if has_offset:
            slo = jnp.sum(xlo.astype(jnp.float32), axis=1, keepdims=True)
            shi = jnp.sum(xhi.astype(jnp.float32), axis=1, keepdims=True)
    else:
        xm = group_expand(x)
        if has_offset:
            sxm = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)

    def dot(xs, part):
        return jax.lax.dot_general(
            xs, part, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for b in range(4):
        if split:
            lo_q = (w >> (8 * b)) & 0xF
            hi_q = (w >> (8 * b + 4)) & 0xF
            if has_lut:
                lo = _lut_tree(lo_q, lut_ref).astype(jnp.bfloat16)
                hi = _lut_tree(hi_q, lut_ref).astype(jnp.bfloat16)
            else:
                lo = lo_q.astype(jnp.float32).astype(jnp.bfloat16)
                hi = hi_q.astype(jnp.float32).astype(jnp.bfloat16)
            plo = dot(xlo, lo)  # [N*Gh, BM/4]
            phi = dot(xhi, hi)
        else:
            if signed_codes:
                byte = (w << (8 * (3 - b))) >> 24  # arithmetic: sign-extends
            else:
                byte = (w >> (8 * b)) & 0xFF
            p_all = dot(xm, byte.astype(jnp.float32).astype(jnp.bfloat16))

        sblk = st_ref[:, b * q : (b + 1) * q]  # [G, BM/4]
        mnblk = mnt_ref[:, b * q : (b + 1) * q] if has_offset else None
        for nn in range(n):
            if split:
                p = jnp.concatenate(
                    [plo[nn * gh : (nn + 1) * gh], phi[nn * gh : (nn + 1) * gh]],
                    axis=0,
                )  # [G, BM/4]
            else:
                p = p_all[nn * g : (nn + 1) * g]
            y = jnp.sum(p * sblk, axis=0, keepdims=True)  # [1, BM/4]
            if has_offset:
                if split:
                    sx = jnp.concatenate(
                        [slo[nn * gh : (nn + 1) * gh], shi[nn * gh : (nn + 1) * gh]],
                        axis=0,
                    )  # [G, 1]
                else:
                    sx = sxm[nn * g : (nn + 1) * g]
                y = y + offset_sign * jnp.sum(mnblk * sx, axis=0, keepdims=True)
            out_ref[nn * 4 + b : nn * 4 + b + 1, :] = y


def build_gemv_operands(kind, scales, mins, m, k, kdim, signed) -> dict:
    """Precomputed scale/offset operands for the v2 packed-pair gemv
    kernel (``_gemv_kernel2``), host-side at load time.

    Layout: within each M tile the columns are [even rows | odd rows]
    (plane A of the u8→i32→bf16 bitcast chain covers a tile's even rows
    in order, plane B its odd rows). ``st`` rows: per-group scales —
    for byte kinds the hi-nibble's 16x scale is stacked below ([s;16s]).
    ``mnt`` rows: the per-group offset fold — code offsets plus the
    bf16-pair's +16 bias (see _gemv_kernel2 docstring):
      qk        mn + 16·s      qk_b      mn + 272·s
      qk_nomin  (272+128·signed)·s       int8      272·s − mn
    The kernel always SUBTRACTS Σ mnt·(per-group x sums).
    """
    bm = _gemv_block_m(m, kdim)
    if bm is None:
        return {}
    g_rows = scales.shape[-1]

    def tile_halves(a):  # [..., m, g] -> [..., g, m] per-tile [evens|odds]
        a = np.asarray(a, np.float32)
        a = np.swapaxes(a, -1, -2)  # [..., g, m]
        sh = a.shape
        a = a.reshape(sh[:-1] + (m // bm, bm))
        a = np.concatenate([a[..., 0::2], a[..., 1::2]], axis=-1)
        return np.ascontiguousarray(a.reshape(sh))

    scales = np.asarray(scales, np.float32)
    if kind == "qk":
        st = tile_halves(scales)
        off = tile_halves(np.asarray(mins, np.float32) + 16.0 * scales)
    else:
        sT = tile_halves(scales)
        st = np.concatenate([sT, 16.0 * sT], axis=-2)
        if kind == "int8":
            off = tile_halves(272.0 * scales - np.asarray(mins, np.float32))
        elif kind == "qk_b":
            off = tile_halves(np.asarray(mins, np.float32) + 272.0 * scales)
        else:  # qk_nomin
            off = tile_halves((272.0 + (128.0 if signed else 0.0)) * scales)
    # numpy on purpose: load-time callers stack per-layer operands
    # host-side and device-transfer once (Matrix handles the conversion)
    return {"st": st, "mnt": off}


def _derive_gemv_operands_traced(kind, scales, mins, m, kdim, *, signed):
    """jnp twin of :func:`build_gemv_operands` for use INSIDE a trace:
    (st, off) derived from the raw ``[m, g]`` scale arrays when the
    precomputed f32 operands were slimmed away at load (direct-quantized
    matrices with native factors drop them — the narrow path streams the
    native forms and the wide path derives these on the fly). Returns
    (None, None) when the M tiling is unusable."""
    bm = _gemv_block_m(m, kdim)
    if bm is None:
        return None, None

    def tile_halves(a):  # [m, g] -> [g, m] per-tile [evens|odds] columns
        a = a.astype(jnp.float32).T
        g_rows = a.shape[0]
        a = a.reshape(g_rows, m // bm, bm)
        a = jnp.concatenate([a[..., 0::2], a[..., 1::2]], axis=-1)
        return a.reshape(g_rows, m)

    if kind == "qk":
        return tile_halves(scales), tile_halves(mins + 16.0 * scales)
    sT = tile_halves(scales)
    st = jnp.concatenate([sT, 16.0 * sT], axis=-2)
    if kind == "int8":
        off = tile_halves(272.0 * scales - mins)
    elif kind == "qk_b":
        off = tile_halves(mins + 272.0 * scales)
    else:  # qk_nomin
        off = (272.0 + (128.0 if signed else 0.0)) * sT
    return st, off


def build_gemv_operands_native(sc, mn, d, dmin, m, k, kdim) -> dict:
    """Native-factor scale operands for the v2 gemv ("qk" kind only):
    6-bit scale/min codes stay u8 and the f16 super-scales stay one row
    per 8 groups — 2.7x less scale DMA than the f32 product arrays, with
    results identical to f32-FMA rounding (the kernel forms d·sc in f32
    exactly as the load-time precompute did). Same per-tile [evens|odds] column
    permutation as :func:`build_gemv_operands`; requires row-aligned
    super-blocks (k % 256 == 0, enforced by q4k_scale_factors)."""
    bm = _gemv_block_m(m, kdim)
    if bm is None:
        return {}

    def tile(a):  # [m, r] -> [r, m] per-tile [evens|odds], dtype kept
        a = np.ascontiguousarray(np.swapaxes(np.asarray(a), -1, -2))
        sh = a.shape
        a = a.reshape(sh[:-1] + (m // bm, bm))
        a = np.concatenate([a[..., 0::2], a[..., 1::2]], axis=-1)
        return np.ascontiguousarray(a.reshape(sh))

    return {
        "stq": tile(np.asarray(sc, np.uint8)),  # u8 [g, m]
        "mnq": tile(np.asarray(mn, np.uint8)),  # u8 [g, m]
        "sd": tile(np.asarray(d, np.float32)),  # f32 [g/8, m]
        "sdm": tile(np.asarray(dmin, np.float32)),
    }


def _expand_super(rows, reps):
    """[g/reps, bm] per-super-block rows -> [g, bm]: sublane-dim repeat
    via single-row concats (trace-time unrolled; lane layout untouched)."""
    parts = []
    for j in range(rows.shape[0]):
        parts.extend([rows[j : j + 1]] * reps)
    return jnp.concatenate(parts, axis=0)


def build_gemv_operands_native_nomin(sc, d, m, k, kdim) -> dict:
    """Native-factor operands for no-min byte kinds (Q6_K/Q3_K): signed
    8-bit scale codes + per-super-block f16 super-scales. The offset
    fold for these kinds is a scalar multiple of the scale, so (scq,
    sdn) replaces BOTH f32 operand arrays — ~9.6x less scale DMA (Q6_K's
    per-16 groups make the f32 operands 75% the size of its codes)."""
    bm = _gemv_block_m(m, kdim)
    if bm is None:
        return {}

    def tile(a):  # [m, r] -> [r, m] per-tile [evens|odds], dtype kept
        a = np.ascontiguousarray(np.swapaxes(np.asarray(a), -1, -2))
        sh = a.shape
        a = a.reshape(sh[:-1] + (m // bm, bm))
        a = np.concatenate([a[..., 0::2], a[..., 1::2]], axis=-1)
        return np.ascontiguousarray(a.reshape(sh))

    return {
        "scq": tile(np.asarray(sc, np.int8)),
        "sdn": tile(np.asarray(d, np.float32)),
    }


# ---------------------------------------------------------------------------
# single-field byte planes: for any code u in [0, 127], bf16(128 + u) is
# exactly 0x4300 | u — the whole [128, 256) binade holds integers with
# 7-bit-exact mantissas, so a WHOLE byte becomes an exact bf16 plane with
# one mask/or per two bytes. Byte kinds whose codes fit 7 bits (Q6_K:
# -32..31, Q3_K: -4..3, Q5_K: 0..31, Q2_K: 0..3 — every producer of the
# native factor arrays) need TWO planes instead of the nibble-pair path's
# FOUR: half the VPU unpack and half the MXU plane passes, closing the
# 2x gap to the nibble-packed Q4_K path. Signed codes rebias in-kernel
# with one XOR of bit 6 (q + 64 = (q & 0x7F) ^ 0x40 for q in [-64, 63]).
# The +128 plane bias and the code offset fold into the group-sum
# correction operand exactly as in the packed-pair kernels.
# ---------------------------------------------------------------------------

_SF_XOR_SIGNED = 0x40404040  # +64 per byte (bit-6 flip)
_SF_FOLD_SIGNED = 192.0  # plane bias 128 + signed rebias 64
_SF_FOLD_UNSIGNED = 128.0


def _sf_planes(codes_ref, xor):
    """(pa, pb) bf16 [bm/2, kdim] single-field value planes (128 + u):
    pa covers code rows {4q, 4q+2} (the tile's even rows), pb the odd."""
    w = pltpu.bitcast(codes_ref[:], jnp.int32)  # [bm/4, kdim]
    if xor:
        w = w ^ jnp.int32(xor)
    base = jnp.int32(0x43004300)
    mk = jnp.int32(0x007F007F)
    pa = pltpu.bitcast(base | (w & mk), jnp.bfloat16)
    pb = pltpu.bitcast(base | ((w >> 8) & mk), jnp.bfloat16)
    return pa, pb


def _gemv_sf_body(codes_ref, st, off, x_ref, out_ref, *, n, g, kdim, gsize,
                  bm, xor):
    """Narrow (group-expansion) single-field gemv body. ``st`` is the
    plain per-group scale rows [g, bm] (no [s;16s] stacking — one field),
    ``off`` the folded offset rows; both in the per-tile [evens|odds]
    column order of build_gemv_operands_native*."""
    pa, pb = _sf_planes(codes_ref, xor)

    gmask = (
        jax.lax.broadcasted_iota(jnp.int32, (g, kdim), 1) // gsize
        == jax.lax.broadcasted_iota(jnp.int32, (g, kdim), 0)
    ).astype(jnp.bfloat16)
    x = x_ref[:]
    x3 = jnp.expand_dims(x, 1)
    xm = (x3 * jnp.expand_dims(gmask, 0)).reshape(n * g, kdim)
    sxm = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)

    def dot(xs, part):
        return jax.lax.dot_general(
            xs, part, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    qa = dot(xm, pa)  # [n*g, bm/2]
    qb = dot(xm, pb)
    h = bm // 2
    if n > 2:
        p_a = qa.reshape(n, g, h)
        p_b = qb.reshape(n, g, h)
        sx = sxm.reshape(n, g, 1)
        y_a = jnp.sum(p_a * st[:, :h][None], axis=1) - jnp.sum(
            off[:, :h][None] * sx, axis=1
        )
        y_b = jnp.sum(p_b * st[:, h:][None], axis=1) - jnp.sum(
            off[:, h:][None] * sx, axis=1
        )
        out_ref[:] = jnp.concatenate(
            [y_a[:, None], y_b[:, None]], axis=1
        ).reshape(2 * n, h)
        return
    for nn in range(n):
        sl = slice(nn * g, (nn + 1) * g)
        sx = sxm[sl]
        out_ref[2 * nn : 2 * nn + 1, :] = (
            jnp.sum(qa[sl] * st[:, :h], axis=0, keepdims=True)
            - jnp.sum(off[:, :h] * sx, axis=0, keepdims=True)
        )
        out_ref[2 * nn + 1 : 2 * nn + 2, :] = (
            jnp.sum(qb[sl] * st[:, h:], axis=0, keepdims=True)
            - jnp.sum(off[:, h:] * sx, axis=0, keepdims=True)
        )


def _gemv_sfw_body(codes_ref, st, off, x_ref, out_ref, *, n, g, kdim, gsize,
                   bm, xor):
    """Wide (k-expanded scales) single-field gemv body: the value planes
    multiply k-expanded scale rows and each batch lane costs one plain
    [k]-dot — batch-independent MXU tiles, same strategy as
    _gemv_kernel2w but with 2 planes and no f32 lo+16·hi combine."""
    pa, pb = _sf_planes(codes_ref, xor)
    f32 = jnp.float32
    e2 = (
        jax.lax.broadcasted_iota(jnp.int32, (g, kdim), 1) // gsize
        == jax.lax.broadcasted_iota(jnp.int32, (g, kdim), 0)
    ).astype(jnp.bfloat16)
    xb = x_ref[:]
    prec = config.wide_precise

    def sexp(rows):  # [g, bm/2] f32 -> [bm/2, k] k-expanded scales
        hi = rows.astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        out = jax.lax.dot_general(hi, e2, dimension_numbers=dn,
                                  preferred_element_type=f32)
        if prec:
            lo = (rows - hi.astype(f32)).astype(jnp.bfloat16)
            out = out + jax.lax.dot_general(lo, e2, dimension_numbers=dn,
                                            preferred_element_type=f32)
        return out

    def mdot(plane, s_exp):
        w_eff = plane.astype(f32) * s_exp
        hi = w_eff.astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        out = jax.lax.dot_general(xb, hi, dimension_numbers=dn,
                                  preferred_element_type=f32)
        if prec:
            lo = (w_eff - hi.astype(f32)).astype(jnp.bfloat16)
            out = out + jax.lax.dot_general(xb, lo, dimension_numbers=dn,
                                            preferred_element_type=f32)
        return out

    h = bm // 2
    y_a = mdot(pa, sexp(st[:, :h]))
    y_b = mdot(pb, sexp(st[:, h:]))
    sx = jax.lax.dot_general(
        xb, e2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # [n, g]
    corr = jax.lax.dot_general(
        sx, off, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # [n, bm] columns [evens|odds]
    y_a = y_a - corr[:, :h]
    y_b = y_b - corr[:, h:]
    for nn in range(n):
        out_ref[2 * nn : 2 * nn + 1, :] = y_a[nn : nn + 1]
        out_ref[2 * nn + 1 : 2 * nn + 2, :] = y_b[nn : nn + 1]


def _gemv_kernel2n_nomin(codes_ref, scq_ref, sd_ref, x_ref, out_ref, *, n,
                         g, kdim, gsize, bm, signed, reps, narrow=True):
    """Single-field gemv with native no-min scale factors (Q6_K/Q3_K):
    st = s and the offset fold 192·s (128 plane bias + 64 signed rebias)
    form IN-KERNEL from the signed scale codes and super-scales
    (s = d·sc). Codes are i8 in [-32, 31] / [-4, 3] — the only scq
    producers — so the 7-bit single-field planes are exact."""
    q = scq_ref[:].astype(jnp.int32).astype(jnp.float32)  # [g, bm]
    s = _expand_super(sd_ref[:], reps) * q
    fold = _SF_FOLD_SIGNED if signed else _SF_FOLD_UNSIGNED
    body = _gemv_sf_body if narrow else _gemv_sfw_body
    body(codes_ref, s, fold * s, x_ref, out_ref, n=n, g=g,
         kdim=kdim, gsize=gsize, bm=bm,
         xor=_SF_XOR_SIGNED if signed else 0)


def _gemv_kernel2n_b(codes_ref, stq_ref, mnq_ref, sd_ref, sdm_ref, x_ref,
                     out_ref, *, n, g, kdim, gsize, bm, reps, narrow=True):
    """Single-field gemv with native byte-kind (qk_b: Q5_K/Q2_K) scale
    factors: st = s and off = dmin·mn + 128·s form in-kernel from the
    unsigned scale/min codes and super-scales (s = d·sc). Codes are u8
    in [0, 31] / [0, 3] — 7-bit-exact single-field planes."""
    qs = stq_ref[:].astype(jnp.int32).astype(jnp.float32)  # [g, bm]
    qm = mnq_ref[:].astype(jnp.int32).astype(jnp.float32)
    s = _expand_super(sd_ref[:], reps) * qs
    off = _expand_super(sdm_ref[:], reps) * qm + _SF_FOLD_UNSIGNED * s
    body = _gemv_sf_body if narrow else _gemv_sfw_body
    body(codes_ref, s, off, x_ref, out_ref, n=n, g=g, kdim=kdim,
         gsize=gsize, bm=bm, xor=0)


def _quant_gemv2_b_native(x, codes, stq, mnq, sd, sdm, *, m, k, kdim,
                          gsize, narrow=True) -> jax.Array:
    n = x.shape[0]
    g = k // gsize
    bm = _gemv_block_m(m, kdim)
    reps = g // sd.shape[0]
    kernel = functools.partial(
        _gemv_kernel2n_b, n=n, g=g, kdim=kdim, gsize=gsize, bm=bm, reps=reps,
        narrow=narrow,
    )
    out = pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((sd.shape[0], bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sdm.shape[0], bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * n, bm // 2), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * n, m // 2), jnp.float32),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k,
            bytes_accessed=codes.size + stq.size * 2 + sd.size * 8
            + n * k * 2 + n * m * 4,
            transcendentals=0,
        ),
    )(codes, stq, mnq, sd, sdm, x.astype(jnp.bfloat16))
    return (
        out.reshape(n, 2, m // bm, bm // 2)
        .transpose(0, 2, 3, 1)
        .reshape(n, m)
    )


def _quant_gemv2_nomin_native(x, codes, scq, sdn, *, m, k, kdim, gsize,
                              signed, narrow=True) -> jax.Array:
    n = x.shape[0]
    g = k // gsize
    bm = _gemv_block_m(m, kdim)
    reps = g // sdn.shape[0]
    kernel = functools.partial(
        _gemv_kernel2n_nomin, n=n, g=g, kdim=kdim, gsize=gsize, bm=bm,
        signed=signed, reps=reps, narrow=narrow,
    )
    out = pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((sdn.shape[0], bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * n, bm // 2), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * n, m // 2), jnp.float32),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k,
            bytes_accessed=codes.size + scq.size + sdn.size * 4
            + n * k * 2 + n * m * 4,
            transcendentals=0,
        ),
    )(codes, scq, sdn, x.astype(jnp.bfloat16))
    return (
        out.reshape(n, 2, m // bm, bm // 2)
        .transpose(0, 2, 3, 1)
        .reshape(n, m)
    )


def _gemv_kernel2n(codes_ref, stq_ref, mnq_ref, sd_ref, sdm_ref, x_ref,
                   out_ref, *, split, n, g, kdim, gsize, bm, signed):
    """v2 gemv with native "qk" scale factors: the per-group f32
    scale/offset rows are FORMED IN-KERNEL from 6-bit codes and per-8-
    group super-scales (st = d·sc, off = dmin·mn + 16·st — the same +16
    packed-pair fold as build_gemv_operands), then the shared packed-pair
    body runs unchanged. Trades ~g·bm VPU widen/multiply work for 2.7x
    less scale DMA; the gemv is DMA-bound, so this wins."""
    qs = stq_ref[:].astype(jnp.int32).astype(jnp.float32)  # [g, bm]
    qm = mnq_ref[:].astype(jnp.int32).astype(jnp.float32)
    d = _expand_super(sd_ref[:], 8)  # [g, bm]
    dm = _expand_super(sdm_ref[:], 8)
    st = d * qs
    off = dm * qm + 16.0 * st
    _gemv2_body(codes_ref, st, off, x_ref, out_ref, split=split, n=n, g=g,
                kdim=kdim, gsize=gsize, bm=bm, signed=signed)


def _gemv_kernel2(codes_ref, st_ref, off_ref, x_ref, out_ref, *, split, n,
                  g, kdim, gsize, bm, signed):
    """v2 bitcast gemv: nibble planes become PACKED bf16 pairs by bit
    surgery — ``0x4180 | (nib << 3)`` is exactly ``bf16(16+nib)`` — so
    one masked shift-or per TWO bytes replaces the per-nibble
    shift/mask/convert/convert chain (~2x less VPU unpack, the measured
    bottleneck of big gemvs like the vocab head). The +16 bias and all
    code offsets are folded into the group-sum correction operand
    (build_gemv_operands); signed codes are biased to unsigned in-kernel
    with one XOR. Output rows interleave (even-rows, odd-rows) per input
    row; the caller untangles with one reshape/transpose."""
    _gemv2_body(codes_ref, st_ref[:], off_ref[:], x_ref, out_ref,
                split=split, n=n, g=g, kdim=kdim, gsize=gsize, bm=bm,
                signed=signed)


def _gemv2_body(codes_ref, st, off, x_ref, out_ref, *, split, n, g, kdim,
                gsize, bm, signed):
    """Shared packed-pair gemv body: ``st``/``off`` are the in-VMEM f32
    per-group scale / folded-offset VALUES (loaded directly or formed
    from native factors by _gemv_kernel2n)."""
    w = pltpu.bitcast(codes_ref[:], jnp.int32)  # [bm/4, kdim]
    if signed:
        w = w ^ jnp.int32(-2139062144)  # 0x80808080: +128 per byte
    c0 = jnp.int32(0x41804180)
    mk = jnp.int32(0x000F000F)
    pa_lo = pltpu.bitcast(c0 | ((w & mk) << 3), jnp.bfloat16)
    pb_lo = pltpu.bitcast(c0 | (((w >> 8) & mk) << 3), jnp.bfloat16)
    pa_hi = pltpu.bitcast(c0 | (((w >> 4) & mk) << 3), jnp.bfloat16)
    pb_hi = pltpu.bitcast(c0 | (((w >> 12) & mk) << 3), jnp.bfloat16)

    gh = g // 2 if split else g
    gmask = (
        jax.lax.broadcasted_iota(jnp.int32, (gh, kdim), 1) // gsize
        == jax.lax.broadcasted_iota(jnp.int32, (gh, kdim), 0)
    ).astype(jnp.bfloat16)
    x = x_ref[:]

    def group_expand(xpart):
        x3 = jnp.expand_dims(xpart, 1)
        return (x3 * jnp.expand_dims(gmask, 0)).reshape(n * gh, kdim)

    def dot(xs, part):
        return jax.lax.dot_general(
            xs, part, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if split:
        xlo = group_expand(x[:, :kdim])
        xhi = group_expand(x[:, kdim:])
        sxl = jnp.sum(xlo.astype(jnp.float32), axis=1, keepdims=True)
        sxh = jnp.sum(xhi.astype(jnp.float32), axis=1, keepdims=True)
        qa = (dot(xlo, pa_lo), dot(xhi, pa_hi))  # [n*gh, bm/2] each
        qb = (dot(xlo, pb_lo), dot(xhi, pb_hi))
    else:
        xm = group_expand(x)
        sxm = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)
        qa = (dot(xm, pa_lo), dot(xm, pa_hi))
        qb = (dot(xm, pb_lo), dot(xm, pb_hi))

    h = bm // 2
    if n > 2:
        # vectorized reduction (see layer7._gemv_val): Σ_g st·P over all
        # lanes via leading-dim reshapes + one sublane sum — the per-lane
        # loop below serializes n small VPU passes. Keeps the narrow
        # path's FMA-class exactness at wide batch (scales post-dot in
        # f32, no bf16 dequant rounding).
        def stackg(parts):  # [n*gh, h] pieces -> [n, Gs, h]
            return jnp.concatenate(
                [p.reshape(n, gh, h) for p in parts], axis=1
            )
        p_a = stackg(qa)
        p_b = stackg(qb)
        if split:
            sx = jnp.concatenate(
                [sxl.reshape(n, gh, 1), sxh.reshape(n, gh, 1)], axis=1
            )  # [n, g, 1]
        else:
            sx = sxm.reshape(n, gh, 1)
        y_a = jnp.sum(p_a * st[:, :h][None], axis=1) - jnp.sum(
            off[:, :h][None] * sx, axis=1
        )
        y_b = jnp.sum(p_b * st[:, h:][None], axis=1) - jnp.sum(
            off[:, h:][None] * sx, axis=1
        )
        out_ref[:] = jnp.concatenate(
            [y_a[:, None], y_b[:, None]], axis=1
        ).reshape(2 * n, h)
        return
    for nn in range(n):
        sl = slice(nn * gh, (nn + 1) * gh)
        p_a = jnp.concatenate([qa[0][sl], qa[1][sl]], axis=0)  # [Gs, bm/2]
        p_b = jnp.concatenate([qb[0][sl], qb[1][sl]], axis=0)
        sx = (
            jnp.concatenate([sxl[sl], sxh[sl]], axis=0) if split else sxm[sl]
        )  # [g, 1]
        corr_a = jnp.sum(off[:, :h] * sx, axis=0, keepdims=True)
        corr_b = jnp.sum(off[:, h:] * sx, axis=0, keepdims=True)
        out_ref[2 * nn : 2 * nn + 1, :] = (
            jnp.sum(p_a * st[:, :h], axis=0, keepdims=True) - corr_a
        )
        out_ref[2 * nn + 1 : 2 * nn + 2, :] = (
            jnp.sum(p_b * st[:, h:], axis=0, keepdims=True) - corr_b
        )


def _quant_gemv2_native(x, codes, stq, mnq, sd, sdm, *, m, k, kdim,
                        gsize) -> jax.Array:
    """v2 gemv taking the native "qk" scale factors (see
    build_gemv_operands_native). Matches _quant_gemv2 on the equivalent
    f32 product operands to FMA-fusion rounding (~1 ulp)."""
    n = x.shape[0]
    g = k // gsize
    bm = _gemv_block_m(m, kdim)
    kernel = functools.partial(
        _gemv_kernel2n, split=True, n=n, g=g, kdim=kdim, gsize=gsize, bm=bm,
        signed=False,
    )
    out = pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g // 8, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g // 8, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * n, bm // 2), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * n, m // 2), jnp.float32),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k,
            bytes_accessed=codes.size + stq.size * 3 + n * k * 2 + n * m * 4,
            transcendentals=0,
        ),
    )(codes, stq, mnq, sd, sdm, x.astype(jnp.bfloat16))
    return (
        out.reshape(n, 2, m // bm, bm // 2)
        .transpose(0, 2, 3, 1)
        .reshape(n, m)
    )


def _gemv_kernel2w(codes_ref, st_ref, off_ref, x_ref, out_ref, *, split, n,
                   g, kdim, gsize, bm, signed):
    """Wide-batch (n > ~2) v2 gemv: scales are EXPANDED ALONG K into the
    packed bf16 code planes (one mask dot per output half) and each
    batch row costs one single-pass bf16 dot — the group-expansion form's
    MXU work scales with n·g and its per-lane reduction loop serializes;
    this form is batch-independent per tile. Dequantized weights round
    to bf16 (the XLA fallback's precision class; config.wide_precise in
    the layer-scan kernel documents the tradeoff)."""
    w = pltpu.bitcast(codes_ref[:], jnp.int32)
    if signed:
        w = w ^ jnp.int32(-2139062144)  # +128 per byte
    c0 = jnp.int32(0x41804180)
    mk = jnp.int32(0x000F000F)
    pa_lo = pltpu.bitcast(c0 | ((w & mk) << 3), jnp.bfloat16)
    pb_lo = pltpu.bitcast(c0 | (((w >> 8) & mk) << 3), jnp.bfloat16)
    pa_hi = pltpu.bitcast(c0 | (((w >> 4) & mk) << 3), jnp.bfloat16)
    pb_hi = pltpu.bitcast(c0 | (((w >> 12) & mk) << 3), jnp.bfloat16)

    f32 = jnp.float32
    k_full = kdim * 2 if split else kdim
    e2 = (
        jax.lax.broadcasted_iota(jnp.int32, (g, k_full), 1) // gsize
        == jax.lax.broadcasted_iota(jnp.int32, (g, k_full), 0)
    ).astype(jnp.bfloat16)
    xb = x_ref[:]  # [n, k] bf16

    prec = config.wide_precise

    def sexp(rows):  # [g, bm/2] -> [bm/2, k] k-expanded scales
        rows = rows.astype(f32)
        hi = rows.astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        out = jax.lax.dot_general(hi, e2, dimension_numbers=dn,
                                  preferred_element_type=f32)
        if prec:  # double-bf16 correction (see config.wide_precise)
            lo = (rows - hi.astype(f32)).astype(jnp.bfloat16)
            out = out + jax.lax.dot_general(lo, e2, dimension_numbers=dn,
                                            preferred_element_type=f32)
        return out

    h = bm // 2
    if split:
        pa = jnp.concatenate([pa_lo, pa_hi], axis=1)  # [bm/2, k]
        pb = jnp.concatenate([pb_lo, pb_hi], axis=1)
        s_rows = st_ref[:]
    else:
        # Keep the combined byte planes in f32: lo + 16*hi spans [272, 527]
        # (10 mantissa bits) and a bf16 round here would lose plane bits that
        # the wide_precise double-bf16 correction in mdot cannot recover
        # (mdot re-rounds to bf16 itself for the fast path).
        pa = pa_lo.astype(f32) + 16.0 * pa_hi.astype(f32)
        pb = pb_lo.astype(f32) + 16.0 * pb_hi.astype(f32)
        s_rows = st_ref[:g]

    def mdot(planes, s_exp):
        w_eff = planes.astype(f32) * s_exp
        hi = w_eff.astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        out = jax.lax.dot_general(xb, hi, dimension_numbers=dn,
                                  preferred_element_type=f32)
        if prec:
            lo = (w_eff - hi.astype(f32)).astype(jnp.bfloat16)
            out = out + jax.lax.dot_general(xb, lo, dimension_numbers=dn,
                                            preferred_element_type=f32)
        return out

    y_a = mdot(pa, sexp(s_rows[:, :h]))  # [n, bm/2] (tile's even rows)
    y_b = mdot(pb, sexp(s_rows[:, h:]))
    sx = jax.lax.dot_general(
        xb, e2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # [n, g]
    corr = jax.lax.dot_general(
        sx, off_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # [n, bm] columns [evens|odds]
    y_a = y_a - corr[:, :h]
    y_b = y_b - corr[:, h:]
    for nn in range(n):  # interleaved output rows, same order as kernel2
        out_ref[2 * nn : 2 * nn + 1, :] = y_a[nn : nn + 1]
        out_ref[2 * nn + 1 : 2 * nn + 2, :] = y_b[nn : nn + 1]


def _narrow_wins(n, g, kdim, m, *, split, single_field=False) -> bool:
    """True when the group-expansion (narrow) reduction needs no more
    MXU weight-plane tile passes than the k-expanded wide form — row
    blocks are 128 wide, so cost is tile counts, not FLOPs (the same
    model as layer7.py's per-matrix strategy pick). ``single_field``:
    the 7-bit byte-plane path has 2 planes (not 4) and no split."""
    def t(r, kk, mm):
        return -(-r // 128) * (-(-kk // 128)) * (-(-mm // 128))

    m2 = m // 2
    if single_field:
        narrow = 2 * t(n * g, kdim, m2)
        wide = 2 * t(m2, g, kdim) + 2 * t(n, kdim, m2)
        return narrow <= wide
    gh = g // 2 if split else g
    narrow = 4 * t(n * gh, kdim, m2)
    k_full = kdim * 2 if split else kdim
    wide = 2 * t(m2, g, k_full) + 2 * t(n, k_full, m2)
    return narrow <= wide


def _quant_gemv2(x, codes, st, mnt, *, split, signed, m, k, kdim,
                 gsize, narrow: bool | None = None) -> jax.Array:
    n = x.shape[0]
    g = k // gsize
    bm = _gemv_block_m(m, kdim)
    if narrow is None:
        narrow = n <= config.wide_batch
    kfn = _gemv_kernel2 if narrow else _gemv_kernel2w
    kernel = functools.partial(
        kfn, split=split, n=n, g=g, kdim=kdim, gsize=gsize, bm=bm,
        signed=signed,
    )
    gs_rows = st.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gs_rows, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2 * n, bm // 2), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2 * n, m // 2), jnp.float32),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k,
            bytes_accessed=codes.size + st.size * 4 + n * k * 2 + n * m * 4,
            transcendentals=0,
        ),
    )(codes, st, mnt, x.astype(jnp.bfloat16))
    # out row 2nn+p, col t*(bm/2)+c ↔ logical y[nn, t*bm + 2c + p]
    return (
        out.reshape(n, 2, m // bm, bm // 2)
        .transpose(0, 2, 3, 1)
        .reshape(n, m)
    )


def _gemv_block_m(m: int, kdim: int | None = None) -> int | None:
    # Mosaic block rule: the out block's lane dim (BM/4) must be a multiple
    # of 128 OR the block must span the whole array. Prefer the LARGEST
    # tile that fits the VMEM code-block budget: big-M matrices (the
    # vocab head) run ~1.5x faster at bm=4096 than 512 (fewer grid steps,
    # longer DMA bursts; measured 101 -> 68 us on [65536, 768] Q4_K,
    # scripts/bench_head_variants.py). kdim is the code-block K width
    # (k/2 for nibble-packed "qk"); None skips the VMEM check (legacy
    # callers that check separately).
    for c in (4096, 2048, 1024, 512):
        if m % c == 0 and (kdim is None or c * kdim <= (2 << 20)):
            return c
    # A non-512-multiple M runs as ONE grid step with zero DMA/compute
    # pipelining — fine for small matrices, ~2x off for m ~ 2688 (the ffn
    # key); models.loader.pad_matrix_rows pads those to a 512 multiple at
    # load. Ragged tiling (grid=ceil, masked edge tile) measured SLOWER
    # than whole-M at m=768 (3.5 vs 2.0 us) — see scripts/bench_gemv_ragged.py.
    if m % 8 == 0 and m <= 4096 and (kdim is None or m * kdim <= (2 << 20)):
        return m
    return None


def _quant_gemv(x, kind, codes, scales, offsets, offset_sign, m, k, kdim,
                gsize, pre_st=None, pre_mnt=None, lut=None) -> jax.Array:
    n = x.shape[0]
    g = k // gsize
    bm = _gemv_block_m(m, kdim)
    # scale operands in transposed position order. Prefer the precomputed
    # forms stored at load time (models/matrix.py stores "st"/"mnt"):
    # computing the transpose here puts a 2·M·G·4-byte copy INSIDE the
    # caller's decode loop — XLA's loop-invariant code motion runs before
    # layout assignment introduces the transpose copies, so they are NOT
    # hoisted and cost ~2/3 of the head matmul time per token.
    def to_pos(a):  # [M, G] → [G, M] position-ordered
        return (
            a.astype(jnp.float32)
            .reshape(m // bm, bm // 4, 4, g)
            .transpose(3, 0, 2, 1)
            .reshape(g, m)
        )

    st = pre_st if pre_st is not None else to_pos(scales)
    operands = [codes, st]
    in_specs = [
        pl.BlockSpec((bm, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    has_offset = offsets is not None
    if has_offset:
        mnt = pre_mnt if pre_mnt is not None else to_pos(offsets)
        operands.append(mnt)
        in_specs.append(
            pl.BlockSpec((g, bm), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
    if lut is not None:
        operands.append(lut.astype(jnp.float32).reshape(1, 16))
        in_specs.append(
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    # raw input row(s): the masked per-group expansions and group sums are
    # built IN-kernel (their XLA producer ops measured ~1 us/call — a third
    # of a small gemv's decode budget)
    gh = g // 2
    operands.append(x.astype(jnp.bfloat16))
    in_specs.append(
        pl.BlockSpec((n, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    )

    kernel = functools.partial(
        _gemv_kernel, kind=kind, n=n, g=g, gh=gh, bm=bm,
        has_offset=has_offset, offset_sign=offset_sign,
        signed_codes=codes.dtype == jnp.int8, kdim=kdim, gsize=gsize,
        has_lut=lut is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (4 * n, bm // 4), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4 * n, m // 4), jnp.float32),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k,
            bytes_accessed=codes.size + scales.size * 4 + n * k * 2 + n * m * 4,
            transcendentals=0,
        ),
    )(*operands)
    # undo the position interleave: out[n*4+b, tile*(BM/4)+s] -> y[n, tile*BM+4s+b]
    return (
        out.reshape(n, 4, m // bm, bm // 4)
        .transpose(0, 2, 3, 1)
        .reshape(n, m)
    )


def _gemv_grouped_kernel(codes_ref, st_ref, *rest, kind, n, g, gh, bm,
                         has_offset, offset_sign, signed_codes, kdim, gsize):
    """Grouped variant of `_gemv_kernel`: grid step i serves matrix i of a
    stack of same-shape matrices, each with its OWN input row — the
    st/x/out operands carry a leading group axis indexed by the grid."""
    refs = list(rest)
    mnt_ref = refs.pop(0) if has_offset else None
    x_ref = refs.pop(0)  # [1, N, K]
    out_ref = refs.pop(0)  # [1, 4N, BM/4]

    w = pltpu.bitcast(codes_ref[:], jnp.int32)  # [BM/4, kdim]
    q = bm // 4
    groups = gh if kind == "qk" else g
    gmask = (
        jax.lax.broadcasted_iota(jnp.int32, (groups, kdim), 1) // gsize
        == jax.lax.broadcasted_iota(jnp.int32, (groups, kdim), 0)
    ).astype(jnp.bfloat16)
    x = x_ref[0]

    def group_expand(xpart):
        x3 = jnp.expand_dims(xpart, 1)
        return (x3 * jnp.expand_dims(gmask, 0)).reshape(n * groups, kdim)

    if kind == "qk":
        xlo = group_expand(x[:, :kdim])
        xhi = group_expand(x[:, kdim:])
        if has_offset:
            slo = jnp.sum(xlo.astype(jnp.float32), axis=1, keepdims=True)
            shi = jnp.sum(xhi.astype(jnp.float32), axis=1, keepdims=True)
    else:
        xm = group_expand(x)
        if has_offset:
            sxm = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)

    def dot(xs, part):
        return jax.lax.dot_general(
            xs, part, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for b in range(4):
        if kind == "qk":
            lo = ((w >> (8 * b)) & 0xF).astype(jnp.float32).astype(jnp.bfloat16)
            hi = ((w >> (8 * b + 4)) & 0xF).astype(jnp.float32).astype(jnp.bfloat16)
            plo = dot(xlo, lo)
            phi = dot(xhi, hi)
        else:
            if signed_codes:
                byte = (w << (8 * (3 - b))) >> 24
            else:
                byte = (w >> (8 * b)) & 0xFF
            p_all = dot(xm, byte.astype(jnp.float32).astype(jnp.bfloat16))

        sblk = st_ref[0, :, b * q : (b + 1) * q]
        mnblk = mnt_ref[0, :, b * q : (b + 1) * q] if has_offset else None
        for nn in range(n):
            if kind == "qk":
                p = jnp.concatenate(
                    [plo[nn * gh : (nn + 1) * gh], phi[nn * gh : (nn + 1) * gh]],
                    axis=0,
                )
            else:
                p = p_all[nn * g : (nn + 1) * g]
            y = jnp.sum(p * sblk, axis=0, keepdims=True)
            if has_offset:
                if kind == "qk":
                    sx = jnp.concatenate(
                        [slo[nn * gh : (nn + 1) * gh], shi[nn * gh : (nn + 1) * gh]],
                        axis=0,
                    )
                else:
                    sx = sxm[nn * g : (nn + 1) * g]
                y = y + offset_sign * jnp.sum(mnblk * sx, axis=0, keepdims=True)
            out_ref[0, nn * 4 + b : nn * 4 + b + 1, :] = y


def quant_gemv_grouped(xs: jax.Array, kind: str, grouped: dict, m: int,
                       k: int) -> jax.Array:
    """``y[i, n, m] = xs[i] @ W_i^T`` for a stack of same-shape quantized
    matrices, ONE kernel launch with grid step i serving matrix i (its
    codes tile and its own input row) — used for the decode r/k/v
    projections (3 launches + 3 untangles + 3 operand preps → 1).

    ``grouped`` holds ``codes`` [G*M, kdim] (row-concatenated) and
    position-ordered ``st``/``mnt`` [G, g, M] (whole-M tile per matrix,
    i.e. each matrix's load-time "st" stacked). Built by
    models.loader.group_gemv_matrices.
    """
    gm, n, _ = xs.shape
    codes = grouped["codes"]
    st = grouped["st"]
    g = st.shape[1]
    gsize = k // g
    kdim = codes.shape[-1]
    has_offset = "mnt" in grouped
    operands = [codes, st]
    in_specs = [
        pl.BlockSpec((m, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, g, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if has_offset:
        operands.append(grouped["mnt"])
        in_specs.append(
            pl.BlockSpec((1, g, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
    operands.append(xs.astype(jnp.bfloat16))
    in_specs.append(
        pl.BlockSpec((1, n, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    )
    kernel = functools.partial(
        _gemv_grouped_kernel, kind=kind, n=n, g=g, gh=g // 2, bm=m,
        has_offset=has_offset, offset_sign=-1.0 if kind != "int8" else 1.0,
        signed_codes=codes.dtype == jnp.int8, kdim=kdim, gsize=gsize,
    )
    out = pl.pallas_call(
        kernel,
        grid=(gm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 4 * n, m // 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((gm, 4 * n, m // 4), jnp.float32),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * gm * n * m * k,
            bytes_accessed=codes.size + st.size * 4 * 2 + gm * n * k * 2
            + gm * n * m * 4,
            transcendentals=0,
        ),
    )(*operands)
    # undo the per-matrix position interleave
    return (
        out.reshape(gm, n, 4, m // 4)
        .transpose(0, 1, 3, 2)
        .reshape(gm, n, m)
    )


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

    offset_sign = -1.0
    lut = None
    if kind == "nf4":
        # consecutive-pair nibbles (lo=even element, hi=odd): de-interleave
        # x into [evens | odds] so the split-plane kernel path applies;
        # per-64 absmax tiled twice serves as the lo/hi-plane scale array
        # (group gsize becomes 32 in the de-interleaved index space)
        x = jnp.concatenate([x[:, 0::2], x[:, 1::2]], axis=-1)
        am = arrays["absmax"].astype(jnp.float32)
        scales = jnp.concatenate([am, am], axis=-1)
        offsets = None
        codes = arrays["codes"]
        lut = arrays["lut"]
        kdim = k // 2
    elif kind == "int8":
        # w = mn + (c/255)·(mx−mn): per-group scale/offset in f32, computed
        # by XLA outside the kernel (tiny [M, G] arrays, fused into the
        # surrounding program)
        mn = arrays["mn"].astype(jnp.float32)
        scales = (arrays["mx"].astype(jnp.float32) - mn) * (1.0 / 255.0)
        offsets = mn
        offset_sign = 1.0
        codes = arrays["codes"]
        kdim = k
    else:  # qk / qk_b / qk_nomin
        # f32 scale products stored, or formed in-trace from the native
        # factor arrays when the products were slimmed at load
        from ...models.matrix import scale_products

        scales, offsets = scale_products(kind, arrays)
        codes = arrays["codes"]
        kdim = k // 2 if kind == "qk" else k

    g = scales.shape[-1]
    gsize = k // g

    # gemv-shaped calls take the bitcast kernel (see note above): small N,
    # a usable M tiling, group-aligned halves, and VMEM-sized operands.
    # The kernel's MXU work scales as n·g·k·m (a k/gsize FLOP factor over
    # a plain gemv), so once n·g grows past ~256 the slab kernel's u8→i32
    # widen is the cheaper evil (measured crossover on v5e-class hw,
    # scripts/bench_gemv_vs_slab.py: at [768, 2688] (g=84) slab wins from
    # n=4; at g=24 shapes gemv wins through n=8).
    if (
        n <= 8
        and n * g <= 256
        and _gemv_block_m(m, kdim) is not None
        and (kind not in ("qk", "nf4") or g % 2 == 0)
        and n * g * kdim * 2 <= (4 << 20)
    ):
        # Reduction strategy: group-expansion (narrow) applies scales
        # post-dot in f32 (exact, and the native-factor forms apply) but
        # pays ceil(n·gh/128) MXU row blocks; the k-expanded wide form is
        # batch-independent but adds a scale-expansion pass over the full
        # weight plane. MXU row blocks are 128 wide — any n <= 128 dot
        # costs the same as n = 128 — so the winner is whichever needs
        # fewer weight-plane tile passes (same model as layer7.py).
        narrow = n <= config.wide_batch or _narrow_wins(
            n, g, kdim, m, split=kind in ("qk", "nf4")
        )
        if (
            narrow and kind == "qk" and "stq" in arrays
            and arrays["stq"].shape == (g, m)
        ):
            # native scale factors: 2.7x less scale DMA, f32-exact
            return _quant_gemv2_native(
                x, codes, arrays["stq"], arrays["mnq"], arrays["sd"],
                arrays["sdm"], m=m, k=k, kdim=kdim, gsize=gsize,
            )
        if kind == "qk_b" and "stq" in arrays and arrays["stq"].shape == (g, m):
            # native byte-kind factors (Q5_K/Q2_K): codes fit 7 bits, so
            # the single-field plane path applies at ANY batch (its own
            # cost model — 2 planes, not 4)
            narrow_sf = n <= config.wide_batch or _narrow_wins(
                n, g, kdim, m, split=False, single_field=True
            )
            return _quant_gemv2_b_native(
                x, codes, arrays["stq"], arrays["mnq"], arrays["sd"],
                arrays["sdm"], m=m, k=k, kdim=kdim, gsize=gsize,
                narrow=narrow_sf,
            )
        if (
            kind == "qk_nomin"
            and "scq" in arrays
            and arrays["scq"].shape == (g, m)
        ):
            # native no-min factors (Q6_K/Q3_K): ~9.6x less scale DMA,
            # single-field byte planes (2x fewer planes than nibble-pair)
            narrow_sf = n <= config.wide_batch or _narrow_wins(
                n, g, kdim, m, split=False, single_field=True
            )
            return _quant_gemv2_nomin_native(
                x, codes, arrays["scq"], arrays["sdn"], m=m, k=k, kdim=kdim,
                gsize=gsize, signed=codes.dtype == jnp.int8,
                narrow=narrow_sf,
            )
        pre_st = arrays.get("st")
        pre_mnt = arrays.get("mnt")
        if kind != "nf4" and pre_st is not None and pre_mnt is not None:
            # v2 packed-pair kernel with precomputed fold operands
            split = kind == "qk"
            gs_rows = g if split else 2 * g
            if pre_st.shape == (gs_rows, m) and pre_mnt.shape == (g, m):
                return _quant_gemv2(
                    x, codes, pre_st, pre_mnt, split=split,
                    signed=codes.dtype == jnp.int8, m=m, k=k, kdim=kdim,
                    gsize=gsize, narrow=narrow,
                )
        if kind != "nf4" and scales.shape == (m, g):
            # f32 operands absent (slimmed direct load keeps only the
            # native factors + raw [m, g] scale arrays): derive the v2
            # fold in-trace — identical math to build_gemv_operands, so
            # the kernel sees bit-identical f32 operands. XLA fuses the
            # transpose/fold into the surrounding program; the scale
            # arrays are small next to the code DMA this kernel performs.
            st_d, off_d = _derive_gemv_operands_traced(
                kind, scales, offsets, m, kdim, signed=codes.dtype == jnp.int8
            )
            if st_d is not None:
                return _quant_gemv2(
                    x, codes, st_d, off_d, split=kind == "qk",
                    signed=codes.dtype == jnp.int8, m=m, k=k, kdim=kdim,
                    gsize=gsize, narrow=narrow,
                )
        if kind != "nf4":
            # v1 fallback computes its (position-order) operands inline —
            # stored operands are v2-layout and must not be reused
            pre_st = pre_mnt = None
        elif pre_st is not None and pre_st.shape != (g, m):
            pre_st = pre_mnt = None  # e.g. re-tiled after a shard slice
        return _quant_gemv(
            x, kind, codes, scales, offsets, offset_sign, m, k, kdim, gsize,
            pre_st=pre_st, pre_mnt=pre_mnt, lut=lut,
        )

    while m % block_m:
        block_m //= 2
    grid = (m // block_m,)
    slab = _pick_slab(block_m, k, gsize)

    in_specs = [
        pl.BlockSpec((n, x.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, kdim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, codes, scales]
    if offsets is not None:
        in_specs.append(
            pl.BlockSpec((block_m, g), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(offsets)
    if lut is not None:
        in_specs.append(
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(lut.astype(jnp.float32).reshape(1, 16))

    # constant 0/1 expansion matrices (baked into the executable, resident
    # in VMEM across grid steps)
    eslab = jnp.asarray(_expand_matrix(gsize, slab, np.float32))
    in_specs.append(
        pl.BlockSpec(eslab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    )
    operands.append(eslab)
    if offsets is not None:
        # [G, K] 0/1 in bf16 (exact): contracted against bf16 x with f32
        # accumulation, so the group sums are exact
        efull = jnp.asarray(_expand_matrix(gsize, k, np.float32), jnp.bfloat16)
        in_specs.append(
            pl.BlockSpec(efull.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(efull)

    kernel = functools.partial(
        _kernel, kind=kind, gsize=gsize, k=k, slab=slab,
        has_offset=offsets is not None, offset_sign=offset_sign,
        has_lut=lut is not None,
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
    )(*operands)
    return out
