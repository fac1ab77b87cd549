"""Whole-stack RWKV-7 decode step as ONE Pallas kernel: grid over layers.

The batch-1 decode step was op-count-bound: ~25 XLA fusions + 5 kernel
launches per layer cost ~22 µs against a ~5 µs weight-DMA floor
(scripts/bench_decode_breakdown.py). This kernel runs the ENTIRE layer
stack in one ``pallas_call`` with ``grid=(L,)``: step ``i`` computes
layer ``i`` from its stacked weight blocks while Pallas's automatic
input pipelining prefetches layer ``i+1``'s blocks — the glue, the
launch overheads, and the per-layer DMA stalls all disappear, and the
surrounding HLO shrinks from ~300 ops to ~10 (which also removes the
minutes-long cold-start compile of the unrolled decode loop).

The residual ``x`` and the value-residual carry ``v0`` live in VMEM
scratch across grid steps; per-layer recurrent state (shift rows, WKV
matrices) streams through layer-indexed input/output blocks.

Weight layout: every quantized matrix is stored with its M rows
permuted by ``perm[r] = (r % 4)·(M/4) + r⌊/4⌋`` (``prep_decode7``), so
the bitcast gemv's four byte planes produce CONTIGUOUS quarters of the
logical output — the in-kernel result is assembled with one lane
concat and no cross-lane interleave, and scale operands are plain
transposes. (The standalone gemv kernel instead emits an interleaved
output and untangles it outside; see ops/pallas/matmul.py.)

Math is identical to models/forward._layer_v7 (ref: v7.rs:716-1007);
the attention core repeats ops/pallas/wkv7._att_core7_kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config

_VMEM_LIMIT = 100 << 20

# bench/test hook: force the per-matrix strategy map (None = cost model)
_FORCE_WIDE = None

# largest decode batch routed through the layer-scan kernel; the `wide`
# gemv strategy (scales expanded into the code planes, see _gemv_val)
# applies above config.scan_wide_batch lanes. B=16 compiles and holds B=8's
# per-lane cost (in-session: 1242.9 us/step vs 578.7 at B=8, same
# ~72-78 us/lane — state DMA and the attention core scale with B while
# the wide gemv's MXU tiles stay batch-independent); B=32 exceeds VMEM.
MAX_SCAN_BATCH = 16


def scan_batch_slice(B: int, cap: int | None = None) -> int | None:
    """Slice size for running the layer-scan kernel on a batch of ``B``.

    ``B <= cap`` runs whole; above the cap the batch is cut into the
    fewest EQUAL slices that fit (B=32 -> 2x16, B=24 -> 2x12, B=48 ->
    3x16) and the kernel runs once per slice. OPT-IN
    (config.split_scan_batch): measured slower than the composed path
    at B=32 (scripts/bench_b32_split.py — the per-step state
    slice/concat copies and the re-read stacked weights outweigh the
    kernel's pipelining), so by default batches above the cap return
    None and callers take the composed per-op path."""
    cap = MAX_SCAN_BATCH if cap is None else cap
    if B <= cap:
        return B
    if not config.split_scan_batch:
        return None
    ns = -(-B // cap)
    if ns <= 4 and B % ns == 0:
        return B // ns
    return None


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------


def _gemv_val(x, codes, st, off, *, split, m, k, wide=False, field1=False):
    """y[n, m] = x @ Wᵀ for one mega-arranged quantized matrix, as values.

    Nibble planes are turned into PACKED bf16 pairs by pure bit surgery:
    ``0x4180 | (nib << 3)`` is exactly ``bf16(16 + nib)``, so one masked
    shift-or per two bytes replaces the shift/mask/convert/convert chain
    (~2x less VPU unpack work); the +16 bias and any code offsets fold
    into the group-sum correction term, whose operands ``off`` are
    precomputed at prep time (see :func:`_prep_matrix`). Codes are u8,
    row-arranged so plane A covers logical rows [0, m/2) and plane B
    [m/2, m) in order — the result assembles with one 2-piece lane
    concat. ``st``/``off`` are PLAIN transposed logical scale/offset
    arrays; for byte kinds ``st`` carries [s ; 16·s] stacked (the hi
    nibble's scale).

    Two reduction strategies, chosen by ``wide``:

    * ``wide=False`` (batch ≤ ~2): x is GROUP-EXPANDED to one masked copy
      per scale group and the code dot emits per-group partials — MXU
      work scales with ``n·g·k·m`` but everything after the dot is tiny.
    * ``wide=True``: the per-group scales are EXPANDED ALONG K with one
      small mask dot ([m/2, g] @ [g, kdim]) and multiplied into the code
      planes, so each batch row costs one plain [k]-dot — MXU work is
      ``g·k·m`` (expansion, batch-independent) + ``n·k·m`` (dots). For
      n = 8 the group-expansion form would pay 8× the expansion cost in
      the main dots (prohibitive for the FFN value matrix, g = 84);
      this form pays it once.

    ``field1``: single-field byte planes — for codes prep-biased into
    [0, 127] the WHOLE byte becomes an exact bf16 plane via
    ``0x4300 | u = bf16(128 + u)`` (the [128, 256) binade holds integers
    7-bit-exactly): 2 planes instead of 4, no [s;16s] stacking (st has g
    rows), half the unpack and plane-dot work. Used for Q6_K/Q3_K
    (codes +64-rebased at prep) and Q5_K/Q2_K (already unsigned).
    """
    if field1 == "dense":  # bf16 weights: one plain MXU dot
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), codes,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    n = x.shape[0]
    kdim = codes.shape[-1]
    m2 = m // 2
    w = pltpu.bitcast(codes, jnp.int32)  # [m/4, kdim]
    if field1:
        base = jnp.int32(0x43004300)
        mk7 = jnp.int32(0x007F007F)
        pa_lo = pltpu.bitcast(base | (w & mk7), jnp.bfloat16)
        pb_lo = pltpu.bitcast(base | ((w >> 8) & mk7), jnp.bfloat16)
        pa_hi = pb_hi = None
    else:
        c0 = jnp.int32(0x41804180)
        mk = jnp.int32(0x000F000F)
        # bf16 [m/2, kdim]: plane A col c ↔ arranged row 2c (logical c),
        # plane B col c ↔ arranged row 2c+1 (logical m/2 + c)
        pa_lo = pltpu.bitcast(c0 | ((w & mk) << 3), jnp.bfloat16)
        pb_lo = pltpu.bitcast(c0 | (((w >> 8) & mk) << 3), jnp.bfloat16)
        pa_hi = pltpu.bitcast(c0 | (((w >> 4) & mk) << 3), jnp.bfloat16)
        pb_hi = pltpu.bitcast(c0 | (((w >> 12) & mk) << 3), jnp.bfloat16)

    gs_rows = st.shape[0]
    if field1:
        g = gs_rows
    else:
        g = gs_rows // 2 if not split else gs_rows  # x-group count basis
    gh = g // 2 if split else g  # groups per expanded-x copy
    gsize = k // g if split else k // g
    gmask_bool = (
        jax.lax.broadcasted_iota(jnp.int32, (gh, kdim), 1) // gsize
        == jax.lax.broadcasted_iota(jnp.int32, (gh, kdim), 0)
    )

    if wide:
        # Everything rides SINGLE-PASS bf16 MXU dots (an f32 matmul
        # decomposes into ~6 passes and the f32 form of this path spent
        # ~70 latency-bound dots per layer). Exactness is kept by
        # DOUBLE-BF16 splitting: v = bf16(v) + bf16(v - bf16(v)) carries
        # ~16 mantissa bits (error ~2^-16, far below the bf16-dequant
        # rounding of the XLA fallback path). The group mask spans the
        # FULL k so lo|hi planes contract in one dot against x as-is.
        f32 = jnp.float32
        e2 = (
            jax.lax.broadcasted_iota(jnp.int32, (g, k), 1) // gsize
            == jax.lax.broadcasted_iota(jnp.int32, (g, k), 0)
        ).astype(jnp.bfloat16)  # [g, k] full-k expansion mask
        xb = x.astype(jnp.bfloat16)

        from . import config as _cfg

        prec = _cfg.wide_precise

        def sexp2(rows):  # scales [g, m'] -> k-expanded [m', k] (exact-ish)
            hi = rows.astype(jnp.bfloat16)
            dn = (((0,), (0,)), ((), ()))
            out = jax.lax.dot_general(hi, e2, dimension_numbers=dn,
                                      preferred_element_type=f32)
            if prec:
                lo = (rows - hi.astype(f32)).astype(jnp.bfloat16)
                out = out + jax.lax.dot_general(
                    lo, e2, dimension_numbers=dn, preferred_element_type=f32)
            return out

        def mdot2(w_eff):  # [n, k] x double-bf16([m', k]) -> [n, m']
            hi = w_eff.astype(jnp.bfloat16)
            dn = (((1,), (1,)), ((), ()))
            out = jax.lax.dot_general(xb, hi, dimension_numbers=dn,
                                      preferred_element_type=f32)
            if prec:
                lo = (w_eff - hi.astype(f32)).astype(jnp.bfloat16)
                out = out + jax.lax.dot_general(
                    xb, lo, dimension_numbers=dn, preferred_element_type=f32)
            return out

        dn0 = (((0,), (0,)), ((), ()))
        dn1 = (((1,), (1,)), ((), ()))

        def sexp_b(rows):  # [g, m'] -> bf16 [m', k]
            # (MXU dots must accumulate in f32 — Mosaic rejects a
            # bf16 preferred_element_type; cast after)
            return jax.lax.dot_general(
                rows.astype(jnp.bfloat16), e2, dimension_numbers=dn0,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        def mdot_b(w_eff):  # bf16 [m', k] -> f32 [n, m']
            return jax.lax.dot_general(
                xb, w_eff, dimension_numbers=dn1,
                preferred_element_type=f32,
            )

        if field1:
            # single-field value planes (128 + u): one plane per output
            # half, directly usable by either accuracy class
            if prec:
                y_a = mdot2(pa_lo.astype(f32) * sexp2(st[:, :m2]))
                y_b = mdot2(pb_lo.astype(f32) * sexp2(st[:, m2:]))
            else:
                y_a = mdot_b(pa_lo * sexp_b(st[:, :m2]))
                y_b = mdot_b(pb_lo * sexp_b(st[:, m2:]))
        elif split and not prec:
            # fast default: nibble planes are bf16-EXACT (16 + nib), so
            # with plain-bf16 scale rounding (the documented default
            # class) the whole multiply chain stays in bf16 — one VPU
            # pass at 2x bf16 throughput instead of an f32 multiply plus
            # a round, and the expansion dot emits bf16 directly
            pa = jnp.concatenate([pa_lo, pa_hi], axis=1)  # bf16
            pb = jnp.concatenate([pb_lo, pb_hi], axis=1)
            y_a = mdot_b(pa * sexp_b(st[:, :m2]))
            y_b = mdot_b(pb * sexp_b(st[:, m2:]))
        elif split:
            # plane columns [lo | hi] line up with x's [first | second]
            # half packing, so st rows 0..g already match e2's groups
            pa = jnp.concatenate([pa_lo, pa_hi], axis=1).astype(f32)
            pb = jnp.concatenate([pb_lo, pb_hi], axis=1).astype(f32)
            s_rows = st
            y_a = mdot2(pa * sexp2(s_rows[:, :m2]))
            y_b = mdot2(pb * sexp2(s_rows[:, m2:]))
        else:
            # byte value u = 16·hi + lo; planes hold 16+nib, so lo+16·hi
            # gives u + 272 — the 272·s fold is in ``off`` already
            pa = pa_lo.astype(f32) + 16.0 * pa_hi.astype(f32)
            pb = pb_lo.astype(f32) + 16.0 * pb_hi.astype(f32)
            s_rows = st[:g]
            y_a = mdot2(pa * sexp2(s_rows[:, :m2]))
            y_b = mdot2(pb * sexp2(s_rows[:, m2:]))

        sx = jax.lax.dot_general(
            xb, e2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [n, g] group sums (e2 is 0/1: bf16-exact)
        corr = jax.lax.dot_general(
            sx, off, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [n, m] — off column order matches the y_a|y_b concat
        return jnp.concatenate([y_a, y_b], axis=-1) - corr

    gmask = gmask_bool.astype(jnp.bfloat16)

    def group_expand(xpart):  # [n, kdim] -> [n*gh, kdim]
        if n == 1:
            # the middle-unit-dim expand lowers fine when the leading
            # dim is 1 (a plain 2-D broadcast after folding); a direct
            # [1,kdim]*[gh,kdim] mul does NOT (offset->replicated
            # vector.broadcast is unsupported)
            x3 = jnp.expand_dims(xpart, 1)
            return (x3 * jnp.expand_dims(gmask, 0)).reshape(gh, kdim)
        # n >= 2: Mosaic can neither reshape a middle unit dim into a
        # multi-row vector NOR broadcast a sublane-offset row slice
        # ("unsupported shape cast" / "vector.broadcast {1,128}->{*}").
        # Build the expansion instead as one exact 0/1 selection dot
        # (row i*gh+j copies lane i; single-nonzero f32 dot is exact)
        # masked by an iota-tiled group mask.
        f32 = jnp.float32
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (n * gh, n), 0) // gh
            == jax.lax.broadcasted_iota(jnp.int32, (n * gh, n), 1)
        ).astype(f32)
        xrep = jax.lax.dot_general(
            sel, xpart.astype(f32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        tmask = (
            jax.lax.broadcasted_iota(jnp.int32, (n * gh, kdim), 1) // gsize
            == jax.lax.broadcasted_iota(jnp.int32, (n * gh, kdim), 0) % gh
        )
        return jnp.where(tmask, xrep, 0.0).astype(xpart.dtype)

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
        qa = (dot(xlo, pa_lo), dot(xhi, pa_hi))  # each [n*gh, m/2]
        qb = (dot(xlo, pb_lo), dot(xhi, pb_hi))
    elif field1:
        xm = group_expand(x)
        sxm = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)
        qa = (dot(xm, pa_lo),)  # single value plane per half
        qb = (dot(xm, pb_lo),)
    else:
        xm = group_expand(x)
        sxm = jnp.sum(xm.astype(jnp.float32), axis=1, keepdims=True)
        qa = (dot(xm, pa_lo), dot(xm, pa_hi))
        qb = (dot(xm, pb_lo), dot(xm, pb_hi))

    if n > 2:
        # vectorized reduction: Σ_g st[g, m']·P[n, g, m'] over ALL lanes
        # at once (leading-dim reshapes of the dot outputs + a sublane
        # sum) — the per-lane loop below serializes n small VPU passes.
        # Codes contract in bf16 dots with f32 scales applied post-dot,
        # so this strategy keeps the NARROW path's FMA-class exactness
        # at wide batch (no bf16 dequant rounding).
        def stackg(parts):  # [n*gh, m'] pieces -> [n, Gs, m']
            return jnp.concatenate(
                [p.reshape(n, gh, m2) for p in parts], axis=1
            )
        p_a = stackg(qa)
        p_b = stackg(qb)
        if split:
            sx = jnp.concatenate(
                [sxl.reshape(n, gh, 1), sxh.reshape(n, gh, 1)], axis=1
            )  # [n, g, 1]
        else:
            sx = sxm.reshape(n, gh, 1)
        y_a = jnp.sum(p_a * st[:, :m2][None], axis=1) - jnp.sum(
            off[:, :m2][None] * sx, axis=1
        )
        y_b = jnp.sum(p_b * st[:, m2:][None], axis=1) - jnp.sum(
            off[:, m2:][None] * sx, axis=1
        )
        return jnp.concatenate([y_a, y_b], axis=-1)  # [n, m]

    outs = []
    for nn in range(n):
        sl = slice(nn * gh, (nn + 1) * gh)
        if len(qa) == 1:
            p_a, p_b = qa[0][sl], qb[0][sl]  # [g, m/2] (single-field)
        else:
            p_a = jnp.concatenate([qa[0][sl], qa[1][sl]], axis=0)  # [Gs, m/2]
            p_b = jnp.concatenate([qb[0][sl], qb[1][sl]], axis=0)
        if split:
            sx = jnp.concatenate([sxl[sl], sxh[sl]], axis=0)  # [g, 1]
        else:
            sx = sxm[sl]
        y_a = (
            jnp.sum(p_a * st[:, :m2], axis=0, keepdims=True)
            - jnp.sum(off[:, :m2] * sx, axis=0, keepdims=True)
        )
        y_b = (
            jnp.sum(p_b * st[:, m2:], axis=0, keepdims=True)
            - jnp.sum(off[:, m2:] * sx, axis=0, keepdims=True)
        )
        outs.append(jnp.concatenate([y_a, y_b], axis=-1))  # [1, m]
    return jnp.concatenate(outs, axis=0) if n > 1 else outs[0]


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


# [B, C] ↔ [B, H, hs] relayouts. Minor-dim reshapes and mixed-offset lane
# concats are unavailable in Mosaic; instead the reshape rides the MXU as
# two 0/1 selection-mask contractions — every output element is a sum with
# exactly ONE nonzero term, so the f32 dot is exact.


def _head_masks(C, H, hs):
    m1 = (
        jax.lax.broadcasted_iota(jnp.int32, (H, C), 1) // hs
        == jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
    ).astype(jnp.float32)  # [H, C]: m1[h, c] = (c//hs == h)
    m2 = (
        jax.lax.broadcasted_iota(jnp.int32, (C, hs), 0) % hs
        == jax.lax.broadcasted_iota(jnp.int32, (C, hs), 1)
    ).astype(jnp.float32)  # [C, k]: m2[c, k] = (c%hs == k)
    return m1, m2


def _to_heads(xc, m1, m2, B):
    """[B, C] -> [B, H, hs] as ONE masked-dot pair for ALL lanes: the
    per-lane Python loop this replaces cost ~100 small serialized dots
    per layer at B=8. Leading-dim reshapes ([B, H, C] <-> [B*H, C]) are
    Mosaic-legal; only the lane dim may not be reshaped."""
    H, C = m1.shape
    hs = m2.shape[1]
    t = (xc[:, None, :] * m1[None]).reshape(B * H, C)
    y = jax.lax.dot_general(
        t, m2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B*H, hs]
    return y.reshape(B, H, hs)


def _from_heads(y, m1, m2, B):
    H, C = m1.shape
    hs = m2.shape[1]
    u = jax.lax.dot_general(
        y.reshape(B * H, hs), m2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B*H, C] = y[b, h, c%hs]
    return jnp.sum(u.reshape(B, H, C) * m1[None], axis=1)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _expand_super(rows, reps):
    """[g/8, m] per-super-block rows -> [g, m]: sublane-dim repeat via
    single-row concats (trace-time unrolled; lane layout untouched)."""
    parts = []
    for j in range(rows.shape[0]):
        parts.extend([rows[j : j + 1]] * reps)
    return jnp.concatenate(parts, axis=0)


def _layer_scan_kernel(
    *refs,
    # statics
    B, C, H, hs, hidden, L, rescale,
    rkv_split, wo_split, fk_split, fv_split, native_tags,
    lora_dims, eps_ln, eps_gn, eps_l2, wide, has_carry=False,
):
    """Ref layout (parsed positionally — mirrors layer_scan7's operand
    assembly): 8 per-layer head refs, then per weight tag either
    (codes, st, off) f32-operand refs or (codes, stq, mnq, sd, sdm)
    native-factor refs (``native_tags``), then state/mask ins (plus,
    with ``has_carry``, the pipeline v0-in and meta refs), outs, and
    the two VMEM scratch carries.

    ``has_carry`` (pipeline-stage mode): this kernel runs a CONTIGUOUS
    SLICE of the layer stack. The value-residual anchor v0 arrives as an
    operand (with meta[0,0]=1 when this is not the first stage), leaves
    as an extra output, and the rescale modulo uses the global layer
    offset meta[0,1]. Both flags are runtime values because under
    shard_map every stage traces the same program."""
    it = iter(refs)
    ln1_ref, ln2_ref = next(it), next(it)  # [1, 2, C] (w, b)
    xstack_ref = next(it)  # [1, 6, C] token-shift mixes r,w,k,v,a,g
    vecs_ref = next(it)  # [1, 6, C] w0, a0, v0, k_k, k_a, ffn x_k
    gn_ref = next(it)  # [1, 2, C] group-norm w, b
    rk_ref = next(it)  # [1, H, hs]
    down_ref = next(it)  # [1, D, C] bf16
    up_ref = next(it)  # [1, C, D] bf16
    wrefs = {}
    for tag, native in zip(("rkv", "wo", "fk", "fv"), native_tags):
        wrefs[tag] = tuple(next(it) for _ in range(len(_form_keys(native))))
    x_in_ref, ash_in_ref, fsh_in_ref, wkv_in_ref, mask_ref = (
        next(it), next(it), next(it), next(it), next(it),
    )
    v0_in_ref = meta_ref = None
    if has_carry:
        v0_in_ref, meta_ref = next(it), next(it)
    x_out_ref, ash_out_ref, fsh_out_ref, wkv_out_ref = (
        next(it), next(it), next(it), next(it),
    )
    v0_out_ref = next(it) if has_carry else None
    x_scr, v0_scr = next(it), next(it)

    def st_off(tag, j=None):
        """Per-group f32 scale / folded-offset rows for one matrix —
        loaded directly (f32 operands) or formed from the native scale
        factors: "qk" form st = d·sc, off = dmin·mn + 16·st; no-min form
        st = [s;16s], off = (272+128·signed)·s with s = d·sc (same folds
        as matmul.py::_gemv_kernel2n / _gemv_kernel2n_nomin)."""
        native = dict(zip(("rkv", "wo", "fk", "fv"), native_tags))[tag]
        sel = (lambda a: a[0, j]) if j is not None else (lambda a: a[0])
        if native == "dense":
            return None, None
        if native == "qk":
            _, stq_ref, mnq_ref, sd_ref, sdm_ref = wrefs[tag]
            qs = sel(stq_ref).astype(jnp.int32).astype(jnp.float32)
            qm = sel(mnq_ref).astype(jnp.int32).astype(jnp.float32)
            st = _expand_super(sel(sd_ref), 8) * qs
            off = _expand_super(sel(sdm_ref), 8) * qm + 16.0 * st
            return st, off
        if native == "qkb":
            _, stq_ref, mnq_ref, sd_ref, sdm_ref = wrefs[tag]
            qs = sel(stq_ref).astype(jnp.int32).astype(jnp.float32)
            qm = sel(mnq_ref).astype(jnp.int32).astype(jnp.float32)
            sd = sel(sd_ref)
            reps = qs.shape[0] // sd.shape[0]
            s_lo = _expand_super(sd, reps) * qs
            st = jnp.concatenate([s_lo, 16.0 * s_lo], axis=0)
            off = _expand_super(sel(sdm_ref), reps) * qm + 272.0 * s_lo
            return st, off
        if native == "n1f":
            # single-field no-min form (Q6_K/Q3_K, codes +64-prebiased):
            # st = s (plain per-group rows), off = (128 + 64)·s covers
            # the bf16 plane bias and the signed rebias
            _, scq_ref, sdn_ref = wrefs[tag]
            q = sel(scq_ref).astype(jnp.int32).astype(jnp.float32)
            sdn = sel(sdn_ref)
            s = _expand_super(sdn, q.shape[0] // sdn.shape[0]) * q
            return s, 192.0 * s
        if native == "b1f":
            # single-field byte kind (Q5_K/Q2_K, unsigned codes):
            # st = s, off = dmin·mn + 128·s (plane bias only)
            _, stq_ref, mnq_ref, sd_ref, sdm_ref = wrefs[tag]
            qs = sel(stq_ref).astype(jnp.int32).astype(jnp.float32)
            qm = sel(mnq_ref).astype(jnp.int32).astype(jnp.float32)
            sd = sel(sd_ref)
            reps = qs.shape[0] // sd.shape[0]
            s = _expand_super(sd, reps) * qs
            off = _expand_super(sel(sdm_ref), reps) * qm + 128.0 * s
            return s, off
        if isinstance(native, tuple) and native[0] == "nomin":
            _, scq_ref, sdn_ref = wrefs[tag]
            q = sel(scq_ref).astype(jnp.int32).astype(jnp.float32)
            sdn = sel(sdn_ref)
            s_lo = _expand_super(sdn, q.shape[0] // sdn.shape[0]) * q
            st = jnp.concatenate([s_lo, 16.0 * s_lo], axis=0)
            return st, native[1] * s_lo
        _, st_ref, off_ref = wrefs[tag]
        return sel(st_ref), sel(off_ref)

    f1 = {
        tag: _field1_tag(nat)
        for tag, nat in zip(("rkv", "wo", "fk", "fv"), native_tags)
    }

    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _init():
        x_scr[:] = x_in_ref[:]

    x = x_scr[:]
    m_lane = mask_ref[:]  # [B, 1] f32

    ln1w, ln1b = ln1_ref[0, 0:1], ln1_ref[0, 1:2]
    xx = _ln(x, ln1w, ln1b, eps_ln)

    # --- token shifts (one lerp per stream) --------------------------------
    sh = ash_in_ref[0]  # [B, C]
    mixes = xstack_ref[0]  # [6, C]
    shifted = [xx + mixes[s : s + 1] * (sh - xx) for s in range(6)]
    rx, wx, kx, vx, ax, gx = shifted

    # --- r/k/v projections (grouped quantized gemv) ------------------------
    mdim = C
    rkv_codes_ref = wrefs["rkv"][0]
    rkv = []
    for j, xin in enumerate((rx, kx, vx)):
        codes = rkv_codes_ref[0, j * mdim : (j + 1) * mdim]
        st_j, off_j = st_off("rkv", j)
        rkv.append(
            _gemv_val(xin.astype(jnp.bfloat16), codes, st_j, off_j,
                      split=rkv_split, m=mdim, k=C, wide=wide["rkv"],
                      field1=f1["rkv"])
        )
    r, k, v = rkv

    # --- inner-LoRA adapters (w/a/g/v) -------------------------------------
    down = down_ref[0]  # [D, C] bf16
    up = up_ref[0]  # [C, D] bf16
    offs = np.cumsum([0] + list(lora_dims))

    def lora(xin, idx, mid_act=None):
        a_w = down[offs[idx] : offs[idx + 1]]  # [d, C]
        z = jax.lax.dot_general(
            xin.astype(jnp.bfloat16), a_w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [B, d]
        if mid_act is not None:
            z = mid_act(z)
        b_w = up[:, offs[idx] : offs[idx + 1]]  # [C, d]
        return jax.lax.dot_general(
            z.astype(jnp.bfloat16), b_w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # [B, C]

    w0 = vecs_ref[0, 0:1]
    a0 = vecs_ref[0, 1:2]
    v0v = vecs_ref[0, 2:3]
    kkv = vecs_ref[0, 3:4]
    kav = vecs_ref[0, 4:5]

    w_in = w0 + lora(wx, 0, jnp.tanh)
    a_in = a0 + lora(ax, 1)
    g_fl = lora(gx, 2, jax.nn.sigmoid)
    vm = lora(vx, 3)

    # --- value residual from layer 0 (ref: v7.rs:895-921) ------------------
    v_mix = jax.nn.sigmoid(v0v + vm)
    is_first = i == 0

    if has_carry:
        use_in = meta_ref[0, 0]  # 1.0 when a prior stage owns layer 0

        @pl.when(is_first)
        def _store_v0():
            v0_scr[:] = use_in * v0_in_ref[:] + (1.0 - use_in) * v

        v0c = v0_scr[:]
        local_first = jnp.logical_and(is_first, use_in == 0.0)
        v = jnp.where(local_first, v, v + v_mix * (v0c - v))
    else:
        @pl.when(is_first)
        def _store_v0():
            v0_scr[:] = v

        v0c = v0_scr[:]
        v = jnp.where(is_first, v, v + v_mix * (v0c - v))

    # --- attention core (ref: _att_core7_kernel) ---------------------------
    m1, m2 = _head_masks(C, H, hs)
    rh = _to_heads(r, m1, m2, B)
    wh = _to_heads(w_in, m1, m2, B)
    kh = _to_heads(k, m1, m2, B)
    vh = _to_heads(v, m1, m2, B)
    ah = _to_heads(a_in, m1, m2, B)
    gh_ = _to_heads(g_fl, m1, m2, B)
    kk_h = _to_heads(kkv, m1, m2, 1)
    ka_h = _to_heads(kav, m1, m2, 1)
    gnw_h = _to_heads(gn_ref[0, 0:1], m1, m2, 1)
    gnb_h = _to_heads(gn_ref[0, 1:2], m1, m2, 1)
    rk_h = rk_ref[0][None]  # [1, H, hs]

    S = wkv_in_ref[0]  # [B, H, K, V]
    w2 = jnp.exp(-0.606531 * jax.nn.sigmoid(wh))
    a2 = jax.nn.sigmoid(ah)
    kkr = kh * kk_h
    kk = kkr * jax.lax.rsqrt(jnp.sum(kkr * kkr, axis=2, keepdims=True) + eps_l2)
    k2 = kh * (1.0 + (a2 - 1.0) * ka_h)

    rt = rh[:, :, :, None]
    wt = w2[:, :, :, None]
    kt = k2[:, :, :, None]
    at = -kk[:, :, :, None]
    bt = (kk * a2)[:, :, :, None]
    vt = vh[:, :, None, :]

    sa = jnp.sum(at * S, axis=2, keepdims=True)
    S_n = wt * S + kt * vt + bt * sa
    mst = m_lane[:, :, None, None]
    wkv_out_ref[0] = S + mst * (S_n - S)
    y0 = jnp.sum(rt * S_n, axis=2)  # [B, H, V]

    mu = jnp.mean(y0, axis=2, keepdims=True)
    var = jnp.mean((y0 - mu) * (y0 - mu), axis=2, keepdims=True)
    yn = (y0 - mu) * jax.lax.rsqrt(var + eps_gn) * gnw_h + gnb_h
    sb = jnp.sum(rh * k2 * rk_h, axis=2, keepdims=True)
    y = (yn + sb * vh) * gh_  # [B, H, V]

    y_fl = _from_heads(y, m1, m2, B)  # [B, C]

    # --- output projection + residual --------------------------------------
    wo_st, wo_off = st_off("wo")
    dx = _gemv_val(
        y_fl.astype(jnp.bfloat16), wrefs["wo"][0][0], wo_st, wo_off,
        split=wo_split, m=C, k=C, wide=wide["wo"], field1=f1["wo"],
    )
    x = x + dx
    ash_out_ref[0] = sh + m_lane * (xx - sh)

    # --- FFN ----------------------------------------------------------------
    ln2w, ln2b = ln2_ref[0, 0:1], ln2_ref[0, 1:2]
    xx2 = _ln(x, ln2w, ln2b, eps_ln)
    fsh = fsh_in_ref[0]
    fxk = vecs_ref[0, 5:6]
    kx2 = xx2 + fxk * (fsh - xx2)
    fk_st, fk_off = st_off("fk")
    k_hid = _gemv_val(
        kx2.astype(jnp.bfloat16), wrefs["fk"][0][0], fk_st, fk_off,
        split=fk_split, m=hidden, k=C, wide=wide["fk"], field1=f1["fk"],
    )
    k_hid = jnp.maximum(k_hid, 0.0)
    k_hid = k_hid * k_hid
    fv_st, fv_off = st_off("fv")
    vf = _gemv_val(
        k_hid.astype(jnp.bfloat16), wrefs["fv"][0][0], fv_st, fv_off,
        split=fv_split, m=C, k=hidden, wide=wide["fv"], field1=f1["fv"],
    )
    x = x + vf
    fsh_out_ref[0] = fsh + m_lane * (xx2 - fsh)

    if rescale is not None:
        if has_carry:
            goff = meta_ref[0, 1].astype(jnp.int32)  # global layer offset
            x = jnp.where((goff + i + 1) % rescale == 0, x * 0.5, x)
        else:
            x = jnp.where((i + 1) % rescale == 0, x * 0.5, x)

    x_scr[:] = x

    @pl.when(i == L - 1)
    def _final():
        x_out_ref[:] = x
        if has_carry:
            v0_out_ref[:] = v0_scr[:]


# ---------------------------------------------------------------------------
# host-side prep: stacked, row-permuted weight blocks
# ---------------------------------------------------------------------------

_QKINDS = ("qk", "qk_b", "qk_nomin", "int8")


def _form_keys(prep: dict) -> tuple:
    """Operand key tuple for a _prep_matrix form (codes first)."""
    native = prep.get("native") if isinstance(prep, dict) else prep
    if native == "dense":
        return ("codes",)
    if native in ("qk", "qkb", "b1f"):
        return ("codes", "stq", "mnq", "sd", "sdm")
    if native == "n1f" or (
        isinstance(native, tuple) and native and native[0] == "nomin"
    ):
        return ("codes", "scq", "sdn")
    return ("codes", "st", "off")


def _field1_tag(native):
    """True for the single-field byte-plane native forms; the string
    ``"dense"`` routes :func:`_gemv_val` to the plain-dot branch."""
    if native == "dense":
        return "dense"
    return native in ("n1f", "b1f")


@jax.tree_util.register_pytree_node_class
class DecodeBlocks7:
    """Stacked decode blocks + static shape/kind metadata, registered as a
    pytree so it can ride inside the params dict through jit/donation."""

    def __init__(self, arrays: dict, static: dict):
        self.arrays = arrays
        self.static = static

    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        return (
            tuple(self.arrays[k] for k in keys),
            (keys, tuple(sorted(self.static.items()))),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, static_items = aux
        return cls(dict(zip(keys, children)), dict(static_items))

    def __getitem__(self, k):
        return self.arrays[k]

    def __contains__(self, k):
        return k in self.arrays


def _mega_perm(m: int) -> np.ndarray:
    """arranged[r] = logical (r%2)*(m/2) + r//2 — plane A (low half-words
    of the u8→i32→bf16 bitcast chain) lands on logical rows [0, m/2) in
    order, plane B on [m/2, m)."""
    r = np.arange(m)
    return (r % 2) * (m // 2) + r // 2


def _host_matrices(mats: list) -> list:
    """One BULK device→host transfer of every Matrix's arrays before the
    numpy prep work. ``_prep_matrix`` reads arrays with ``np.asarray``;
    on device-resident params each read is a separate transfer (over
    this environment's tunnel a per-array fetch loop measured 28.9 s for
    a 0.1B model vs 7.3 s fetched in one batch). Non-Matrix entries pass
    through unchanged."""
    from ...models.matrix import Matrix

    out = list(mats)
    idx = []
    for i, m in enumerate(mats):
        if not isinstance(m, Matrix) or m.kind == "dense":
            continue  # dense prep is a pure device-side cast: no fetch
        if (m.kind not in _QKINDS
                or getattr(m.arrays.get("codes"), "ndim", 0) != 3):
            continue  # _prep_matrix will reject it: don't pay a fetch
        host = m.host_arrays()
        if host is not None:
            # loader-attached numpy mirror: zero transfers
            out[i] = Matrix(m.kind, m.shape, host)
        else:
            idx.append(i)
    if not idx:
        return out
    fetched = jax.device_get([mats[i].arrays for i in idx])
    for i, arrs in zip(idx, fetched):
        m = mats[i]
        out[i] = Matrix(m.kind, m.shape, arrs)
    return out


def _prep_matrix(mat) -> dict | None:
    """Arrange a stacked quantized Matrix for :func:`_gemv_val`:
    row-permuted unsigned codes, transposed logical scales (with the hi
    nibble's 16x stacked for byte kinds), and the folded offset operand
    covering code offsets + the bf16-pair +16 bias.

    Per kind, with s = per-group scale, element value v and byte u:
      qk        v = s·nib − mn           → off = mn + 16·s
      qk_b      v = s·u − mn, u = 16h+l  → st = [s;16s], off = mn + 272·s
      qk_nomin  v = s·q (u8 or i8+128)   → st = [s;16s], off = (272|400)·s
      int8      v = mn + s·u             → st = [s;16s], off = 272·s − mn
    """
    from ...models.matrix import Matrix

    if isinstance(mat, Matrix) and mat.kind == "dense":
        # dense bf16 resident: the "codes" ARE the weights and the
        # in-kernel gemv is one plain MXU dot — f16-class models (the
        # reference's primary decode format) ride the same layer-scan
        # pipeline instead of the composed per-op path
        w = mat.arrays["w"]
        if w.ndim != 3 or w.shape[1] % 8:
            return None
        return {"codes": jnp.asarray(w).astype(jnp.bfloat16),
                "split": False, "native": "dense"}
    if not isinstance(mat, Matrix) or mat.kind not in _QKINDS:
        return None
    a = mat.arrays
    codes = np.asarray(a["codes"])
    if codes.ndim != 3:
        return None  # needs the stacked [L, m, kdim] form
    L, m, kdim = codes.shape
    if m % 8:
        return None
    codes = codes[:, _mega_perm(m)]
    if codes.dtype == np.int8:
        shift = 128.0
        codes = (codes.astype(np.int16) + 128).astype(np.uint8)
    else:
        shift = 0.0
        codes = codes.astype(np.uint8)

    def t(x):  # [L, m, g] -> [L, g, m]
        return np.ascontiguousarray(np.swapaxes(x, -1, -2))

    if mat.kind == "qk" and "sc6" in a:
        # native scale factors (row-aligned super-blocks): stream 6-bit
        # codes + per-8-group f16-valued super-scales instead of the two
        # f32 product arrays — 2.7x less scale DMA; st/off form in-kernel
        return {
            "codes": jnp.asarray(codes),
            "stq": jnp.asarray(t(np.asarray(a["sc6"], np.uint8))),
            "mnq": jnp.asarray(t(np.asarray(a["mn6"], np.uint8))),
            "sd": jnp.asarray(t(np.asarray(a["d8"], np.float32))),
            "sdm": jnp.asarray(t(np.asarray(a["dm8"], np.float32))),
            "split": True,
            "native": "qk",
        }

    if mat.kind == "qk_b" and "sc6" in a:
        # native byte-kind factors (Q5_K/Q2_K): codes are unsigned and
        # fit 7 bits, so the SINGLE-FIELD plane path applies — st = s and
        # off = dmin·mn + 128·s form in-kernel (see _gemv_val field1)
        return {
            "codes": jnp.asarray(codes),
            "stq": jnp.asarray(t(np.asarray(a["sc6"], np.uint8))),
            "mnq": jnp.asarray(t(np.asarray(a["mn6"], np.uint8))),
            "sd": jnp.asarray(t(np.asarray(a["d8"], np.float32))),
            "sdm": jnp.asarray(t(np.asarray(a["dm8"], np.float32))),
            "split": False,
            "native": "b1f",
        }

    if mat.kind == "qk_nomin" and "q6s" in a:
        # no-min native factors (Q6_K/Q3_K): signed codes fit 7 bits —
        # rebias to +64 (instead of the nibble-pair path's +128) so the
        # single-field planes read bf16(128 + q + 64) = 192 + q and the
        # offset fold is the scalar 192·s, formed in-kernel
        assert shift == 128.0, "q6s implies signed i8 codes"
        return {
            "codes": jnp.asarray((codes.astype(np.int16) - 64).astype(np.uint8)),
            "scq": jnp.asarray(t(np.asarray(a["q6s"], np.int8))),
            "sdn": jnp.asarray(t(np.asarray(a["q6d"], np.float32))),
            "split": False,
            "native": "n1f",
        }

    if mat.kind == "qk":
        from ...models.matrix import scale_products

        sp, mnp = scale_products(mat.kind, a)
        s = np.asarray(sp, np.float32)
        mn = np.asarray(mnp, np.float32)
        st = t(s)
        off = t(mn + 16.0 * s)
        split = True
    else:
        if mat.kind == "int8":
            mn = np.asarray(a["mn"], np.float32)
            mx = np.asarray(a["mx"], np.float32)
            s = (mx - mn) / 255.0
            off_l = 272.0 * s - mn
        else:
            from ...models.matrix import scale_products

            sp, mnp = scale_products(mat.kind, a)
            s = np.asarray(sp, np.float32)
            base = np.asarray(mnp, np.float32) if mnp is not None else 0.0
            off_l = base + (272.0 + shift) * s
        st = np.concatenate([t(s), 16.0 * t(s)], axis=-2)  # [L, 2g, m]
        off = t(off_l) if isinstance(off_l, np.ndarray) else t(off_l + 0 * s)
        split = False
    return {
        "codes": jnp.asarray(codes),
        "st": jnp.asarray(st),
        "off": jnp.asarray(off),
        "split": split,
    }


def prep_decode7(params: dict, info) -> dict | None:
    """Build the stacked decode blocks for :func:`layer_scan7` from loaded
    V7 params, or None if the model shape is ineligible (mixed per-layer
    formats, NF4 matrices, padded FFN, missing stacks). Dense bf16
    stacks prep too (round 5): the fused kernel's plain-dot branch."""
    blocks = params.get("blocks")
    if isinstance(blocks, list) or not isinstance(blocks, dict):
        return None
    att, ffn = blocks["att"], blocks["ffn"]
    if "x_stack" not in att or "lora_down" not in att:
        return None
    C, H, hs = info.num_emb, info.num_head, info.head_size
    if C != H * hs:
        return None

    fetch = _host_matrices(
        [att.get(k) for k in ("Wr", "Wk", "Wv", "Wo")]
        + [ffn.get("Wk"), ffn.get("Wv")]
    )
    rkv = [_prep_matrix(fetch[0]), _prep_matrix(fetch[1]), _prep_matrix(fetch[2])]
    wo = _prep_matrix(fetch[3])
    fk = _prep_matrix(fetch[4])
    fv = _prep_matrix(fetch[5])
    if any(p is None for p in rkv) or wo is None or fk is None or fv is None:
        return None
    for key in ("split", "native"):
        if any(p.get(key, False) != rkv[0].get(key, False) for p in rkv):
            return None
    for key in _form_keys(rkv[0])[:2]:  # codes + first scale operand
        if any(p[key].shape != rkv[0][key].shape for p in rkv):
            return None
    hidden = fk["codes"].shape[1]
    fv_k = fv["codes"].shape[-1] * (2 if fv["split"] else 1)
    if fv_k != hidden:
        return None  # tile-padded FFN key: hidden widths disagree

    L = rkv[0]["codes"].shape[0]
    dims = tuple(int(att[k].shape[-2]) for k in ("w1", "a1", "g1", "v1"))

    def stackv(*names):
        return jnp.stack([att[n].astype(jnp.float32) for n in names], axis=1)

    mega = {
        "ln1": jnp.stack([blocks["ln1"]["w"], blocks["ln1"]["b"]], axis=1),
        "ln2": jnp.stack([blocks["ln2"]["w"], blocks["ln2"]["b"]], axis=1),
        "x_stack": att["x_stack"].astype(jnp.float32),
        "vecs": jnp.stack(
            [att["w0"], att["a0"], att["v0"], att["k_k"], att["k_a"],
             ffn["x_k"]], axis=1
        ).astype(jnp.float32),
        "gn": jnp.stack([att["gn"]["w"], att["gn"]["b"]], axis=1).astype(
            jnp.float32
        ),
        "r_k": att["r_k"].astype(jnp.float32),
        "down": att["lora_down"].astype(jnp.bfloat16),
        "up": att["lora_up"].astype(jnp.bfloat16),
        "rkv_codes": jnp.concatenate([p["codes"] for p in rkv], axis=1),
    }
    # per-tag scale operands: f32 (st, off), qk-native (stq, mnq, sd,
    # sdm), or no-min-native (scq, sdn)
    for p, tag in ((rkv[0], "rkv"), (wo, "wo"), (fk, "fk"), (fv, "fv")):
        for key in _form_keys(p)[1:]:
            if tag == "rkv":
                mega[f"rkv_{key}"] = jnp.stack([q[key] for q in rkv], axis=1)
            else:
                mega[f"{tag}_{key}"] = p[key]
    mega["wo_codes"] = wo["codes"]
    mega["fk_codes"] = fk["codes"]
    mega["fv_codes"] = fv["codes"]
    static = {
        "L": int(L), "C": int(C), "H": int(H), "hs": int(hs),
        "hidden": int(hidden), "lora_dims": dims,
        "rkv_split": rkv[0]["split"], "wo_split": wo["split"],
        "fk_split": fk["split"], "fv_split": fv["split"],
        "native_tags": tuple(
            p.get("native", False) for p in (rkv[0], wo, fk, fv)
        ),
    }
    return DecodeBlocks7(mega, static)


# ---------------------------------------------------------------------------
# call wrapper
# ---------------------------------------------------------------------------


def layer_scan7(
    mega: DecodeBlocks7,
    state: dict,  # stacked pytree: att_shift [L,B,C], wkv [L,B,H,K,V], ffn_shift
    x: jax.Array,  # [B, C] post-ln0 residual input
    mask: jax.Array,  # [B] 0/1
    rescale: int | None,
    eps_ln: float, eps_gn: float, eps_l2: float,
    v0_carry: tuple[jax.Array, jax.Array] | None = None,
) -> tuple[jax.Array, dict] | tuple[jax.Array, dict, jax.Array]:
    """Run the stacked decode blocks. With ``v0_carry = (v0_in [B, C],
    meta [1, 2])`` the kernel runs as a PIPELINE STAGE over a layer
    slice: meta[0,0] = 1.0 means a prior stage owns layer 0 (v0 comes
    from ``v0_in``), meta[0,1] is the stage's global layer offset (for
    the rescale modulo), and the return gains the outgoing v0 anchor:
    ``(x, new_state, v0_out)``."""
    s = mega.static
    L, C, H, hs, hidden = s["L"], s["C"], s["H"], s["hs"], s["hidden"]
    B = x.shape[0]
    f32 = jnp.float32
    D = mega["down"].shape[1]

    def blk(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _n=nd: (i,) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    operands = [
        mega["ln1"], mega["ln2"], mega["x_stack"], mega["vecs"], mega["gn"],
        mega["r_k"], mega["down"], mega["up"],
    ]
    in_specs = [
        blk((2, C)), blk((2, C)), blk((6, C)), blk((6, C)), blk((2, C)),
        blk((H, hs)), blk((D, C)), blk((C, D)),
    ]
    native_tags = s.get("native_tags", (False,) * 4)
    for tag, native in zip(("rkv", "wo", "fk", "fv"), native_tags):
        for part in _form_keys(native):
            a = mega[f"{tag}_{part}"]
            operands.append(a)
            in_specs.append(blk(tuple(a.shape[1:])))

    operands += [
        x.astype(f32),
        state["att_shift"].astype(f32),
        state["ffn_shift"].astype(f32),
        state["wkv"].astype(f32),
        mask.astype(f32)[:, None],
    ]
    in_specs += [
        full((B, C)),
        blk((B, C)),
        blk((B, C)),
        blk((B, H, hs, hs)),
        full((B, 1)),
    ]
    has_carry = v0_carry is not None
    if has_carry:
        v0_in, meta = v0_carry
        operands += [v0_in.astype(f32), meta.astype(f32)]
        in_specs += [full((B, C)), full((1, 2))]

    # Strategy above the narrow-batch threshold: measured all-wide for
    # every in-kernel matrix. The MXU-tile cost model (row blocks are
    # 128 wide; fewest weight-plane passes wins) predicts group-
    # expansion should beat the wide form for the g=24 matrices at B=8,
    # and it DOES for the standalone tiled kernels (the vocab head runs
    # 3x faster narrow — see quant_matmul's hybrid dispatch), but inside
    # the layer kernel the narrow form's [n·gh, m'] intermediates and 3D
    # relayouts cost more than the saved tiles (in-session A/B,
    # scripts/bench_hybrid_ab.py: all-wide 430.8 us/step vs hybrid 466.4
    # vs narrow-except-fv 482.5 at B=8). _FORCE_WIDE overrides per tag
    # for experiments.
    wide = B > config.scan_wide_batch
    wide_map = (dict(_FORCE_WIDE) if _FORCE_WIDE is not None
                else {tag: wide for tag in ("rkv", "wo", "fk", "fv")})

    kernel = functools.partial(
        _layer_scan_kernel,
        B=B, C=C, H=H, hs=hs, hidden=hidden, L=L, rescale=rescale,
        rkv_split=s["rkv_split"], wo_split=s["wo_split"],
        fk_split=s["fk_split"], fv_split=s["fv_split"],
        native_tags=native_tags,
        lora_dims=s["lora_dims"],
        eps_ln=eps_ln, eps_gn=eps_gn, eps_l2=eps_l2,
        wide=wide_map, has_carry=has_carry,
    )

    out_specs = [full((B, C)), blk((B, C)), blk((B, C)), blk((B, H, hs, hs))]
    out_shape = [
        jax.ShapeDtypeStruct((B, C), f32),
        jax.ShapeDtypeStruct((L, B, C), f32),
        jax.ShapeDtypeStruct((L, B, C), f32),
        jax.ShapeDtypeStruct((L, B, H, hs, hs), f32),
    ]
    if has_carry:
        out_specs.append(full((B, C)))
        out_shape.append(jax.ShapeDtypeStruct((B, C), f32))

    # state outputs alias their input buffers (the recurrent state is
    # consumed by this step): without this the decode scan must copy
    # every step's new state back into the loop carry — at B=8 the WKV
    # tensor alone is 18.9 MB of avoidable traffic per token
    state_in0 = len(operands) - (4 if has_carry else 2) - 2
    outs = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        input_output_aliases={state_in0: 1, state_in0 + 1: 2, state_in0 + 2: 3},
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((B, C), f32),  # residual carry
            pltpu.VMEM((B, C), f32),  # value-residual carry
        ],
        interpret=config.interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * L * B * C * (3 * C + hidden * 2 + C + H * hs),
            bytes_accessed=int(
                mega["rkv_codes"].size + mega["fk_codes"].size
                + mega["fv_codes"].size + mega["wo_codes"].size
                + 2 * L * (mega["down"].size // L)
                + 8 * L * B * H * hs * hs
            ),
            transcendentals=4 * L * B * C,
        ),
    )(*operands)
    x_out, ash, fsh, wkv = outs[:4]
    new_state = {"att_shift": ash, "wkv": wkv, "ffn_shift": fsh}
    if has_carry:
        return x_out, new_state, outs[4]
    return x_out, new_state
