"""Pallas TPU kernels for the V4 scalar WKV and V5/V6 matrix WKV scans.

Same design as wkv7.py: each grid program holds the state of a GROUP of
batch lanes in VMEM (Pallas TPU grids are sequential, so one lane per
program serializes batched decode), heads vectorized, padding handled by
pre-masking the inputs.

  V5/V6 (ref: time_mix_v{5,6}.wgsl): y = rᵀ(u∘(k vᵀ) + S); S ← diag(w)S + k vᵀ
    (V5 = static per-channel w/u; V6 = per-token w.)
  V4 (ref: time_mix_v4.wgsl:57-120): numerically-stable exp-WKV with the
    running-max trick over per-channel (aa, bb, pp) state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config
from .wkv7 import _VMEM_LIMIT, _batch_group


# --------------------------------------------------------------------------
# V6 (and V5 via broadcast): per-head matrix state
# --------------------------------------------------------------------------


def _wkv6_kernel(u_ref, r_ref, k_ref, v_ref, w_ref, s0_ref, y_ref, s1_ref):
    T = r_ref.shape[1]
    u = u_ref[:][None, :, :, None]  # [1, H, K, 1]

    def body(t, S):  # S: [bb, H, K, V]
        rt = r_ref[:, t][:, :, :, None]
        kt = k_ref[:, t][:, :, :, None]
        wt = w_ref[:, t][:, :, :, None]
        vt = v_ref[:, t][:, :, None, :]  # [bb, H, 1, V]
        kv = kt * vt
        y_ref[:, t] = jnp.sum(rt * (u * kv + S), axis=2)
        return wt * S + kv

    s1_ref[:] = jax.lax.fori_loop(0, T, body, s0_ref[:])


def wkv6_pallas(state, r, k, v, u, w, mask):
    """Drop-in for ops.wkv.wkv6: r/k/w [B,T,H,K], v [B,T,H,V], u [H,K]."""
    B, T, H, K = r.shape
    V = state.shape[-1]
    f32 = jnp.float32
    bb = _batch_group(B, H, K, V, T)

    # pre-mask: padded tokens must leave S unchanged (w=1 keeps the decay
    # term, k=0 kills the write); their y rows are don't-care
    m = mask[..., None, None].astype(f32)  # [B, T, 1, 1]
    w = jnp.where(m > 0, w.astype(f32), 1.0)
    k = k.astype(f32) * m

    vec = pl.BlockSpec((bb, T, H, K), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    val = pl.BlockSpec((bb, T, H, V), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((bb, H, K, V), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    uu = pl.BlockSpec((H, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    y, s1 = pl.pallas_call(
        _wkv6_kernel,
        grid=(B // bb,),
        in_specs=[uu, vec, vec, val, vec, st],
        out_specs=(val, st),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, H, V), f32),
            jax.ShapeDtypeStruct((B, H, K, V), f32),
        ),
        interpret=config.interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * T * H * K * V,
            bytes_accessed=4 * B * T * H * K * 4 + 4 * B * H * K * V * 2,
            transcendentals=0,
        ),
    )(
        u.astype(f32), r.astype(f32), k, v.astype(f32), w,
        state.astype(f32),
    )
    return y, s1


def wkv5_pallas(state, r, k, v, u, w, mask):
    """V5: static per-channel decay — broadcast w over T and reuse the V6
    kernel (the extra VMEM for T×w is negligible at chunk sizes)."""
    B, T = r.shape[:2]
    wt = jnp.broadcast_to(w[None, None], (B, T) + w.shape)
    return wkv6_pallas(state, r, k, v, u, wt, mask)


# --------------------------------------------------------------------------
# V4: per-channel scalar state with the max-trick
# --------------------------------------------------------------------------


def _wkv4_kernel(mask_ref, u_ref, w_ref, k_ref, v_ref, r_ref, s0_ref,
                 y_ref, s1_ref):
    """V4 keeps an in-kernel select: the pp (running max) row cannot be
    no-op'd by input masking alone. Grid stays (B,) — V4 models are small
    and single-head, so the sequential-grid cost is minor."""
    T = k_ref.shape[1]
    bi = pl.program_id(0)
    u = u_ref[:]  # [1, C]
    w = w_ref[:]

    def body(t, carry):
        aa, bb, pp = carry
        kt = k_ref[0, pl.ds(t, 1), :]
        vt = v_ref[0, pl.ds(t, 1), :]
        rt = r_ref[0, pl.ds(t, 1), :]
        rr = 1.0 / (1.0 + jnp.exp(-rt))

        ww = u + kt
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        y_ref[0, pl.ds(t, 1), :] = rr * (e1 * aa + e2 * vt) / (e1 * bb + e2)

        ww = w + pp
        q = jnp.maximum(ww, kt)
        e1 = jnp.exp(ww - q)
        e2 = jnp.exp(kt - q)
        m = mask_ref[bi, t] > 0
        aa_n = jnp.where(m, e1 * aa + e2 * vt, aa)
        bb_n = jnp.where(m, e1 * bb + e2, bb)
        pp_n = jnp.where(m, q, pp)
        return aa_n, bb_n, pp_n

    aa, bb, pp = jax.lax.fori_loop(
        0, T, body,
        (s0_ref[0, pl.ds(0, 1), :], s0_ref[0, pl.ds(1, 1), :], s0_ref[0, pl.ds(2, 1), :]),
    )
    s1_ref[0, pl.ds(0, 1), :] = aa
    s1_ref[0, pl.ds(1, 1), :] = bb
    s1_ref[0, pl.ds(2, 1), :] = pp


def wkv4_pallas(state, k, v, r, u, w, mask):
    """Drop-in for ops.wkv.wkv4: k/v/r [B,T,C], u/w [C], state [B,C,3]."""
    B, T, C = k.shape
    f32 = jnp.float32
    seq = pl.BlockSpec((1, T, C), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((1, 3, C), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    cvec = pl.BlockSpec((1, C), lambda bi: (0, 0), memory_space=pltpu.VMEM)
    msk = pl.BlockSpec(memory_space=pltpu.SMEM)

    # state [B, C, 3] → [B, 3, C] rows (aa, bb, pp)
    s_rows = state.astype(f32).transpose(0, 2, 1)
    y, s1 = pl.pallas_call(
        _wkv4_kernel,
        grid=(B,),
        in_specs=[msk, cvec, cvec, seq, seq, seq, st],
        out_specs=(seq, st),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, C), f32),
            jax.ShapeDtypeStruct((B, 3, C), f32),
        ),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * B * T * C,
            bytes_accessed=4 * B * T * C * 4,
            transcendentals=5 * B * T * C,
        ),
    )(
        mask.astype(f32), u.astype(f32)[None, :], w.astype(f32)[None, :],
        *(t.astype(f32) for t in (k, v, r)),
        s_rows,
    )
    return y, s1.transpose(0, 2, 1)
