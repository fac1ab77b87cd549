"""RWKV-7 generalized-delta-rule WKV scan as a Pallas TPU kernel.

Grid is (batch, head); each program keeps its head's state matrix
``S[K, V]`` resident in VMEM across the whole chunk (the reference keeps
it in GPU global memory and re-reads it per token,
ref: src/shaders/time_mix_v7.wgsl:172-217 — on TPU the state never
leaves VMEM between tokens, which is the main win over the XLA
``lax.scan`` lowering).

Per token (ref math, time_mix_v7.wgsl:143-221):
    sa = aᵀS;  S ← diag(w)S + k vᵀ + b saᵀ;  y = Sᵀr
Masked (padding) tokens skip the state update.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config


def _wkv7_kernel(mask_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                 y_ref, s1_ref):
    T = r_ref.shape[0]

    def body(t, S):
        rt = r_ref[t, :][:, None]  # [K, 1]
        wt = w_ref[t, :][:, None]
        kt = k_ref[t, :][:, None]
        at = a_ref[t, :][:, None]
        bt = b_ref[t, :][:, None]
        vt = v_ref[t, :][None, :]  # [1, V]

        sa = jnp.sum(at * S, axis=0, keepdims=True)  # [1, V]
        S_new = wt * S + kt * vt + bt * sa
        y_ref[t, :] = jnp.sum(rt * S_new, axis=0)
        return jnp.where(mask_ref[0, t] > 0, S_new, S)

    s1_ref[:] = jax.lax.fori_loop(0, T, body, s0_ref[:])


def wkv7_pallas(
    state: jax.Array,  # [B, H, K, V] f32
    r: jax.Array,  # [B, T, H, K]
    w: jax.Array,
    k: jax.Array,
    v: jax.Array,
    a: jax.Array,
    b: jax.Array,
    mask: jax.Array,  # [B, T] bool
) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ops.wkv.wkv7 (returns y [B,T,H,V], state)."""
    B, T, H, K = r.shape
    V = state.shape[-1]
    f32 = jnp.float32

    # [B, T, H, K] → [B, H, T, K] so each (b, h) program gets a [T, K] block
    def prep(x):
        return x.astype(f32).transpose(0, 2, 1, 3)

    rs, ws, ks, vs, as_, bs = map(prep, (r, w, k, v, a, b))
    maskf = mask.astype(f32)

    vec_spec = pl.BlockSpec((1, 1, T, K), lambda bi, hi: (bi, hi, 0, 0),
                            memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((1, 1, T, V), lambda bi, hi: (bi, hi, 0, 0),
                            memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, 1, K, V), lambda bi, hi: (bi, hi, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, T), lambda bi, hi: (bi, 0),
                             memory_space=pltpu.VMEM)

    def kernel(mask_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
               y_ref, s1_ref):
        _wkv7_kernel(
            mask_ref,
            r_ref.at[0, 0], w_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0],
            a_ref.at[0, 0], b_ref.at[0, 0], s0_ref.at[0, 0],
            y_ref.at[0, 0], s1_ref.at[0, 0],
        )

    y, s1 = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[mask_spec, vec_spec, vec_spec, vec_spec, val_spec, vec_spec,
                  vec_spec, st_spec],
        out_specs=(val_spec, st_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, T, V), f32),
            jax.ShapeDtypeStruct((B, H, K, V), f32),
        ),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * B * T * H * K * V,
            bytes_accessed=4 * B * T * H * K * 6 + 4 * B * H * K * V * 2,
            transcendentals=0,
        ),
    )(maskf, rs, ws, ks, vs, as_, bs, state.astype(f32))

    return y.transpose(0, 2, 1, 3), s1
