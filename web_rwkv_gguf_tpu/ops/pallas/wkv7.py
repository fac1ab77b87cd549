"""RWKV-7 generalized-delta-rule WKV scan as a Pallas TPU kernel.

Grid is (batch,); each program keeps ALL of its heads' state matrices
``S[H, K, V]`` resident in VMEM across the whole chunk and vectorizes the
per-token update over heads (the reference re-reads the state from GPU
global memory per token, ref: src/shaders/time_mix_v7.wgsl:172-217).
Vectorizing across H × V lanes keeps the VPU full; a per-(batch, head)
grid was measured ~50% slower (sequential grid programs with small ops).

Per token (ref math, time_mix_v7.wgsl:143-221):
    sa = aᵀS;  S ← diag(w)S + k vᵀ + b saᵀ;  y = Sᵀr
Masked (padding) tokens skip the state update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config


def _wkv7_kernel(mask_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                 y_ref, s1_ref):
    T = r_ref.shape[1]
    bi = pl.program_id(0)

    def body(t, S):  # S: [H, K, V]
        rt = r_ref[0, t][:, :, None]  # [H, K, 1]
        wt = w_ref[0, t][:, :, None]
        kt = k_ref[0, t][:, :, None]
        at = a_ref[0, t][:, :, None]
        bt = b_ref[0, t][:, :, None]
        vt = v_ref[0, t][:, None, :]  # [H, 1, V]

        sa = jnp.sum(at * S, axis=1, keepdims=True)  # [H, 1, V]
        S_new = wt * S + kt * vt + bt * sa
        y_ref[0, t] = jnp.sum(rt * S_new, axis=1)
        return jnp.where(mask_ref[bi, t] > 0, S_new, S)

    s1_ref[0] = jax.lax.fori_loop(0, T, body, s0_ref[0])


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

    vec_spec = pl.BlockSpec((1, T, H, K), lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((1, T, H, V), lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, H, K, V), lambda bi: (bi, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    # SMEM, unblocked: the per-token mask is read with dynamic (loop)
    # indices, which vector memory cannot do along the lane dim
    mask_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    y, s1 = pl.pallas_call(
        _wkv7_kernel,
        grid=(B,),
        in_specs=[mask_spec, vec_spec, vec_spec, vec_spec, val_spec, vec_spec,
                  vec_spec, st_spec],
        out_specs=(val_spec, st_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, H, V), f32),
            jax.ShapeDtypeStruct((B, H, K, V), f32),
        ),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * B * T * H * K * V,
            bytes_accessed=4 * B * T * H * K * 6 + 4 * B * H * K * V * 2,
            transcendentals=0,
        ),
    )(
        mask.astype(f32),
        *(t.astype(f32) for t in (r, w, k, v, a, b)),
        state.astype(f32),
    )
    return y, s1
