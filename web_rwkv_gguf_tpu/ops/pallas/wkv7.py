"""RWKV-7 generalized-delta-rule WKV scan as a Pallas TPU kernel.

Each grid program keeps the state matrices ``S[bb, H, K, V]`` of a GROUP
of ``bb`` batch lanes resident in VMEM across the whole chunk and
vectorizes the per-token update over lanes × heads (the reference
re-reads the state from GPU global memory per token, ref:
src/shaders/time_mix_v7.wgsl:172-217). Pallas TPU grids execute
sequentially, so one-lane-per-program serializes batched decode — the
group size is chosen to pack as many lanes per program as the VMEM
state budget allows (measured 25x slowdown at B=8 with grid=(B,)).

Padding is handled by pre-masking the inputs (w←1, k←0, b←0 makes the
update a no-op) instead of an in-kernel select, which removes the SMEM
mask plumbing entirely.

Per token (ref math, time_mix_v7.wgsl:143-221):
    sa = aᵀS;  S ← diag(w)S + k vᵀ + b saᵀ;  y = Sᵀr
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import config

# scoped-VMEM limit requested for the WKV kernels (the 16 MB default is
# conservative; v5e-class chips have 128 MB physical VMEM) and the live
# bytes budgeted per batch lane: the loop body keeps ~10 state-sized
# temporaries (sa, kv, b·sa, w·S, partial sums) plus double-buffered
# token slabs
_VMEM_LIMIT = 64 << 20
_LIVE_BUDGET = 48 << 20


def _batch_group(B: int, H: int, K: int, V: int, T: int = 1) -> int:
    per_lane = 10 * H * K * V * 4 + 12 * T * H * K * 4
    bb = max(1, _LIVE_BUDGET // per_lane)
    while B % bb:
        bb -= 1
    return bb


def _wkv7_kernel(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                 y_ref, s1_ref):
    T = r_ref.shape[1]

    def body(t, S):  # S: [bb, H, K, V]
        rt = r_ref[:, t][:, :, :, None]  # [bb, H, K, 1]
        wt = w_ref[:, t][:, :, :, None]
        kt = k_ref[:, t][:, :, :, None]
        at = a_ref[:, t][:, :, :, None]
        bt = b_ref[:, t][:, :, :, None]
        vt = v_ref[:, t][:, :, None, :]  # [bb, H, 1, V]

        sa = jnp.sum(at * S, axis=2, keepdims=True)  # [bb, H, 1, V]
        S = wt * S + kt * vt + bt * sa
        y_ref[:, t] = jnp.sum(rt * S, axis=2)
        return S

    s1_ref[:] = jax.lax.fori_loop(0, T, body, s0_ref[:])


def _att_core7_kernel(r_ref, wraw_ref, kraw_ref, v_ref, araw_ref, g_ref,
                      kkv_ref, kav_ref, gnw_ref, gnb_ref, rk_ref, m_ref,
                      s0_ref, y_ref, s1_ref, *, eps, l2_eps):
    S = s0_ref[:]  # [bb, H, K, V]
    kraw = kraw_ref[:]  # [bb, H, K]

    # decay activation: w = exp(-e^{-0.5}·sigmoid(w_in))
    # (ref: time_mix_v7.wgsl:68-70)
    w2 = jnp.exp(-0.606531 * jax.nn.sigmoid(wraw_ref[:]))
    a2 = jax.nn.sigmoid(araw_ref[:])  # in-context learning rate
    # kk = l2-normalized k∘k_k per head (ref: v7.rs:888-890)
    kkr = kraw * kkv_ref[:][None]
    kk = kkr * jax.lax.rsqrt(
        jnp.sum(kkr * kkr, axis=2, keepdims=True) + l2_eps
    )
    # control-k: k ← k·(1 + (a−1)·k_a)  (ref: control_k_v7.wgsl:73)
    k2 = kraw * (1.0 + (a2 - 1.0) * kav_ref[:][None])

    rt = r_ref[:][:, :, :, None]  # [bb, H, K, 1]
    wt = w2[:, :, :, None]
    kt = k2[:, :, :, None]
    at = -kk[:, :, :, None]
    bt = (kk * a2)[:, :, :, None]
    vt = v_ref[:][:, :, None, :]  # [bb, H, 1, V]

    sa = jnp.sum(at * S, axis=2, keepdims=True)  # [bb, H, 1, V]
    S_n = wt * S + kt * vt + bt * sa
    m = m_ref[:][:, :, :, None]  # [bb, 1, 1, 1] 0/1
    s1_ref[:] = S + m * (S_n - S)
    y0 = jnp.sum(rt * S_n, axis=2)  # [bb, H, V]

    # group_norm over V per (b, h) — same two-pass form as ops.basic
    mu = jnp.mean(y0, axis=2, keepdims=True)
    var = jnp.mean((y0 - mu) * (y0 - mu), axis=2, keepdims=True)
    yn = (y0 - mu) * jax.lax.rsqrt(var + eps) * gnw_ref[:][None] + gnb_ref[:][None]

    # r_k bonus: y += (Σ_k r·k·r_k)·v with the CONTROLLED k
    # (ref: time_mix_v7.wgsl:223-261)
    sb = jnp.sum(r_ref[:] * k2 * rk_ref[:][None], axis=2, keepdims=True)
    y_ref[:] = (yn + sb * v_ref[:]) * g_ref[:]


def att_core7_step(
    state: jax.Array,  # [B, H, K, V] f32
    r: jax.Array,  # [B, H, K]
    w_raw: jax.Array,  # [B, H, K] raw decay (w0 + LoRA, pre-activation)
    k_raw: jax.Array,  # [B, H, K] key projection (pre control-k)
    v: jax.Array,  # [B, H, V]
    a_raw: jax.Array,  # [B, H, K] raw iclr (a0 + LoRA, pre-sigmoid)
    g: jax.Array,  # [B, H, V] gate (final: the LoRA's sigmoid is mid)
    k_k: jax.Array,  # [H, K] kk scale vector
    k_a: jax.Array,  # [H, K] control-k blend vector
    gn_w: jax.Array,  # [H, V] group-norm scale (per channel)
    gn_b: jax.Array,  # [H, V]
    r_k: jax.Array,  # [H, K]
    mask: jax.Array,  # [B] bool
    eps: float,
    l2_eps: float,
) -> tuple[jax.Array, jax.Array]:
    """Fused T=1 decode attention core in ONE kernel launch: decay
    activation, kk l2-norm, control-k, sigmoid(a)/sigmoid(g), the WKV
    delta-rule step, group_norm, r_k bonus, and the gate multiply.

    As XLA ops these are ~20 small HLO launches per layer that dominate
    batch-1 decode (scripts/bench_layer_ablate.py, bench_att_core.py).
    Returns ``(y [B, H, V] f32, new_state)``; ``y`` is the gated
    post-norm output, ready for the output projection. Masked lanes keep
    their state (in-kernel select); their y output is dead/unspecified,
    like the XLA step's.
    """
    B, H, K = r.shape
    V = state.shape[-1]
    f32 = jnp.float32
    bb = _batch_group(B, H, K, V, 1)

    vec = pl.BlockSpec((bb, H, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    val = pl.BlockSpec((bb, H, V), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    par = pl.BlockSpec((H, V), lambda i: (0, 0), memory_space=pltpu.VMEM)
    park = pl.BlockSpec((H, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    msk = pl.BlockSpec((bb, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((bb, H, K, V), lambda i: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)

    import functools

    y, s1 = pl.pallas_call(
        functools.partial(_att_core7_kernel, eps=eps, l2_eps=l2_eps),
        grid=(B // bb,),
        in_specs=[vec, vec, vec, val, vec, val, park, park, par, par, park,
                  msk, st],
        out_specs=(val, st),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, V), f32),
            jax.ShapeDtypeStruct((B, H, K, V), f32),
        ),
        interpret=config.interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * K * V,
            bytes_accessed=4 * B * H * K * V * 2 + 4 * B * H * (5 * K + 2 * V),
            transcendentals=2 * B * H * K,
        ),
    )(
        r.astype(f32), w_raw.astype(f32), k_raw.astype(f32), v.astype(f32),
        a_raw.astype(f32), g.astype(f32), k_k.astype(f32),
        k_a.astype(f32), gn_w.astype(f32), gn_b.astype(f32), r_k.astype(f32),
        mask.astype(f32)[:, None, None], state.astype(f32),
    )
    return y, s1


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
    bb = _batch_group(B, H, K, V, T)

    # pre-mask: padded tokens must leave S unchanged — w=1 keeps the decay
    # term, k=0 kills the write, b=0 kills the delta correction
    m = mask[..., None, None].astype(f32)  # [B, T, 1, 1]
    w = jnp.where(m > 0, w.astype(f32), 1.0)
    k = k.astype(f32) * m
    b = b.astype(f32) * m

    vec_spec = pl.BlockSpec((bb, T, H, K), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((bb, T, H, V), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((bb, H, K, V), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)

    y, s1 = pl.pallas_call(
        _wkv7_kernel,
        grid=(B // bb,),
        in_specs=[vec_spec, vec_spec, vec_spec, val_spec, vec_spec, vec_spec,
                  st_spec],
        out_specs=(val_spec, st_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, H, V), f32),
            jax.ShapeDtypeStruct((B, H, K, V), f32),
        ),
        interpret=config.interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * T * H * K * V,
            bytes_accessed=4 * B * T * H * K * 6 + 4 * B * H * K * V * 2,
            transcendentals=0,
        ),
    )(
        r.astype(f32), w, k, v.astype(f32), a.astype(f32), b,
        state.astype(f32),
    )
    return y, s1
