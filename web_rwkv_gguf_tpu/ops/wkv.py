"""WKV recurrences for RWKV V4..V7 — XLA ``lax.scan`` reference versions.

These are the numerical ground truth for the Pallas kernels in
``ops/pallas`` and are used directly on CPU and for small configs. All
operate on a dense batch layout ``[B, T, ...]`` with a validity mask:
masked (padding) steps leave the recurrent state untouched.

State conventions (f32):
  V4: per channel (aa, bb, pp) with pp initialized to -inf-ish
      (ref uses f32::MIN; time_mix_v4.wgsl:96-118 runs the max-trick).
  V5/V6/V7: per head matrix S[K, V] where K indexes key channels and V
      value channels: y_t = S^T r (ref: time_mix_v{5,6,7}.wgsl).

Formulas (ref: src/shaders/time_mix_v{4,5,6,7}.wgsl):
  V5/V6: y = Sᵀr + (u∘k·v-style bonus): y_t[i] = Σ_j r_j (u_j k_j v_i + S_ji)
         S ← diag(w) S + k vᵀ
  V7:    sa = Sᵀ a;  S ← diag(w) S + k vᵀ + b saᵀ;  y = Sᵀ r
         with a = -kk, b = kk ∘ a_ctrl, w = exp(-exp(-0.5) sigmoid(w_in))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32_MIN = jnp.finfo(jnp.float32).min


def wkv4(
    state: jax.Array,  # [B, C, 3] (aa, bb, pp)
    k: jax.Array,  # [B, T, C]
    v: jax.Array,  # [B, T, C]
    r: jax.Array,  # [B, T, C] (pre-sigmoid)
    u: jax.Array,  # [C] time_first
    w: jax.Array,  # [C] time_decay (already -exp(raw))
    mask: jax.Array,  # [B, T] bool
) -> tuple[jax.Array, jax.Array]:
    """Numerically-stable serial WKV v4 (ref: time_mix_v4.wgsl:57-120)."""
    f32 = jnp.float32
    k, v, r = k.astype(f32), v.astype(f32), r.astype(f32)
    u, w = u.astype(f32), w.astype(f32)

    def step(carry, xs):
        aa, bb, pp = carry
        kk, vv, rr, m = xs
        rr = jax.nn.sigmoid(rr)
        ww = u + kk
        q = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - q)
        e2 = jnp.exp(ww - q)
        y = rr * (e1 * aa + e2 * vv) / (e1 * bb + e2)

        ww = w + pp
        q = jnp.maximum(ww, kk)
        e1 = jnp.exp(ww - q)
        e2 = jnp.exp(kk - q)
        m_ = m[:, None]
        aa_n = jnp.where(m_, e1 * aa + e2 * vv, aa)
        bb_n = jnp.where(m_, e1 * bb + e2, bb)
        pp_n = jnp.where(m_, q, pp)
        return (aa_n, bb_n, pp_n), y

    xs = (
        k.swapaxes(0, 1),
        v.swapaxes(0, 1),
        r.swapaxes(0, 1),
        mask.swapaxes(0, 1),
    )
    carry = (state[..., 0], state[..., 1], state[..., 2])
    (aa, bb, pp), ys = jax.lax.scan(step, carry, xs)
    new_state = jnp.stack([aa, bb, pp], axis=-1)
    return ys.swapaxes(0, 1), new_state


def wkv4_step(state, k, v, r, u, w, mask):
    """T==1 specialization of :func:`wkv4`: one fused XLA update with no
    scan or Pallas call (see :func:`wkv5_step`)."""
    f32 = jnp.float32
    kk, vv = k[:, 0].astype(f32), v[:, 0].astype(f32)
    rr = jax.nn.sigmoid(r[:, 0].astype(f32))
    u, w = u.astype(f32), w.astype(f32)
    aa, bb, pp = state[..., 0], state[..., 1], state[..., 2]

    ww = u + kk
    q = jnp.maximum(pp, ww)
    e1 = jnp.exp(pp - q)
    e2 = jnp.exp(ww - q)
    y = rr * (e1 * aa + e2 * vv) / (e1 * bb + e2)

    ww = w + pp
    q = jnp.maximum(ww, kk)
    e1 = jnp.exp(ww - q)
    e2 = jnp.exp(kk - q)
    m = mask[:, 0][:, None]
    new = jnp.stack(
        [
            jnp.where(m, e1 * aa + e2 * vv, aa),
            jnp.where(m, e1 * bb + e2, bb),
            jnp.where(m, q, pp),
        ],
        axis=-1,
    )
    return y[:, None], new


def _scan_heads(step, state, xs_btf, mask):
    """Helper: scan over T for per-head recurrences with mask-gated state."""
    xs = tuple(x.swapaxes(0, 1) for x in xs_btf) + (mask.swapaxes(0, 1),)
    new_state, ys = jax.lax.scan(step, state, xs)
    return ys.swapaxes(0, 1), new_state


def wkv5(
    state: jax.Array,  # [B, H, K, V]
    r: jax.Array,  # [B, T, H, K]
    k: jax.Array,  # [B, T, H, K]
    v: jax.Array,  # [B, T, H, V]
    u: jax.Array,  # [H, K] time_first
    w: jax.Array,  # [H, K] decay factor (already exp(-exp(raw)))
    mask: jax.Array,  # [B, T]
) -> tuple[jax.Array, jax.Array]:
    """Multi-head WKV v5 (ref: time_mix_v5.wgsl:82-157)."""
    f32 = jnp.float32
    r, k, v = r.astype(f32), k.astype(f32), v.astype(f32)
    u, w = u.astype(f32), w.astype(f32)

    def step(S, xs):
        rr, kk, vv, m = xs
        kv = kk[..., :, None] * vv[..., None, :]  # [B, H, K, V]
        y = jnp.einsum("bhk,bhkv->bhv", rr, u[..., :, None] * kv + S)
        S_n = w[..., :, None] * S + kv
        S = jnp.where(m[:, None, None, None], S_n, S)
        return S, y

    return _scan_heads(step, state, (r, k, v), mask)


def wkv6(
    state: jax.Array,  # [B, H, K, V]
    r: jax.Array,  # [B, T, H, K]
    k: jax.Array,  # [B, T, H, K]
    v: jax.Array,  # [B, T, H, V]
    u: jax.Array,  # [H, K]
    w: jax.Array,  # [B, T, H, K] per-token decay (already exp(-exp(·)))
    mask: jax.Array,  # [B, T]
) -> tuple[jax.Array, jax.Array]:
    """Like v5 but with data-dependent per-token decay (ref: time_mix_v6.wgsl)."""
    f32 = jnp.float32
    r, k, v, w = r.astype(f32), k.astype(f32), v.astype(f32), w.astype(f32)
    u = u.astype(f32)

    def step(S, xs):
        rr, kk, vv, ww, m = xs
        kv = kk[..., :, None] * vv[..., None, :]
        y = jnp.einsum("bhk,bhkv->bhv", rr, u[..., :, None] * kv + S)
        S_n = ww[..., :, None] * S + kv
        S = jnp.where(m[:, None, None, None], S_n, S)
        return S, y

    return _scan_heads(step, state, (r, k, v, w), mask)


def wkv7(
    state: jax.Array,  # [B, H, K, V]
    r: jax.Array,  # [B, T, H, K]
    w: jax.Array,  # [B, T, H, K] decay factor = exp(-exp(-0.5)·sigmoid(w_in))
    k: jax.Array,  # [B, T, H, K]
    v: jax.Array,  # [B, T, H, V]
    a: jax.Array,  # [B, T, H, K] = -kk
    b: jax.Array,  # [B, T, H, K] = kk ∘ a_ctrl
    mask: jax.Array,  # [B, T]
) -> tuple[jax.Array, jax.Array]:
    """Generalized delta rule WKV v7 (ref: time_mix_v7.wgsl:143-221).

    Per head:  sa = Sᵀa;  S ← diag(w)S + k vᵀ + b saᵀ;  y = Sᵀr.
    """
    f32 = jnp.float32
    r, w, k, v = r.astype(f32), w.astype(f32), k.astype(f32), v.astype(f32)
    a, b = a.astype(f32), b.astype(f32)

    def step(S, xs):
        rr, ww, kk, vv, aa, bb, m = xs
        sa = jnp.einsum("bhk,bhkv->bhv", aa, S)
        S_n = (
            ww[..., :, None] * S
            + kk[..., :, None] * vv[..., None, :]
            + bb[..., :, None] * sa[..., None, :]
        )
        y = jnp.einsum("bhk,bhkv->bhv", rr, S_n)
        S = jnp.where(m[:, None, None, None], S_n, S)
        return S, y

    return _scan_heads(step, state, (r, w, k, v, a, b), mask)


def wkv5_step(state, r, k, v, u, w, mask):
    """T==1 specialization of :func:`wkv5`: one fused XLA update with no
    scan or Pallas call, so XLA can fuse it into the surrounding decode
    step (the Pallas kernel's fixed block-DMA cost dominates at T=1)."""
    f32 = jnp.float32
    rr, kk, vv = r[:, 0].astype(f32), k[:, 0].astype(f32), v[:, 0].astype(f32)
    u, w = u.astype(f32), w.astype(f32)
    kv = kk[..., :, None] * vv[..., None, :]
    y = jnp.einsum("bhk,bhkv->bhv", rr, u[..., :, None] * kv + state)
    S_n = w[..., :, None] * state + kv
    S = jnp.where(mask[:, 0][:, None, None, None], S_n, state)
    return y[:, None], S


def wkv6_step(state, r, k, v, u, w, mask):
    """T==1 specialization of :func:`wkv6` (see :func:`wkv5_step`)."""
    f32 = jnp.float32
    rr, kk, vv = r[:, 0].astype(f32), k[:, 0].astype(f32), v[:, 0].astype(f32)
    ww, u = w[:, 0].astype(f32), u.astype(f32)
    kv = kk[..., :, None] * vv[..., None, :]
    y = jnp.einsum("bhk,bhkv->bhv", rr, u[..., :, None] * kv + state)
    S_n = ww[..., :, None] * state + kv
    S = jnp.where(mask[:, 0][:, None, None, None], S_n, state)
    return y[:, None], S


def wkv7_step(state, r, w, k, v, a, b, mask):
    """T==1 specialization of :func:`wkv7` (see :func:`wkv5_step`)."""
    f32 = jnp.float32
    rr, ww = r[:, 0].astype(f32), w[:, 0].astype(f32)
    kk, vv = k[:, 0].astype(f32), v[:, 0].astype(f32)
    aa, bb = a[:, 0].astype(f32), b[:, 0].astype(f32)
    sa = jnp.einsum("bhk,bhkv->bhv", aa, state)
    S_n = (
        ww[..., :, None] * state
        + kk[..., :, None] * vv[..., None, :]
        + bb[..., :, None] * sa[..., None, :]
    )
    y = jnp.einsum("bhk,bhkv->bhv", rr, S_n)
    S = jnp.where(mask[:, 0][:, None, None, None], S_n, state)
    return y[:, None], S


def wkv7_act_w(w_in: jax.Array) -> jax.Array:
    """V7 in-kernel decay activation: exp(-exp(-0.5)·sigmoid(x))
    (ref: time_mix_v7.wgsl:68-70; 0.606531 = exp(-0.5))."""
    return jnp.exp(-0.606531 * jax.nn.sigmoid(w_in.astype(jnp.float32)))


def wkv7_bonus(
    r: jax.Array,  # [B, T, H, K]
    k: jax.Array,  # [B, T, H, K]
    v: jax.Array,  # [B, T, H, V]
    r_k: jax.Array,  # [H, K]
) -> jax.Array:
    """V7 ``time_first`` bonus: y += (Σ_k r·k·r_k) · v per head
    (ref: time_mix_v7.wgsl:223-261)."""
    f32 = jnp.float32
    s = jnp.einsum(
        "bthk,bthk,hk->bth", r.astype(f32), k.astype(f32), r_k.astype(f32)
    )
    return s[..., None] * v.astype(f32)
