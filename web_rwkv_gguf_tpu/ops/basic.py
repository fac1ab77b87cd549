"""Elementwise and normalization ops (XLA; fused by the compiler).

Numerics mirror the reference WGSL kernels:
  layer_norm  ref: src/shaders/layer_norm.wgsl (population var + EPS)
  group_norm  ref: src/shaders/layer_norm.wgsl GROUP_NORM specialization
  l2_norm     ref: src/shaders/normalize.wgsl:119-160  x * rsqrt(sum x^2 + eps)
  rms_norm    ref: src/shaders/normalize.wgsl:84-116
  token_shift ref: src/shaders/token_shift.wgsl
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, computed in f32."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def group_norm(
    x: jax.Array, w: jax.Array, b: jax.Array, num_groups: int, eps: float
) -> jax.Array:
    """GroupNorm over the last axis split into ``num_groups`` groups.

    ``w``/``b`` are per-channel (last-axis size of ``x``). Used for the
    per-head ``ln_x`` of V5/V6/V7 with ``num_groups = num_head`` and
    ``eps = 64e-5`` (ref: v7.rs:48, v5.rs:46).
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(orig_shape[:-1] + (g, c // g))
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(orig_shape)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """x * rsqrt(sum(x^2) + eps) over the last axis (per head for kk)."""
    x32 = x.astype(jnp.float32)
    ss = (x32 * x32).sum(axis=-1, keepdims=True)
    return x32 * jax.lax.rsqrt(ss + eps)


def rms_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    ms = (x32 * x32).mean(axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(ms + eps)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def lerp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    """mix(a, b, t) = a + t*(b-a)."""
    return a + t * (b - a)


def squared_relu(x: jax.Array) -> jax.Array:
    p = jnp.maximum(x, 0.0)
    return p * p


def stable_exp(x: jax.Array) -> jax.Array:
    """exp(-exp(x)) — the V5/V6 decay activation (ref: ops.rs:211-213)."""
    return jnp.exp(-jnp.exp(x))


def token_shift(
    x: jax.Array,  # [B, T, C] current (post-LN) activations
    shift_state: jax.Array,  # [B, C] last token of the previous chunk
    mix: jax.Array,  # [C] or [B, T, C] mix factor
    *,
    reversed_mix: bool,
) -> jax.Array:
    """Per-token lerp with the previous token (cross-chunk via shift_state).

    ``reversed_mix=False`` (V4/V5): out = mix(x_prev, x, factor)
    ``reversed_mix=True``  (V6/V7): out = mix(x, x_prev, factor)
    Ref: src/shaders/token_shift.wgsl:100-116.
    """
    x_prev = jnp.concatenate([shift_state[:, None, :], x[:, :-1, :]], axis=1)
    if reversed_mix:
        return lerp(x, x_prev, mix)
    return lerp(x_prev, x, mix)


def token_shift_multi(
    x: jax.Array,  # [B, T, C]
    shift_state: jax.Array,  # [B, C]
    mixes: jax.Array,  # [S, C] stacked mix factors
    *,
    reversed_mix: bool = True,
) -> jax.Array:
    """All ``S`` token shifts of the same input in one fused lerp:
    returns ``[B, T, S, C]`` (slice the S axis for the individual shifted
    copies). Collapses V7's six per-layer ``token_shift`` ops into one
    (ref: token_shift.wgsl called 6x per layer, v7.rs:762-800)."""
    x_prev = jnp.concatenate([shift_state[:, None, :], x[:, :-1, :]], axis=1)
    xe, pe = x[:, :, None, :], x_prev[:, :, None, :]
    m = mixes[None, None]
    if reversed_mix:
        return lerp(xe, pe, m)
    return lerp(pe, xe, m)


def update_shift_state(
    x: jax.Array,  # [B, T, C]
    lengths: jax.Array,  # [B] number of valid tokens this chunk
    shift_state: jax.Array,  # [B, C] previous
) -> jax.Array:
    """New shift state = x at the last *valid* token; unchanged if len==0."""
    idx = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
    gathered = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0, :]
    return jnp.where((lengths > 0)[:, None], gathered, shift_state)
