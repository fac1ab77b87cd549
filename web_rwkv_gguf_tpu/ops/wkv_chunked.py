"""Chunk-parallel (MXU) formulation of the RWKV-7 delta-rule WKV.

The sequential scan does O(T) small VPU updates; this formulation
processes sub-chunks of ``L`` tokens with dense matmuls (MXU) and only
carries state between sub-chunks — the intra-chunk parallel form of the
recurrence (cf. SURVEY.md §2.6 "blockwise formulation of the W-decay
recurrence").

Derivation. The recurrence is ``S_t = A_t S_{t-1} + k_t v_tᵀ`` with
``A_t = diag(w_t) + b_t a_tᵀ`` and ``y_t = S_tᵀ r_t``. Absorb the decays
with the cumulative product ``P_t = w_1∘…∘w_t`` by substituting
``Ŝ_t = diag(P_t)⁻¹ S_t``:

    Ŝ_t = (I + b̂_t â_tᵀ) Ŝ_{t-1} + k̂_t v_tᵀ
    b̂_t = b_t / P_t,  â_t = a_t ∘ P_{t-1},  k̂_t = k_t / P_t,
    r̂_t = r_t ∘ P_t.

With ``u_tᵀ = â_tᵀ Ŝ_{t-1}`` the rank-one updates linearize into a
unit-lower-triangular system over the chunk (the UT transform):

    (I − strict_tril(Â B̂ᵀ)) U = Â Ŝ₀ + strict_tril(Â K̂ᵀ) V
    Y  = R̂ Ŝ₀ + tril(R̂ B̂ᵀ) U + tril(R̂ K̂ᵀ) V
    S_L = diag(P_L) (Ŝ₀ + B̂ᵀ U + K̂ᵀ V)

Everything is a [L,K]×[K,V] or [L,L] matmul. ``1/P_t`` grows as decays
accumulate, so L is kept small (16 by default: w ≥ exp(-e^{-0.5}) ≈ 0.545
⇒ 1/P ≤ 1.7e4, safely inside f32).

Masked (padding) positions are made identity steps: w=1, k̂=b̂=â=0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tri_solve_unit_lower(N: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve (I - N) U = rhs for strictly-lower-triangular N: [.., L, L] by
    blocked Neumann doubling ((I-N)⁻¹ = Π (I + N^{2^i}) terms); exact for
    nilpotent N in ceil(log2 L) squarings."""
    L = N.shape[-1]
    inv = jnp.broadcast_to(jnp.eye(L, dtype=N.dtype), N.shape) + N
    M = N
    steps = max(1, (L - 1).bit_length())
    for _ in range(steps - 1):
        M = jnp.einsum("...ij,...jk->...ik", M, M)
        inv = inv + jnp.einsum("...ij,...jk->...ik", M, inv)
    return jnp.einsum("...ij,...jk->...ik", inv, rhs)


def wkv7_chunked(
    state: jax.Array,  # [B, H, K, V] f32
    r: jax.Array,  # [B, T, H, K]
    w: jax.Array,  # [B, T, H, K] decay factors (already activated)
    k: jax.Array,
    v: jax.Array,  # [B, T, H, V]
    a: jax.Array,
    b: jax.Array,
    mask: jax.Array,  # [B, T] bool
    *,
    chunk: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ops.wkv.wkv7 — identical math, chunk-parallel compute."""
    f32 = jnp.float32
    B, T, H, K = r.shape
    V = state.shape[-1]

    pad = (-T) % chunk
    if pad:
        z = lambda x: jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        r, w, k, v, a, b = map(z, (r, w, k, v, a, b))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    Tp = T + pad
    n_chunks = Tp // chunk

    m = mask[..., None, None].astype(f32)  # [B, Tp, 1, 1]
    r = r.astype(f32) * m
    w = jnp.where(m > 0, w.astype(f32), 1.0)
    k = k.astype(f32) * m
    v = v.astype(f32) * m
    a = a.astype(f32) * m
    b = b.astype(f32) * m

    def to_chunks(x):
        return (
            x.reshape(B, n_chunks, chunk, H, -1)
            .transpose(1, 0, 3, 2, 4)  # [n, B, H, L, D]
        )

    rc, wc, kc, vc, ac, bc = map(to_chunks, (r, w, k, v, a, b))

    eye_mask_strict = jnp.tril(jnp.ones((chunk, chunk), f32), k=-1)
    eye_mask_incl = jnp.tril(jnp.ones((chunk, chunk), f32))

    def step(S, xs):
        rr, ww, kk, vv, aa, bb = xs  # [B, H, L, K/V]
        P = jnp.cumprod(ww, axis=2)  # [B,H,L,K]
        P_prev = P / ww  # P_{t-1} (exact: P_t = P_{t-1}·w_t)
        inv_P = 1.0 / P
        a_h = aa * P_prev
        b_h = bb * inv_P
        k_h = kk * inv_P
        r_h = rr * P

        dot = lambda x, y: jnp.einsum(
            "bhik,bhjk->bhij", x, y, preferred_element_type=f32
        )
        ab = dot(a_h, b_h) * eye_mask_strict  # strict_tril(Â B̂ᵀ)
        ak = dot(a_h, k_h) * eye_mask_strict
        rb = dot(r_h, b_h) * eye_mask_incl
        rk = dot(r_h, k_h) * eye_mask_incl

        mm = lambda x, y: jnp.einsum(
            "bhij,bhjd->bhid", x, y, preferred_element_type=f32
        )
        sm = lambda x, S_: jnp.einsum(
            "bhik,bhkd->bhid", x, S_, preferred_element_type=f32
        )

        rhs = sm(a_h, S) + mm(ak, vv)
        U = _tri_solve_unit_lower(ab, rhs)  # [B,H,L,V]

        Y = sm(r_h, S) + mm(rb, U) + mm(rk, vv)

        S_hat = S + jnp.einsum(
            "bhik,bhid->bhkd", b_h, U, preferred_element_type=f32
        ) + jnp.einsum("bhik,bhid->bhkd", k_h, vv, preferred_element_type=f32)
        S_new = P[:, :, -1, :, None] * S_hat
        return S_new, Y

    S0 = state.astype(f32)
    S_final, Ys = jax.lax.scan(step, S0, (rc, wc, kc, vc, ac, bc))
    y = Ys.transpose(1, 0, 3, 2, 4).reshape(B, Tp, H, V)
    return y[:, :T], S_final


def wkv6_chunked(
    state: jax.Array,  # [B, H, K, V]
    r: jax.Array,  # [B, T, H, K]
    k: jax.Array,
    v: jax.Array,  # [B, T, H, V]
    u: jax.Array,  # [H, K]
    w: jax.Array,  # [B, T, H, K] per-token decay factors
    mask: jax.Array,  # [B, T] bool
    *,
    chunk: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Chunk-parallel V5/V6 WKV (drop-in for ops.wkv.wkv6; V5 = broadcast w).

    The V5/V6 transition is purely diagonal (``S_t = diag(w_t) S_{t-1} +
    k_t v_tᵀ``, ``y_t = r_tᵀ(diag(u) k_t v_tᵀ + S_{t-1})``), so the
    decay-absorbed form needs no triangular solve:

        Y = (r∘u∘k summed) v + strict_tril(R̂' K̂ᵀ) V + R̂' Ŝ₀
        with  r̂'_t = r_t ∘ P_{t-1},  k̂_t = k_t / P_t.
    """
    f32 = jnp.float32
    B, T, H, K = r.shape
    V = state.shape[-1]

    pad = (-T) % chunk
    if pad:
        z = lambda x: jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        r, w, k, v = map(z, (r, w, k, v))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    Tp = T + pad
    n_chunks = Tp // chunk

    m = mask[..., None, None].astype(f32)
    r = r.astype(f32) * m
    w = jnp.where(m > 0, w.astype(f32), 1.0)
    k = k.astype(f32) * m
    v = v.astype(f32) * m
    u = u.astype(f32)

    def to_chunks(x):
        return x.reshape(B, n_chunks, chunk, H, -1).transpose(1, 0, 3, 2, 4)

    rc, wc, kc, vc = map(to_chunks, (r, w, k, v))
    strict = jnp.tril(jnp.ones((chunk, chunk), f32), k=-1)

    def step(S, xs):
        rr, ww, kk, vv = xs  # [B, H, L, K/V]
        P = jnp.cumprod(ww, axis=2)
        P_prev = P / ww
        r_h = rr * P_prev
        k_h = kk / P

        bonus = jnp.einsum(
            "bhlk,hk,bhlk->bhl", rr, u, kk, preferred_element_type=f32
        )[..., None] * vv
        rk = jnp.einsum("bhik,bhjk->bhij", r_h, k_h, preferred_element_type=f32) * strict
        Y = (
            bonus
            + jnp.einsum("bhij,bhjd->bhid", rk, vv, preferred_element_type=f32)
            + jnp.einsum("bhik,bhkd->bhid", r_h, S, preferred_element_type=f32)
        )
        S_hat = S + jnp.einsum("bhik,bhid->bhkd", k_h, vv, preferred_element_type=f32)
        return P[:, :, -1, :, None] * S_hat, Y

    S_final, Ys = jax.lax.scan(step, state.astype(f32), (rc, wc, kc, vc))
    y = Ys.transpose(1, 0, 3, 2, 4).reshape(B, Tp, H, V)
    return y[:, :T], S_final
