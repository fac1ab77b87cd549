"""On-device generation: N decode steps fused into one compiled program.

Sampling (greedy / temperature / top-k) runs on-chip with ``jax.random``,
so the host only dispatches once per N tokens — this removes per-step
dispatch latency entirely (one launch per segment instead of per token),
which dominates decode on dispatch-latency-heavy links. The reference's
equivalent knob was its speculative job pipeline (ref:
src/runtime/mod.rs:119-209); on TPU the whole loop compiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .forward import forward_chunk, logits_head
from .info import ModelInfo


def make_generator(
    info: ModelInfo,
    *,
    steps: int,
    temperature: float = 0.0,
    top_k: int = 0,
    rescale: int | None = None,
):
    """Build a jitted ``(params, state, token[B,1], key) -> (tokens[B,steps],
    logits[B,V], state, key)`` that greedily/stochastically decodes
    ``steps`` tokens on-device."""

    def sample(logits, key):
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        scaled = logits / temperature
        if top_k > 0:
            kth = jax.lax.top_k(scaled, top_k)[0][..., -1:]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
        return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)

    def run(params, state, token, key):
        B = token.shape[0]
        ones = jnp.ones((B,), jnp.int32)
        # per-layer list carry: the unrolled forward then reads/writes each
        # layer's state directly instead of slicing/re-stacking the whole
        # [L, ...] pytree every step (restacked once per segment). Only a
        # win at B=1 (+8%); at B=8 the many-array carry measured 29%
        # SLOWER than the stacked pytree (in-session A/B, 2026-08)
        unstack = isinstance(params.get("blocks"), list) and B == 1
        L = info.num_layer
        if unstack:
            state = [jax.tree.map(lambda a: a[i], state) for i in range(L)]
        dummy_logits = jnp.zeros((B, info.num_vocab), jnp.float32)

        def body(carry, _):
            state, token, key, _ = carry
            x, state = forward_chunk(
                info, params, state, token, ones, rescale=rescale
            )
            logits = logits_head(params, x[:, 0])
            if temperature > 0.0:
                key, sub = jax.random.split(key)
            else:
                sub = key  # greedy: sample() ignores the key
            nxt = sample(logits, sub)[:, None]
            return (state, nxt, key, logits), nxt[:, 0]

        (state, token, key, logits), toks = jax.lax.scan(
            body, (state, token, key, dummy_logits), None, length=steps
        )
        if unstack:
            state = jax.tree.map(lambda *xs: jnp.stack(xs), *state)
        return toks.T, logits, state, key

    return jax.jit(run, donate_argnums=(1,))
