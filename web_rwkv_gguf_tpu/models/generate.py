"""On-device generation: N decode steps fused into one compiled program.

Sampling (greedy / temperature / top-k / nucleus) runs on-chip with
``jax.random``, so the host only dispatches once per N tokens — this
removes per-step dispatch latency entirely (one launch per segment
instead of per token), which dominates decode on dispatch-latency-heavy
links. The reference's equivalent knob was its speculative job pipeline
(ref: src/runtime/mod.rs:119-209); on TPU the whole loop compiles.

Per-lane stop tokens: a lane that samples a stop id freezes — its mask
lane goes to 0 so the recurrent state stops advancing (the same masking
path padding uses), and it keeps re-emitting the stop id; the host trims
the surplus. The final ``done`` flags let callers cut a segment loop
short once every lane has stopped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .forward import forward_chunk, logits_head
from .info import ModelInfo


def make_sampler(
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 0.0,
    top_p_candidates: int = 128,
):
    """Build an on-device ``(logits[B, V], key) -> token[B]`` sampler.

    ``top_p`` in (0, 1) enables nucleus sampling (ref:
    examples/chat.rs:158-194 — keep every token whose *preceding*
    cumulative probability is <= top_p, inclusive of the crossing
    token). The nucleus is computed over the ``top_p_candidates``
    highest logits (a full 65k-vocab sort per step is not worth the
    MXU stall; 128 candidates cover any practical nucleus — lift the
    cap if you run temperature >> 1)."""

    def sample(logits, key):
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if 0.0 < top_p < 1.0:
            cand = top_p_candidates
            if top_k > 0:
                cand = min(cand, top_k)
            cand = min(cand, logits.shape[-1])  # tiny-vocab models
            # nucleus membership is decided at temperature 1 and the
            # temperature reshapes probabilities only WITHIN the kept
            # set — utils/sampling.NucleusSampler and the reference
            # chat example agree on this order
            vals, idx = jax.lax.top_k(logits, cand)  # [B, cand] desc
            probs = jax.nn.softmax(vals, axis=-1)
            prev = jnp.cumsum(probs, axis=-1) - probs  # preceding mass
            scaled = jnp.where(prev <= top_p, vals / temperature, -jnp.inf)
            choice = jax.random.categorical(key, scaled, axis=-1)
            return jnp.take_along_axis(idx, choice[:, None], axis=-1)[
                :, 0
            ].astype(jnp.int32)
        scaled = logits / temperature
        if 0 < top_k < logits.shape[-1]:
            kth = jax.lax.top_k(scaled, top_k)[0][..., -1:]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
        return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)

    return sample


def make_generator(
    info: ModelInfo,
    *,
    steps: int,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 0.0,
    rescale: int | None = None,
    stop_ids: tuple[int, ...] = (),
):
    """Build a jitted ``(params, state, token[B,1], key) ->
    (tokens[B,steps], logits[B,V], state, key, done[B])`` that decodes
    ``steps`` tokens on-device. Lanes that emit a token in ``stop_ids``
    freeze (state preserved, stop id re-emitted); ``done`` reports which
    lanes have stopped by the end of the segment."""

    sample = make_sampler(temperature, top_k, top_p)

    def run(params, state, token, key):
        B = token.shape[0]
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
        done0 = jnp.zeros((B,), jnp.bool_)
        if stop_ids:
            stop_arr = jnp.asarray(stop_ids, jnp.int32)
            done0 = jnp.any(token[:, 0, None] == stop_arr[None], axis=-1)

        def body(carry, _):
            state, token, key, _, done = carry
            # done lanes run with length 0: the padding mask freezes their
            # recurrent state exactly as padded prefill rows do
            lens = jnp.where(done, 0, 1).astype(jnp.int32)
            x, state = forward_chunk(
                info, params, state, token, lens, rescale=rescale
            )
            logits = logits_head(params, x[:, 0])
            if temperature > 0.0:
                key, sub = jax.random.split(key)
            else:
                sub = key  # greedy: sample() ignores the key
            nxt = sample(logits, sub)
            nxt = jnp.where(done, token[:, 0], nxt)
            if stop_ids:
                done = done | jnp.any(nxt[:, None] == stop_arr[None], axis=-1)
            return (state, nxt[:, None], key, logits, done), nxt

        (state, token, key, logits, done), toks = jax.lax.scan(
            body, (state, token, key, dummy_logits, done0), None, length=steps
        )
        if unstack:
            state = jax.tree.map(lambda *xs: jnp.stack(xs), *state)
        return toks.T, logits, state, key, done

    return jax.jit(run, donate_argnums=(1,))
