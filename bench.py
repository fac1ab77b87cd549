"""Headline benchmark: RWKV-7 0.1B-config decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference engine's generation throughput on its own headline
config — 168.7 tok/s (RWKV-7 0.1B, SafeTensors F16, Apple M2 Max;
BASELINE.md / reference plan.md:107). Methodology mirrors the reference's
``bench_format`` (warmup then averaged timed runs); weights are synthetic
random (no model files ship with the image) with the exact 0.1B shape
(L=12, C=768, hs=64, V=65536).

Extra measurements (prefill, other configs) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_DECODE_TPS = 168.7


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, logits_head
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    dev = jax.devices()[0]
    log(f"device: {dev}")

    info, params = synthetic_v7_params()
    log(f"model: RWKV-7 L={info.num_layer} C={info.num_emb} H={info.num_head} "
        f"V={info.num_vocab} hidden={info.num_hidden} (bf16 dense)")

    B = 1

    def decode_step(params, state, token):
        x, state = forward_chunk(
            info, params, state, token, jnp.ones((B,), jnp.int32)
        )
        logits = logits_head(params, x[:, 0])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        return nxt, state

    step = jax.jit(decode_step, donate_argnums=(1,))

    state = init_state(info, B)
    token = jnp.zeros((B, 1), jnp.int32)

    # warmup (compile + 8 steps)
    t0 = time.perf_counter()
    token, state = step(params, state, token)
    token.block_until_ready()
    log(f"decode compile+first step: {time.perf_counter()-t0:.2f}s")
    for _ in range(8):
        token, state = step(params, state, token)
    token.block_until_ready()

    n_steps = 256
    t0 = time.perf_counter()
    for _ in range(n_steps):
        token, state = step(params, state, token)
    token.block_until_ready()
    dt = time.perf_counter() - t0
    decode_tps = n_steps * B / dt
    log(f"decode: {decode_tps:.1f} tok/s (batch={B}, {dt*1e3/n_steps:.3f} ms/step)")

    # prefill: 256-token chunk
    T = 256
    prefill = jax.jit(
        lambda p, s, t, l: forward_chunk(info, p, s, t, l), donate_argnums=(1,)
    )
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    state = init_state(info, B)
    x, state = prefill(params, state, tokens, lens)
    x.block_until_ready()
    state = init_state(info, B)
    runs = 5
    t0 = time.perf_counter()
    for _ in range(runs):
        x, state = prefill(params, state, tokens, lens)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    prefill_tps = runs * T * B / dt
    log(f"prefill: {prefill_tps:.0f} tok/s (T={T})")

    print(
        json.dumps(
            {
                "metric": "decode_tok_per_s_rwkv7_0.1b_batch1",
                "value": round(decode_tps, 1),
                "unit": "tok/s",
                "vs_baseline": round(decode_tps / BASELINE_DECODE_TPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
