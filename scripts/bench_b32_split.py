"""A/B: B=32 decode via the batch-split layer-scan kernel (2x16 slices,
forward.py routing) vs the composed per-op path (unroll_params).

Each 16-lane slice re-reads the stacked weights (2x weight DMA), but
keeps the one-launch layer-pipelined kernel; the composed path reads
weights once but pays per-op dispatch and no cross-layer pipelining.
Timing: fused generator segments, host-fetch synced, slope of per-size
minima (block_until_ready lies over this tunnel — see bench.py).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from web_rwkv_gguf_tpu.models import init_state, prepare_decode
from web_rwkv_gguf_tpu.models.generate import make_generator
from web_rwkv_gguf_tpu.models.loader import unroll_params
from web_rwkv_gguf_tpu.utils.compile_cache import enable_compilation_cache
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
STEPS, REPS, WINDOWS = 64, 4, 3

enable_compilation_cache()
print(f"device: {jax.devices()[0]}  B={B}")
info, params = synthetic_v7_params(quant="q4k")


def bench(params_p, label):
    gen = make_generator(info, steps=STEPS)
    state = init_state(info, B)
    token = jnp.zeros((B, 1), jnp.int32)
    key = jax.random.key(0)
    t0 = time.perf_counter()
    toks, logits, state, key, _ = gen(params_p, state, token, key)
    _ = np.asarray(toks)
    print(f"  [{label}] compile+first: {time.perf_counter()-t0:.2f}s")

    def window(n):
        nonlocal toks, logits, state, key
        t0 = time.perf_counter()
        for _ in range(n):
            toks, logits, state, key, _ = gen(
                params_p, state, toks[:, -1:], key
            )
        _ = np.asarray(toks)
        return time.perf_counter() - t0

    t_small = min(window(REPS) for _ in range(WINDOWS))
    t_big = min(window(3 * REPS) for _ in range(WINDOWS))
    tps = 2 * REPS * STEPS * B / (t_big - t_small)
    us = 1e6 * (t_big - t_small) / (2 * REPS * STEPS)
    print(f"  [{label}] {tps:.1f} tok/s aggregate  ({us:.1f} us/step)")
    return tps


p_mega = prepare_decode(params, info, batch_hint=B)
assert "mega7" in p_mega, "mega prep must cover the split batch"
tps_split = bench(p_mega, f"mega split")
del p_mega
p_unroll = unroll_params(params)
tps_comp = bench(p_unroll, "composed")
print(f"split/composed: {tps_split/tps_comp:.2f}x")
