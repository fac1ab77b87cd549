"""In-session prefill A/B: slab kernel with VPU lane-concat scale
expansion vs the MXU expansion dot, against the dense-bf16 reference.

Usage: python scripts/bench_prefill_ab.py [T]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench import log  # noqa: E402
from web_rwkv_gguf_tpu.models import forward_chunk, init_state  # noqa: E402
from web_rwkv_gguf_tpu.ops.pallas import config as pcfg  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402


def time_prefill(info, params, T, reps=8):
    lens = jnp.asarray([T], jnp.int32)
    toks = jnp.asarray(np.arange(T, dtype=np.int32)[None, :] % info.num_vocab)

    fwd = jax.jit(lambda p, s, t: forward_chunk(info, p, s, t, lens))

    def chain(n):
        s = init_state(info, 1)
        x = None
        t0 = time.perf_counter()
        for _ in range(n):
            x, s = fwd(params, s, toks)
        _ = np.asarray(x[:, -1])
        return time.perf_counter() - t0

    chain(2)
    t1 = min(chain(reps) for _ in range(3))
    t2 = min(chain(3 * reps) for _ in range(3))
    us = 1e6 * (t2 - t1) / (2 * reps)
    return T / (us / 1e6)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    info, params = synthetic_v7_params(quant="q4k")

    for thr in (0, 1 << 30):  # 0 = always VPU concat, big = always MXU dot
        pcfg.slab_vpu_expand_min_n = thr
        tps = time_prefill(info, params, T)
        which = "vpu" if thr == 0 else "mxu"
        log(f"prefill T={T} Q4_K expand={which}: {tps:9.0f} tok/s")
    pcfg.slab_vpu_expand_min_n = 512

    info_d, params_d = synthetic_v7_params(quant=None)
    tps_d = time_prefill(info_d, params_d, T)
    log(f"prefill T={T} dense bf16:                  {tps_d:9.0f} tok/s")


if __name__ == "__main__":
    main()
