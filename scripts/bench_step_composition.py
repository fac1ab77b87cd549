"""Same-session decomposition of the fused decode step at batch B:
layer-scan chain alone, head gemv chain alone, full generator step, and
the wide_precise=True cost. The gap between the full step and
(layers + head) is the per-step glue: embed, ln0/ln_out, sampler,
scan-carry traffic, kernel boundaries.

Usage: python scripts/bench_step_composition.py [B]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench import log, _bench_decode  # noqa: E402
from web_rwkv_gguf_tpu.models import init_state, prepare_decode  # noqa: E402
from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, L2_EPS, embed_tokens  # noqa: E402
from web_rwkv_gguf_tpu.ops.pallas import layer7  # noqa: E402
from web_rwkv_gguf_tpu.ops.pallas import config as pcfg  # noqa: E402
from web_rwkv_gguf_tpu.ops.pallas.matmul import quant_matmul  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402


def slope_time(jf, a0, reps=24):
    def chain(n):
        a = a0
        t0 = time.perf_counter()
        for _ in range(n):
            a = jf(*a)
        _ = np.asarray(jax.tree.leaves(a)[0]).ravel()[:4]
        return time.perf_counter() - t0

    chain(3)
    t1 = min(chain(reps) for _ in range(3))
    t2 = min(chain(3 * reps) for _ in range(3))
    return 1e6 * (t2 - t1) / (2 * reps)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    info, params = synthetic_v7_params(quant="q4k")
    mega = layer7.prep_decode7(params, info)
    mask = jnp.ones((B,), jnp.float32)
    x0 = embed_tokens(params, jnp.zeros((B, 1), jnp.int32))[:, 0]

    jf_layers = jax.jit(
        lambda x, st: layer7.layer_scan7(mega, st, x, mask, None,
                                         LN_EPS, GN_EPS, L2_EPS)
    )
    us_layers = slope_time(jf_layers, (x0, init_state(info, B)))
    log(f"B={B} layer-scan chain : {us_layers:7.1f} us/step")

    head = params["head"]
    m, k = head.dims()

    def head_fn(x):
        y = quant_matmul(x, head.kind, head.arrays, m, k)
        return (y[:, :k],)  # feed back a [B, k] slice to keep dependence

    jf_head = jax.jit(head_fn)
    us_head = slope_time(jf_head, (x0,))
    log(f"B={B} head gemv chain  : {us_head:7.1f} us/call")

    pd = prepare_decode(params, info, batch_hint=B)
    tps = _bench_decode(info, pd, B=B)
    us_full = 1e6 * B / tps
    log(f"B={B} full generator   : {us_full:7.1f} us/step "
        f"({tps:.0f} tok/s)")
    log(f"B={B} glue = full - layers - head = "
        f"{us_full - us_layers - us_head:7.1f} us")

    if B > pcfg.wide_batch:
        pcfg.wide_precise = True
        jf_p = jax.jit(
            lambda x, st: layer7.layer_scan7(mega, st, x, mask, None,
                                             LN_EPS, GN_EPS, L2_EPS)
        )
        us_p = slope_time(jf_p, (x0, init_state(info, B)))
        pcfg.wide_precise = False
        log(f"B={B} layer-scan precise: {us_p:7.1f} us/step "
            f"({us_p / us_layers:.2f}x plain)")


if __name__ == "__main__":
    main()
