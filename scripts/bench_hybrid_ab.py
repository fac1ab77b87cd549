"""In-session A/B of the layer-scan gemv strategies at batch B.

Times layer_scan7 in isolation (chained steps, fetch-synced) with the
strategy map forced to all-wide / all-narrow / cost-model hybrid, and
the standalone head gemv at n=B narrow vs wide.

Usage: python scripts/bench_hybrid_ab.py [B] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench import log  # noqa: E402
from web_rwkv_gguf_tpu.models import init_state  # noqa: E402
from web_rwkv_gguf_tpu.models.forward import LN_EPS, GN_EPS, L2_EPS, embed_tokens  # noqa: E402
from web_rwkv_gguf_tpu.ops.pallas import layer7  # noqa: E402
from web_rwkv_gguf_tpu.ops.pallas import config as pcfg  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402


def time_chain(fn, args, reps):
    """Chained-call timing with a host fetch sync; returns us/call via
    the two-length slope (cancels fetch RTT)."""
    def chain(n):
        out = args
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*out[:2])
        _ = np.asarray(out[0])
        return time.perf_counter() - t0

    chain(3)  # warm
    t1 = min(chain(reps) for _ in range(3))
    t2 = min(chain(3 * reps) for _ in range(3))
    return 1e6 * (t2 - t1) / (2 * reps)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    info, params = synthetic_v7_params(quant="q4k")
    mega = layer7.prep_decode7(params, info)
    x0 = embed_tokens(params, jnp.zeros((B, 1), jnp.int32))[:, 0]
    mask = jnp.ones((B,), jnp.float32)

    orig_pick = None

    def run_with(forced):
        import functools

        def fn(x, state):
            xo, s2 = layer7.layer_scan7(mega, state, x, mask, None,
                                        LN_EPS, GN_EPS, L2_EPS)
            return xo, s2

        # force the strategy by monkeypatching config.wide_batch ranges is
        # not enough; patch the map computation via an env knob
        layer7._FORCE_WIDE = forced
        jf = jax.jit(fn)
        out = time_chain(jf, (x0, init_state(info, B)), reps)
        layer7._FORCE_WIDE = None
        return out

    for name, forced in (
        ("hybrid  ", None),
        ("all-wide", {"rkv": True, "wo": True, "fk": True, "fv": True}),
        ("narr+fvw", {"rkv": False, "wo": False, "fk": False, "fv": True}),
        ("all-narr", {"rkv": False, "wo": False, "fk": False, "fv": False}),
    ):
        try:
            us = run_with(forced)
            log(f"B={B} layers {name}: {us:8.1f} us/step ({us/12:.1f}/layer)")
        except Exception as e:
            layer7._FORCE_WIDE = None
            log(f"B={B} layers {name}: FAILED {type(e).__name__} {str(e)[:90]}")

    # standalone head gemv
    from web_rwkv_gguf_tpu.ops.pallas.matmul import quant_matmul
    import web_rwkv_gguf_tpu.ops.pallas.matmul as MM

    head = params["head"]
    m, k = head.dims()
    xh = jnp.asarray(np.random.default_rng(0).normal(size=(B, k)).astype(np.float32))

    for name, nw in (("narrow", True), ("wide  ", False)):
        real = MM._narrow_wins
        MM._narrow_wins = lambda *a, **kw: nw
        jf = jax.jit(lambda x: (quant_matmul(x, head.kind, head.arrays, m, k), 0))
        us = time_chain(lambda x, _s: (jf(x)[0][:, :k], 0), (xh, 0), reps)
        MM._narrow_wins = real
        log(f"B={B} head [{m},{k}] {name}: {us:8.1f} us/call")


if __name__ == "__main__":
    main()
