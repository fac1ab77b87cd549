"""Ablation breakdown of the fused decode step at B=8.

Monkeypatches individual ops to near-no-ops and re-times the fused
generation loop; the delta against base attributes the cost. (The
tunnel breaks jax.profiler traces, so ablation is the profiler here.)

Usage: python scripts/bench_decode_ablate.py [B]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import _bench_decode, log  # noqa: E402
from web_rwkv_gguf_tpu.models import unroll_params  # noqa: E402
from web_rwkv_gguf_tpu.ops import basic as B_ops  # noqa: E402
from web_rwkv_gguf_tpu.ops import wkv as W_ops  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    info, params = synthetic_v7_params(quant="q4k")
    params = unroll_params(params)

    def run(tag):
        tps = _bench_decode(info, params, B=B)
        log(f"{tag:24s} {tps:8.1f} tok/s  ({1e6 * B / tps:7.1f} us/step)")
        return 1e6 * B / tps

    base = run("base")

    orig = {}

    def patch(mod, name, fn):
        orig[(mod, name)] = getattr(mod, name)
        setattr(mod, name, fn)

    def restore():
        for (mod, name), fn in orig.items():
            setattr(mod, name, fn)
        orig.clear()

    # WKV step -> passthrough (state untouched, y from v only)
    def wkv7_noop(state, r, w, k, v, a, b, mask):
        return v.astype(jnp.float32), state

    patch(W_ops, "wkv7_step", wkv7_noop)
    run("wkv7_step=noop")
    restore()

    # token_shift -> identity (6 att + 1 ffn calls per layer)
    patch(B_ops, "token_shift", lambda x, sh, mix, reversed_mix: x)
    run("token_shift=id")
    restore()

    # norms -> identity
    patch(B_ops, "group_norm", lambda x, w, b, H, eps: x)
    patch(B_ops, "l2_normalize", lambda x, eps: x)
    run("gn+l2=id")
    restore()

    # shift-state bookkeeping -> passthrough
    patch(B_ops, "update_shift_state", lambda x, lengths, prev: prev)
    run("shift_state=id")
    restore()

    # bonus term
    patch(W_ops, "wkv7_bonus",
          lambda r, k, v, r_k: jnp.zeros(v.shape, jnp.float32))
    run("bonus=0")
    restore()

    log(f"base {base:.1f} us/step; deltas above are each op family's cost")


if __name__ == "__main__":
    main()
