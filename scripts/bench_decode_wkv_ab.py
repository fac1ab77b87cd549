"""A/B: decode-step WKV as Pallas kernel vs fused XLA single-step.

Times the fused generation loop with ops.pallas.config.decode_wkv_xla
off/on (the flag is read at trace time; make_generator builds a fresh
jit each call). Usage: python scripts/bench_decode_wkv_ab.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from bench import _bench_decode, log  # noqa: E402
from web_rwkv_gguf_tpu.models import unroll_params  # noqa: E402
from web_rwkv_gguf_tpu.ops.pallas import config as pcfg  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402


def main():
    info, params = synthetic_v7_params(quant="q4k")
    params = unroll_params(params)
    for B in (1, 8):
        for flag in (False, True):
            pcfg.decode_wkv_xla = flag
            tps = _bench_decode(info, params, B=B)
            log(f"B={B} decode_wkv_xla={flag}: {tps:8.1f} tok/s "
                f"({1e6 * B / tps:7.1f} us/step)")


if __name__ == "__main__":
    main()
