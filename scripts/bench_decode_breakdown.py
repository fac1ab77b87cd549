"""Decode-step cost breakdown via config ablations (fused loop).

Times the fused generation loop at varying depth / vocab / batch and
solves for per-layer and head costs — a tunnel-safe substitute for a
profiler (jax.profiler traces don't survive this environment's device
link). Usage: python scripts/bench_decode_breakdown.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from bench import _bench_decode, log  # noqa: E402
from web_rwkv_gguf_tpu.models import prepare_decode  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402


def step_us(tps, B):
    return 1e6 * B / tps


def main():
    results = {}
    for name, kw, B in [
        ("L12 V65536 B1", dict(), 1),
        ("L6  V65536 B1", dict(n_layer=6), 1),
        ("L12 V8192  B1", dict(n_vocab=8192), 1),
        ("L12 V65536 B8", dict(), 8),
        ("L6  V65536 B8", dict(n_layer=6), 8),
    ]:
        info, params = synthetic_v7_params(quant="q4k", **kw)
        params = prepare_decode(params, info)
        tps = _bench_decode(info, params, B=B)
        us = step_us(tps, B)
        results[name] = us
        log(f"{name}: {tps:8.1f} tok/s  -> {us:7.1f} us/step")
        del params

    l12, l6 = results["L12 V65536 B1"], results["L6  V65536 B1"]
    per_layer = (l12 - l6) / 6
    head = results["L12 V65536 B1"] - results["L12 V8192  B1"]
    log(f"\nB=1: per-layer {per_layer:.1f} us  "
        f"(12 layers = {12*per_layer:.0f} us), "
        f"head(65536 vs 8192) ~ {head:.1f} us, "
        f"fixed ~ {l12 - 12*per_layer:.1f} us")
    l12b, l6b = results["L12 V65536 B8"], results["L6  V65536 B8"]
    pl8 = (l12b - l6b) / 6
    log(f"B=8: per-layer {pl8:.1f} us  (12 layers = {12*pl8:.0f} us), "
        f"fixed ~ {l12b - 12*pl8:.1f} us")


if __name__ == "__main__":
    main()
