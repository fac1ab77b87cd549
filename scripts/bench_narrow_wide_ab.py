"""In-session A/B: layer-scan in-kernel gemv strategy (narrow vs wide)
and dense-resident vs quantized fused decode, across batch sizes.

Round-5 findings this script reproduces (2026-08-21 session):
  * the rebuilt narrow path (selection-dot group expansion) beats wide
    through B=8 (b4 ~9.4-10.0k vs 6.7k, b8 ~12.2-12.6k vs 10.4k) and
    stays FMA-exact; wide retakes B=16 (13.4k vs 12.8k exact class)
    -> config.scan_wide_batch default 8.
  * dense-fused beats quantized-fused from B=8 (15.8k vs 12.2k; b16
    22.9k vs 16.5k plain) but loses below (b1 2.6k vs 5.0k, b4 tie)
    -> engine.DECODE_DENSE_MIN_B = 8.

Only same-session comparisons are meaningful (tunnel throughput varies
several-fold between sessions).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from web_rwkv_gguf_tpu.models import prepare_decode  # noqa: E402
from web_rwkv_gguf_tpu.ops.pallas import config as pcfg  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402


def run(B_list=(1, 2, 4, 8, 16)):
    info, qp = synthetic_v7_params(quant="q4k")
    qp = prepare_decode(qp, info, batch_hint=1)
    info, dp = synthetic_v7_params()
    dp = prepare_decode(dp, info, batch_hint=1)
    base = pcfg.scan_wide_batch
    for B in B_list:
        rows = []
        for label, wb in (("narrow", max(B, base)), ("wide", 0)):
            if label == "wide" and B == 1:
                continue
            pcfg.scan_wide_batch = wb
            t = bench._bench_decode(info, qp, B=B, steps=32, reps=4,
                                    windows=2)
            rows.append(f"q4k-{label} {t:.1f}")
        pcfg.scan_wide_batch = base
        d = bench._bench_decode(info, dp, B=B, steps=32, reps=4, windows=2)
        rows.append(f"dense {d:.1f}")
        print(f"B={B}: " + " | ".join(rows) + " tok/s", flush=True)


if __name__ == "__main__":
    run()
