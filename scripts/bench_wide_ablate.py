"""In-session ablation matrix for the layer-scan kernel at batch 4/8:
wide-vs-narrow gemv strategy and double-bf16 precision terms.
Usage: python scripts/bench_wide_ablate.py
"""
import sys

sys.path.insert(0, ".")

from bench import _bench_decode, log  # noqa: E402
from web_rwkv_gguf_tpu.models.loader import prepare_decode  # noqa: E402
from web_rwkv_gguf_tpu.ops.pallas import config as pcfg  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402


def main():
    info, params = synthetic_v7_params(quant="q4k")
    prepped = prepare_decode(params, info, batch_hint=8)
    assert "mega7" in prepped
    for B in (4, 8):
        for name, wb, prec in (
            ("narrow        ", 8, True),
            ("wide precise  ", 2, True),
            ("wide plain-bf16", 2, False),
        ):
            pcfg.wide_batch = wb
            pcfg.wide_precise = prec
            try:
                tps = _bench_decode(info, prepped, B=B)
                log(f"B={B} {name}: {tps:9.1f} tok/s ({tps/B:7.1f}/lane, "
                    f"{1e6*B/tps:6.1f} us/step)")
            except Exception as e:
                log(f"B={B} {name}: FAILED {type(e).__name__}: {str(e)[:120]}")
    pcfg.wide_batch = 2
    pcfg.wide_precise = True


if __name__ == "__main__":
    main()
