"""In-session A/B: batched decode via the layer-scan mega kernel (wide
gemv) vs the unrolled per-layer path. Usage:
    python scripts/bench_batch_decode.py [B ...]
"""
import sys

sys.path.insert(0, ".")

from bench import _bench_decode, log  # noqa: E402
from web_rwkv_gguf_tpu.models.loader import prepare_decode, unroll_params  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8]
    info, params = synthetic_v7_params(quant="q4k")
    for B in batches:
        mega = prepare_decode(params, info, batch_hint=B)
        assert "mega7" in mega, "mega kernel not selected"
        tps_m = _bench_decode(info, mega, B=B)
        log(f"B={B} mega    : {tps_m:9.1f} tok/s  ({tps_m/B:7.1f}/lane, "
            f"{1e6*B/tps_m:6.1f} us/step)")
        del mega
        unr = unroll_params(params)
        tps_u = _bench_decode(info, unr, B=B)
        log(f"B={B} unrolled: {tps_u:9.1f} tok/s  ({tps_u/B:7.1f}/lane, "
            f"{1e6*B/tps_u:6.1f} us/step)  mega/unrolled = {tps_m/tps_u:.2f}x")
        del unr


if __name__ == "__main__":
    main()
