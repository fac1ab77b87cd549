"""In-session A/B: native scale factors (6-bit + super-scales) vs f32
product operands, at B=1 and B=8, through the full fused decode loop.
Usage: python scripts/bench_native_scales.py [B ...]
"""
import sys

sys.path.insert(0, ".")

from bench import _bench_decode, log  # noqa: E402
from web_rwkv_gguf_tpu.models.loader import prepare_decode  # noqa: E402
from web_rwkv_gguf_tpu.models.matrix import Matrix  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params  # noqa: E402

_NATIVE_KEYS = ("sc6", "mn6", "d8", "dm8", "stq", "mnq", "sd", "sdm")


def strip_native(tree):
    if isinstance(tree, Matrix):
        return Matrix(
            tree.kind, tree.shape,
            {k: v for k, v in tree.arrays.items() if k not in _NATIVE_KEYS},
        )
    if isinstance(tree, dict):
        return {k: strip_native(v) for k, v in tree.items()}
    return tree


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 8]
    info, params = synthetic_v7_params(quant="q4k")
    params_f32 = dict(params)
    params_f32["blocks"] = strip_native(params["blocks"])
    params_f32["head"] = strip_native(params["head"])
    for B in batches:
        for name, p in (("native", params), ("f32-ops", params_f32)):
            prepped = prepare_decode(p, info, batch_hint=B)
            tag = "mega" if "mega7" in prepped else "unrolled"
            tps = _bench_decode(info, prepped, B=B)
            log(f"B={B} {name:8s} ({tag}): {tps:9.1f} tok/s "
                f"({tps/B:7.1f}/lane, {1e6*B/tps:6.1f} us/step)")
            del prepped


if __name__ == "__main__":
    main()
