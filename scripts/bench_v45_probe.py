"""One-off TPU probe: V4/V5 fused layer-scan decode — Mosaic compile
check + in-session tok/s (run after adding the version-4 kernel branch)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from web_rwkv_gguf_tpu.models import prepare_decode  # noqa: E402
from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v56_params  # noqa: E402


def main():
    for ver in (4, 5):
        info, params = synthetic_v56_params(version=ver, quant="q4k")
        params = prepare_decode(params, info, batch_hint=1)
        assert "mega56" in params, f"v{ver} prep failed"
        tps = bench._bench_decode(info, params, B=1, steps=32, reps=4,
                                  windows=2, extra_key=f"v{ver}_q4k_b1")
        print(f"v{ver} Q4_K b1 fused decode: {tps:.1f} tok/s "
              f"({bench.EXTRAS[f'v{ver}_q4k_b1']})", flush=True)
        tps8 = bench._bench_decode(info, params, B=8, steps=32, reps=4,
                                   windows=2, extra_key=f"v{ver}_q4k_b8")
        print(f"v{ver} Q4_K b8 fused decode: {tps8:.1f} tok/s", flush=True)
        del params


if __name__ == "__main__":
    main()
