"""A/B the V6 fused layer-scan decode vs the composed path on the TPU.

Usage: python scripts/bench_v6_decode.py [B]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import init_state, prepare_decode
    from web_rwkv_gguf_tpu.models.generate import make_generator
    from web_rwkv_gguf_tpu.models.loader import unroll_params
    from web_rwkv_gguf_tpu.utils.compile_cache import enable_compilation_cache
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v56_params

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}  B={B}", file=sys.stderr)
    info, params = synthetic_v56_params(version=6, quant="q4k")
    print(f"model: v6 L={info.num_layer} C={info.num_emb} "
          f"hidden={info.num_hidden} V={info.num_vocab}", file=sys.stderr)

    def bench(params_p, label, steps=64, reps=8, windows=3):
        gen = make_generator(info, steps=steps)
        state = init_state(info, B)
        token = jnp.zeros((B, 1), jnp.int32)
        key = jax.random.key(0)
        t0 = time.perf_counter()
        toks, logits, state, key, _ = gen(params_p, state, token, key)
        _ = np.asarray(toks)
        print(f"  [{label}] compile+first: {time.perf_counter()-t0:.2f}s",
              file=sys.stderr)

        def window(n):
            nonlocal toks, logits, state, key
            t0 = time.perf_counter()
            for _ in range(n):
                toks, logits, state, key, _ = gen(
                    params_p, state, toks[:, -1:], key)
            _ = np.asarray(toks)
            return time.perf_counter() - t0

        t_small = min(window(reps) for _ in range(windows))
        t_big = min(window(3 * reps) for _ in range(windows))
        tps = 2 * reps * steps * B / (t_big - t_small)
        print(f"  [{label}] {tps:.1f} tok/s", file=sys.stderr)
        return tps

    p_fused = prepare_decode(params, info, batch_hint=B)
    assert "mega56" in p_fused, "fused prep failed"
    fused = bench(p_fused, "fused")
    del p_fused
    p_comp = unroll_params(params)
    comp = bench(p_comp, "composed")
    print(f"RESULT B={B}: fused {fused:.1f} vs composed {comp:.1f} "
          f"({fused/comp:.2f}x)")


if __name__ == "__main__":
    main()
