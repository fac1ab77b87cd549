"""B=16 decode A/B: quantized (precise), quantized (plain-bf16 rounding),
and DENSE bf16 weights — decides the decode_dense auto policy."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import init_state, prepare_decode
    from web_rwkv_gguf_tpu.models.generate import make_generator
    from web_rwkv_gguf_tpu.models.loader import densify_matrices
    from web_rwkv_gguf_tpu.ops.pallas import config as pcfg
    from web_rwkv_gguf_tpu.utils.compile_cache import enable_compilation_cache
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    enable_compilation_cache()
    B = 16
    print(f"device: {jax.devices()[0]}  B={B}", file=sys.stderr)
    info, params = synthetic_v7_params(quant="q4k")

    def bench(params_p, label, steps=64, reps=6, windows=3):
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

    p_q = prepare_decode(params, info, batch_hint=B)
    q_precise = bench(p_q, "quant precise")
    pcfg.wide_precise = False
    q_fast = bench(p_q, "quant plain-bf16")
    pcfg.wide_precise = True
    del p_q
    p_d = prepare_decode(densify_matrices(params), info, batch_hint=B)
    dense = bench(p_d, "dense bf16")
    print(f"RESULT B=16: quant-precise {q_precise:.0f}  "
          f"quant-fast {q_fast:.0f}  dense {dense:.0f}")


if __name__ == "__main__":
    main()
