"""Sparse-FFN feasibility measurement (reference SPARSE_INPUT, VERDICT
r3 #8): can block-granular skipping of zeroed SqReLU activations cut
``ffn.Wv`` weight DMA at decode on TPU?

The reference's macro skips ZERO INPUT ELEMENTS inside its per-thread
dot loop (src/tensor/ops.rs:162-163, used at v7.rs:983-988) — a compute
saving in a scalar/warp model. On TPU the contraction is an MXU pass
over [C, hidden] weight BLOCKS; skipping an element saves nothing —
only skipping a whole K-block's DMA would, and Pallas block DMA is
(8, 128)-granular at minimum. So the question reduces to: what fraction
of 128-wide (or even 8-wide) hidden blocks are ENTIRELY zero after
ReLU^2?

This script measures elementwise and block-granular zero fractions of
the FFN hidden activation over decode steps (captured with the
post_ffn_activate hook), per layer and batch size.

Usage: python scripts/bench_sparse_ffn.py  (CPU is fine - it measures
activation statistics, not kernel time)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType
    from web_rwkv_gguf_tpu.utils.synthetic import make_v7_gguf

    raw = make_v7_gguf(
        n_layer=4, n_emb=256, head_size=64, n_vocab=512, n_hidden=1024,
        quantize=GgmlDType.Q4_K, seed=5,
    )
    info, params = load_model(GgufFile(raw))

    captured = []

    def tap(layer, k):
        captured.append(np.asarray(k))
        return {"k": k}

    hooks = {"post_ffn_activate": tap}
    B = 1
    state = init_state(info, B)
    rng = np.random.default_rng(0)
    for step in range(16):
        tok = jnp.asarray(rng.integers(0, 512, (B, 1)), jnp.int32)
        x, state = forward_chunk(
            info, params, state, tok, jnp.ones((B,), jnp.int32), hooks=hooks
        )

    acts = np.concatenate([a.reshape(-1, a.shape[-1]) for a in captured])
    zero = acts == 0.0
    elem = zero.mean()
    print(f"rows={acts.shape[0]} hidden={acts.shape[1]}")
    print(f"elementwise zero fraction after ReLU^2: {elem:.3f}")
    for blk in (8, 32, 128, 512):
        zb = zero.reshape(zero.shape[0], -1, blk).all(axis=-1)
        print(f"all-zero {blk:4d}-wide blocks: {zb.mean():.6f} "
              f"(P(indep)={elem**blk:.2e})")
    print(
        "conclusion: DMA-skippable fraction == the all-zero block "
        "fraction at the kernel's (>=128-lane) granularity."
    )


if __name__ == "__main__":
    main()
