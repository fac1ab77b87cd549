"""Synthetic random-weight model builders (GGUF layouts matching the
reference converter's output) — used by tests, benchmarks, and the
multi-chip dry run."""

from __future__ import annotations

import numpy as np

from ..gguf import GgufWriter
from ..quant.ggml import GgmlDType


def make_v7_gguf(
    *,
    n_layer=2,
    n_emb=32,
    head_size=8,
    n_vocab=48,
    n_hidden=None,
    lora_w=8,
    lora_a=8,
    lora_g=8,
    lora_v=8,
    seed=0,
    quantize=None,
    fused_lerp=False,
    dtype=np.float32,
):
    n_hidden = n_hidden or 4 * n_emb
    rng = np.random.default_rng(seed)
    w = GgufWriter()
    w.add_metadata("general.architecture", "rwkv7")
    w.add_metadata("rwkv7.wkv.head_size", head_size)

    def r(*shape, scale=0.5):
        return (rng.normal(size=shape) * scale).astype(dtype)

    def add(name, arr, q=False):
        w.add_tensor(name, arr, quantize=quantize if q else None)

    add("token_embd.weight", r(n_vocab, n_emb))
    add("token_embd_norm.weight", 1.0 + r(n_emb, scale=0.1))
    add("token_embd_norm.bias", r(n_emb, scale=0.1))
    add("output_norm.weight", 1.0 + r(n_emb, scale=0.1))
    add("output_norm.bias", r(n_emb, scale=0.1))
    add("output.weight", r(n_vocab, n_emb), q=True)

    for i in range(n_layer):
        p = f"blk.{i}"
        add(f"{p}.attn_norm.weight", 1.0 + r(n_emb, scale=0.1))
        add(f"{p}.attn_norm.bias", r(n_emb, scale=0.1))
        add(f"{p}.attn_norm_2.weight", 1.0 + r(n_emb, scale=0.1))
        add(f"{p}.attn_norm_2.bias", r(n_emb, scale=0.1))

        if fused_lerp:
            fused = r(6, n_emb)
            w.add_raw_tensor(
                f"{p}.time_mix_lerp_fused.weight",
                (n_emb, 1, 1, 6),
                GgmlDType.F32 if dtype == np.float32 else GgmlDType.F16,
                fused.tobytes(),
            )
        else:
            for s in "rwkvag":
                add(f"{p}.att_x_{s}", r(n_emb))

        add(f"{p}.time_mix_w0.weight", r(n_emb))
        add(f"{p}.time_mix_w1.weight", r(lora_w, n_emb))
        add(f"{p}.time_mix_w2.weight", r(n_emb, lora_w))
        add(f"{p}.time_mix_a0.weight", r(n_emb))
        add(f"{p}.time_mix_a1.weight", r(lora_a, n_emb))
        add(f"{p}.time_mix_a2.weight", r(n_emb, lora_a))
        add(f"{p}.time_mix_g1.weight", r(lora_g, n_emb))
        add(f"{p}.time_mix_g2.weight", r(n_emb, lora_g))
        if i > 0:
            add(f"{p}.time_mix_v0.weight", r(n_emb))
            add(f"{p}.time_mix_v1.weight", r(lora_v, n_emb))
            add(f"{p}.time_mix_v2.weight", r(n_emb, lora_v))
        add(f"{p}.time_mix_r_k.weight", r(n_emb))
        add(f"{p}.time_mix_k_k.weight", r(n_emb))
        add(f"{p}.time_mix_k_a.weight", r(n_emb))
        add(f"{p}.time_mix_ln.weight", 1.0 + r(n_emb, scale=0.1))
        add(f"{p}.time_mix_ln.bias", r(n_emb, scale=0.1))

        add(f"{p}.time_mix_key.weight", r(n_emb, n_emb), q=True)
        add(f"{p}.time_mix_value.weight", r(n_emb, n_emb), q=True)
        add(f"{p}.time_mix_receptance.weight", r(n_emb, n_emb), q=True)
        add(f"{p}.time_mix_output.weight", r(n_emb, n_emb), q=True)

        add(f"{p}.channel_mix_lerp_k.weight", r(n_emb))
        add(f"{p}.channel_mix_key.weight", r(n_hidden, n_emb), q=True)
        add(f"{p}.channel_mix_value.weight", r(n_emb, n_hidden), q=True)
    return w.tobytes()


def make_v4_gguf(*, n_layer=2, n_emb=16, n_vocab=32, n_hidden=None, seed=0,
                 quantize=None):
    n_hidden = n_hidden or 4 * n_emb
    rng = np.random.default_rng(seed)
    w = GgufWriter()
    w.add_metadata("general.architecture", "rwkv")

    def r(*shape, scale=0.5):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    def mat(name, arr):  # layer matrices follow the requested format
        w.add_tensor(name, arr, quantize=quantize)

    w.add_tensor("token_embd.weight", r(n_vocab, n_emb))
    w.add_tensor("token_embd_norm.weight", 1.0 + r(n_emb, scale=0.1))
    w.add_tensor("token_embd_norm.bias", r(n_emb, scale=0.1))
    w.add_tensor("output_norm.weight", 1.0 + r(n_emb, scale=0.1))
    w.add_tensor("output_norm.bias", r(n_emb, scale=0.1))
    mat("output.weight", r(n_vocab, n_emb))
    for i in range(n_layer):
        p = f"blk.{i}"
        w.add_tensor(f"{p}.attn_norm.weight", 1.0 + r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_norm.bias", r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.ffn_norm.weight", 1.0 + r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.ffn_norm.bias", r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_time_decay", r(n_emb))
        w.add_tensor(f"{p}.attn_time_first", r(n_emb))
        for s in "kvr":
            w.add_tensor(f"{p}.attn_time_mix_{s}", rng.uniform(0, 1, n_emb).astype(np.float32))
        mat(f"{p}.attn_k.weight", r(n_emb, n_emb))
        mat(f"{p}.attn_v.weight", r(n_emb, n_emb))
        mat(f"{p}.attn_r.weight", r(n_emb, n_emb))
        mat(f"{p}.attn_output.weight", r(n_emb, n_emb))
        w.add_tensor(f"{p}.ffn_time_mix_k", rng.uniform(0, 1, n_emb).astype(np.float32))
        w.add_tensor(f"{p}.ffn_time_mix_r", rng.uniform(0, 1, n_emb).astype(np.float32))
        mat(f"{p}.ffn_k.weight", r(n_hidden, n_emb))
        mat(f"{p}.ffn_v.weight", r(n_emb, n_hidden))
        mat(f"{p}.ffn_r.weight", r(n_emb, n_emb))
    return w.tobytes()


def make_v5_gguf(*, n_layer=2, n_emb=16, head_size=4, n_vocab=32, n_hidden=None, seed=0):
    n_hidden = n_hidden or 4 * n_emb
    n_head = n_emb // head_size
    rng = np.random.default_rng(seed)
    w = GgufWriter()

    def r(*shape, scale=0.5):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    w.add_tensor("token_embd.weight", r(n_vocab, n_emb))
    w.add_tensor("token_embd_norm.weight", 1.0 + r(n_emb, scale=0.1))
    w.add_tensor("token_embd_norm.bias", r(n_emb, scale=0.1))
    w.add_tensor("output_norm.weight", 1.0 + r(n_emb, scale=0.1))
    w.add_tensor("output_norm.bias", r(n_emb, scale=0.1))
    w.add_tensor("output.weight", r(n_vocab, n_emb))
    for i in range(n_layer):
        p = f"blk.{i}"
        w.add_tensor(f"{p}.attn_norm.weight", 1.0 + r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_norm.bias", r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.ffn_norm.weight", 1.0 + r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.ffn_norm.bias", r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_time_decay", r(n_head, head_size))
        w.add_tensor(f"{p}.attn_time_first", r(n_head, head_size))
        for s in "kvrg":
            w.add_tensor(f"{p}.attn_time_mix_{s}", rng.uniform(0, 1, n_emb).astype(np.float32))
        w.add_tensor(f"{p}.attn_k.weight", r(n_emb, n_emb))
        w.add_tensor(f"{p}.attn_v.weight", r(n_emb, n_emb))
        w.add_tensor(f"{p}.attn_r.weight", r(n_emb, n_emb))
        w.add_tensor(f"{p}.attn_g.weight", r(n_emb, n_emb))
        w.add_tensor(f"{p}.attn_output.weight", r(n_emb, n_emb))
        w.add_tensor(f"{p}.attn_ln_x.weight", 1.0 + r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_ln_x.bias", r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.ffn_time_mix_k", rng.uniform(0, 1, n_emb).astype(np.float32))
        w.add_tensor(f"{p}.ffn_time_mix_r", rng.uniform(0, 1, n_emb).astype(np.float32))
        w.add_tensor(f"{p}.ffn_k.weight", r(n_hidden, n_emb))
        w.add_tensor(f"{p}.ffn_v.weight", r(n_emb, n_hidden))
        w.add_tensor(f"{p}.ffn_r.weight", r(n_emb, n_emb))
    return w.tobytes()


def make_v6_gguf(
    *, n_layer=2, n_emb=16, head_size=4, n_vocab=32, n_hidden=None, rank_tm=4,
    rank_td=8, seed=0, quantize=None,
):
    n_hidden = n_hidden or 4 * n_emb
    n_head = n_emb // head_size
    rng = np.random.default_rng(seed)
    w = GgufWriter()
    w.add_metadata("rwkv6.wkv.head_size", head_size)

    def r(*shape, scale=0.5):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    def addq(name, arr):
        w.add_tensor(name, arr, quantize=quantize)

    w.add_tensor("token_embd.weight", r(n_vocab, n_emb))
    w.add_tensor("token_embd_norm.weight", 1.0 + r(n_emb, scale=0.1))
    w.add_tensor("token_embd_norm.bias", r(n_emb, scale=0.1))
    w.add_tensor("output_norm.weight", 1.0 + r(n_emb, scale=0.1))
    w.add_tensor("output_norm.bias", r(n_emb, scale=0.1))
    addq("output.weight", r(n_vocab, n_emb))
    for i in range(n_layer):
        p = f"blk.{i}"
        w.add_tensor(f"{p}.attn_norm.weight", 1.0 + r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_norm.bias", r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.ffn_norm.weight", 1.0 + r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.ffn_norm.bias", r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_time_decay", r(n_head, head_size))
        w.add_tensor(f"{p}.attn_time_first", r(n_head, head_size))
        w.add_tensor(f"{p}.attn_time_mix_x", rng.uniform(0, 1, n_emb).astype(np.float32))
        for s in "wkvrg":
            w.add_tensor(f"{p}.attn_time_mix_{s}", rng.uniform(0, 1, n_emb).astype(np.float32))
        w.add_tensor(f"{p}.attn_time_mix_w1", r(5 * rank_tm, n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_time_mix_w2", r(5, n_emb, rank_tm, scale=0.1))
        w.add_tensor(f"{p}.attn_time_decay_w1", r(rank_td, n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_time_decay_w2", r(n_emb, rank_td, scale=0.1))
        addq(f"{p}.attn_k.weight", r(n_emb, n_emb))
        addq(f"{p}.attn_v.weight", r(n_emb, n_emb))
        addq(f"{p}.attn_r.weight", r(n_emb, n_emb))
        addq(f"{p}.attn_g.weight", r(n_emb, n_emb))
        addq(f"{p}.attn_output.weight", r(n_emb, n_emb))
        w.add_tensor(f"{p}.attn_ln_x.weight", 1.0 + r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.attn_ln_x.bias", r(n_emb, scale=0.1))
        w.add_tensor(f"{p}.ffn_time_mix_k", rng.uniform(0, 1, n_emb).astype(np.float32))
        w.add_tensor(f"{p}.ffn_time_mix_r", rng.uniform(0, 1, n_emb).astype(np.float32))
        addq(f"{p}.ffn_k.weight", r(n_hidden, n_emb))
        addq(f"{p}.ffn_v.weight", r(n_emb, n_hidden))
        addq(f"{p}.ffn_r.weight", r(n_emb, n_emb))
    return w.tobytes()


def _quant_mat_builder(rng, quant, dtype):
    """Shared synthetic-params matrix factory: ``mat(*shape)`` returns a
    (possibly GGUF-block-quantized) ``Matrix`` matching what
    ``models.loader.load_model`` produces for a direct-quantized load."""
    import jax.numpy as jnp
    from ..models.matrix import Matrix

    def mat(*shape, scale=0.05, fmt=None):
        w = (rng.normal(size=shape) * scale).astype(np.float32)
        # "q4km" mirrors llama.cpp's Q4_K_M placement: Q4_K layer
        # matrices, Q6_K output head (passed via fmt at the call sites)
        fmt = fmt or ("q4k" if quant == "q4km" else quant)
        if fmt in ("q4k", "q8_0", "q6k", "q5k", "q3k", "q2k",
                   "q4_0", "q4_1", "q5_0", "q5_1"):
            from ..quant import ggml as _g
            from ..quant.ggml import GgmlDType

            qfn, qdt = {
                "q4k": (_g.quantize_q4_k, GgmlDType.Q4_K),
                "q8_0": (_g.quantize_q8_0, GgmlDType.Q8_0),
                "q6k": (_g.quantize_q6_k, GgmlDType.Q6_K),
                "q5k": (_g.quantize_q5_k, GgmlDType.Q5_K),
                "q3k": (_g.quantize_q3_k, GgmlDType.Q3_K),
                "q2k": (_g.quantize_q2_k, GgmlDType.Q2_K),
                "q4_0": (_g.quantize_q4_0, GgmlDType.Q4_0),
                "q4_1": (_g.quantize_q4_1, GgmlDType.Q4_1),
                "q5_0": (_g.quantize_q5_0, GgmlDType.Q5_0),
                "q5_1": (_g.quantize_q5_1, GgmlDType.Q5_1),
            }[fmt]
            per = []
            w2 = w.reshape(-1, *shape[-2:]) if len(shape) == 3 else w[None]
            for wi in w2:
                raw = np.frombuffer(qfn(wi.reshape(-1)), np.uint8)
                # numpy arrays; stacked host-side then transferred once
                per.append(Matrix.from_gguf_blocks(qdt, raw, wi.shape,
                                                   device=False))
            if len(shape) == 2:
                return Matrix(per[0].kind, per[0].shape,
                              {k: jnp.asarray(a) for k, a in per[0].arrays.items()})
            arrays = {
                k: jnp.asarray(np.stack([m.arrays[k] for m in per]))
                for k in per[0].arrays
            }
            return Matrix(per[0].kind, per[0].shape, arrays)
        return Matrix.dense(jnp.asarray(w, dtype))

    return mat


def synthetic_v7_params(
    *, n_layer=12, n_emb=768, head_size=64, n_vocab=65536, n_hidden=None,
    lora_w=64, lora_a=64, lora_g=128, lora_v=32, seed=0, dtype=None,
    quant=None,
):
    """Build RWKV-7 params directly as a JAX pytree (no GGUF round-trip) —
    for benchmarks and large-scale dry runs. Matches the layout produced
    by ``models.loader.load_model``."""
    import jax.numpy as jnp
    from ..models.info import CustomInfo, ModelInfo, ModelVersion

    dtype = dtype or jnp.bfloat16
    n_hidden = n_hidden or int((n_emb * 3.5) // 32 * 32)
    H = n_emb // head_size
    rng = np.random.default_rng(seed)
    L, C = n_layer, n_emb

    def r(*shape, scale=0.5):
        return jnp.asarray((rng.normal(size=shape) * scale).astype(np.float32))

    mat = _quant_mat_builder(rng, quant, dtype)

    info = ModelInfo(
        version=ModelVersion.V7, num_layer=L, num_emb=C, num_hidden=n_hidden,
        num_vocab=n_vocab, num_head=H,
        custom=CustomInfo(w=lora_w, a=lora_a, g=lora_g, v=lora_v),
    )
    ln = lambda: {"w": 1.0 + r(L, C, scale=0.02), "b": r(L, C, scale=0.02)}
    params = {
        "emb": jnp.asarray((rng.normal(size=(n_vocab, C)) * 0.3).astype(np.float16)),
        "ln0": {"w": 1.0 + r(C, scale=0.02), "b": r(C, scale=0.02)},
        "ln_out": {"w": 1.0 + r(C, scale=0.02), "b": r(C, scale=0.02)},
        "head": mat(n_vocab, C, fmt="q6k" if quant == "q4km" else None),
        "blocks": {
            "ln1": ln(),
            "ln2": ln(),
            "att": {
                **{f"x_{s}": r(L, C, scale=0.3) for s in "rwkvag"},
                "w0": r(L, C), "a0": r(L, C), "v0": r(L, C),
                "w1": r(L, lora_w, C, scale=0.05), "w2": r(L, C, lora_w, scale=0.05),
                "a1": r(L, lora_a, C, scale=0.05), "a2": r(L, C, lora_a, scale=0.05),
                "g1": r(L, lora_g, C, scale=0.05), "g2": r(L, C, lora_g, scale=0.05),
                "v1": r(L, lora_v, C, scale=0.05), "v2": r(L, C, lora_v, scale=0.05),
                "r_k": r(L, H, head_size), "k_k": r(L, C, scale=0.3),
                "k_a": r(L, C, scale=0.3),
                "gn": {"w": 1.0 + r(L, C, scale=0.02), "b": r(L, C, scale=0.02)},
                "Wk": mat(L, C, C), "Wv": mat(L, C, C), "Wr": mat(L, C, C),
                "Wo": mat(L, C, C),
            },
            "ffn": {
                "x_k": r(L, C, scale=0.3),
                "Wk": mat(L, n_hidden, C),
                "Wv": mat(L, C, n_hidden),
            },
        },
    }
    # decode fast-path stacks, mirroring models.loader.load_model
    att = params["blocks"]["att"]
    att["x_stack"] = jnp.stack([att[f"x_{s}"] for s in "rwkvag"], axis=1)
    for k in ("w1", "w2", "a1", "a2", "g1", "g2", "v1", "v2"):
        att[k] = att[k].astype(dtype)
    att["lora_down"] = jnp.concatenate(
        [att["w1"], att["a1"], att["g1"], att["v1"]], axis=1
    )
    att["lora_up"] = jnp.concatenate(
        [att["w2"], att["a2"], att["g2"], att["v2"]], axis=2
    )
    return info, params


def synthetic_v56_params(
    *, version=6, n_layer=12, n_emb=768, head_size=64, n_vocab=65536,
    n_hidden=None, rank_tm=32, rank_td=64, seed=0, dtype=None, quant=None,
):
    """RWKV-4/5/6 params as a JAX pytree (no GGUF round-trip), matching
    the ``models.loader.load_model`` layout — used by the V4/V6 decode
    bench and the layer-scan kernel tests. V6 "world" models use
    hidden = 3.5·C (the default here)."""
    import jax.numpy as jnp
    from ..models.info import CustomInfo, ModelInfo, ModelVersion

    dtype = dtype or jnp.bfloat16
    n_hidden = n_hidden or int((n_emb * 3.5) // 32 * 32)
    H = n_emb // head_size
    rng = np.random.default_rng(seed)
    L, C = n_layer, n_emb

    def r(*shape, scale=0.5):
        return jnp.asarray((rng.normal(size=shape) * scale).astype(np.float32))

    mat = _quant_mat_builder(rng, quant, dtype)

    info = ModelInfo(
        version={6: ModelVersion.V6, 5: ModelVersion.V5,
                 4: ModelVersion.V4}[version],
        num_layer=L, num_emb=C, num_hidden=n_hidden, num_vocab=n_vocab,
        num_head=H,
        custom=CustomInfo(time_mix=rank_tm, time_decay=rank_td)
        if version == 6 else CustomInfo(),
    )
    ln = lambda: {"w": 1.0 + r(L, C, scale=0.02), "b": r(L, C, scale=0.02)}
    if version == 4:
        att = {
            # per-CHANNEL vectors; decay stored -exp-activated as
            # load_model does (OppositeExp, ref: loader.rs:480-519)
            "time_first": r(L, C, scale=0.3),
            "time_decay": -jnp.exp(r(L, C, scale=0.3)),
            **{f"mix_{s}": jnp.asarray(
                rng.uniform(0, 1, (L, C)).astype(np.float32))
               for s in "kvr"},
            "Wk": mat(L, C, C), "Wv": mat(L, C, C), "Wr": mat(L, C, C),
            "Wo": mat(L, C, C),
        }
    else:
        att = {
            "time_first": r(L, H, head_size),
            "gn": {"w": 1.0 + r(L, C, scale=0.02), "b": r(L, C, scale=0.02)},
            "Wk": mat(L, C, C), "Wv": mat(L, C, C), "Wr": mat(L, C, C),
            "Wg": mat(L, C, C), "Wo": mat(L, C, C),
        }
    if version == 6:
        att.update({
            "time_decay": r(L, C),  # raw; StableExp applied in forward
            "mix_x": jnp.asarray(rng.uniform(0, 1, (L, C)).astype(np.float32)),
            "time_mix": jnp.asarray(
                rng.uniform(0, 1, (L, 5, C)).astype(np.float32)),
            "tm_w1": r(L, 5 * rank_tm, C, scale=0.05).astype(dtype),
            "tm_w2": r(L, 5, C, rank_tm, scale=0.05).astype(dtype),
            "td_w1": r(L, rank_td, C, scale=0.05).astype(dtype),
            "td_w2": r(L, C, rank_td, scale=0.05).astype(dtype),
        })
    elif version == 5:
        att.update({
            # pre-activated decay (exp(-exp(w))), as load_model stores it
            "time_decay": jnp.exp(-jnp.exp(r(L, H, head_size))),
            **{f"mix_{s}": jnp.asarray(
                rng.uniform(0, 1, (L, C)).astype(np.float32))
               for s in "kvrg"},
        })
    params = {
        "emb": jnp.asarray((rng.normal(size=(n_vocab, C)) * 0.3).astype(np.float16)),
        "ln0": {"w": 1.0 + r(C, scale=0.02), "b": r(C, scale=0.02)},
        "ln_out": {"w": 1.0 + r(C, scale=0.02), "b": r(C, scale=0.02)},
        "head": mat(n_vocab, C),
        "blocks": {
            "ln1": ln(),
            "ln2": ln(),
            "att": att,
            "ffn": {
                "mix_k": jnp.asarray(
                    rng.uniform(0, 1, (L, C)).astype(np.float32)),
                "mix_r": jnp.asarray(
                    rng.uniform(0, 1, (L, C)).astype(np.float32)),
                "Wk": mat(L, n_hidden, C),
                "Wv": mat(L, C, n_hidden),
                "Wr": mat(L, C, C),
            },
        },
    }
    return info, params
