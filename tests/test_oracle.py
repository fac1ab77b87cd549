"""Independent scalar oracles vs the engine forward.

These reimplement the reference's math as direct per-token numpy
transcriptions of the dispatch order and the WGSL kernel equations
(v7.rs:716-1007 / time_mix_v7.wgsl, v4.rs:630-792 / time_mix_v4.wgsl)
— deliberately NOT sharing any code with the engine — to catch formula
misreadings that internal consistency tests cannot.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from web_rwkv_gguf_tpu.gguf import GgufFile
from web_rwkv_gguf_tpu.models import forward_chunk, init_state, load_model

import fixtures


def _ln(x, w, b, eps=1e-5):
    mu = x.mean()
    var = x.var()
    return (x - mu) / np.sqrt(var + eps) * w + b


def _gn(x, w, b, heads, eps=64e-5):
    # per-head group norm over the channel dim, per-channel affine
    C = x.shape[-1]
    hs = C // heads
    out = np.empty_like(x)
    for h in range(heads):
        seg = x[h * hs : (h + 1) * hs]
        mu, var = seg.mean(), seg.var()
        out[h * hs : (h + 1) * hs] = (seg - mu) / np.sqrt(var + eps)
    return out * w + b


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _round_like_engine(arr):
    """The engine loader rounds matrices through f16; the oracle tests run
    the engine with dtype=f32, so f16 rounding is the only weight-side
    difference to mirror."""
    return np.asarray(arr.astype(np.float16), np.float64)


def _mm(W, x):
    return W @ x


def oracle_v7(reader, tokens, round_f16=True):
    """Per-token scalar RWKV-7 forward returning the final residual x.

    ``round_f16=False`` skips the loader's f16 matrix rounding — used
    when ``reader`` holds QUANTIZED tensors, whose dequantized values
    the engine represents exactly (direct K-quant load, no f16 pass)."""

    def g(n):
        arr = np.asarray(reader.tensor(n, np.float32), np.float64)
        # only the big projection matrices go through the loader's f16
        # rounding; inner-LoRA adapters and vectors stay f32
        if round_f16 and arr.ndim == 2 and n.endswith(".weight"):
            return _round_like_engine(arr)
        return arr
    n_layer = 2
    C = g("emb.weight").shape[1]
    hs = reader.metadata["rwkv7.wkv.head_size"]
    H = C // hs

    att_shift = [np.zeros(C) for _ in range(n_layer)]
    ffn_shift = [np.zeros(C) for _ in range(n_layer)]
    S = [np.zeros((H, hs, hs)) for _ in range(n_layer)]  # [k, v] per head
    v0 = None
    out = []

    for tok in tokens:
        x = _ln(g("emb.weight")[tok], g("blocks.0.ln0.weight"), g("blocks.0.ln0.bias"))
        for i in range(n_layer):
            p = f"blocks.{i}."
            xx = _ln(x, g(p + "ln1.weight"), g(p + "ln1.bias"))
            prev = att_shift[i]
            att_shift[i] = xx.copy()

            def shift(mix):
                return xx + mix * (prev - xx)

            rx = shift(g(p + "att.x_r"))
            wx = shift(g(p + "att.x_w"))
            kx = shift(g(p + "att.x_k"))
            vx = shift(g(p + "att.x_v"))
            ax = shift(g(p + "att.x_a"))
            gx = shift(g(p + "att.x_g"))

            r = _mm(g(p + "att.receptance.weight"), rx)
            k = _mm(g(p + "att.key.weight"), kx)
            v = _mm(g(p + "att.value.weight"), vx)

            w_in = g(p + "att.w0") + g(p + "att.w2") @ np.tanh(g(p + "att.w1") @ wx)
            a = _sigmoid(g(p + "att.a0") + g(p + "att.a2") @ (g(p + "att.a1") @ ax))
            gate = g(p + "att.g2") @ _sigmoid(g(p + "att.g1") @ gx)

            kk = k * g(p + "att.k_k")
            kkn = np.empty_like(kk)
            for h in range(H):
                seg = kk[h * hs : (h + 1) * hs]
                kkn[h * hs : (h + 1) * hs] = seg / np.sqrt((seg ** 2).sum() + 1e-12)
            k = k * (1.0 + (a - 1.0) * g(p + "att.k_a"))

            if i == 0:
                v0 = v.copy()
            else:
                vm = _sigmoid(
                    g(p + "att.v0") + g(p + "att.v2") @ (g(p + "att.v1") @ vx)
                )
                v = v + vm * (v0 - v)

            w_dec = np.exp(-0.606531 * _sigmoid(w_in))
            y = np.zeros(C)
            r_k = np.asarray(reader.tensor(p + "att.r_k", np.float32), np.float64)
            for h in range(H):
                sl = slice(h * hs, (h + 1) * hs)
                rr, ww, kv, vv = r[sl], w_dec[sl], k[sl], v[sl]
                aa, bb = -kkn[sl], kkn[sl] * a[sl]
                sa = S[i][h].T @ aa  # [v]
                S[i][h] = (
                    ww[:, None] * S[i][h]
                    + np.outer(kv, vv)
                    + np.outer(bb, sa)
                )
                y[sl] = S[i][h].T @ rr
            y = _gn(y, g(p + "att.ln_x.weight"), g(p + "att.ln_x.bias"), H)
            for h in range(H):
                sl = slice(h * hs, (h + 1) * hs)
                bonus = (r[sl] * k[sl] * r_k[h]).sum()
                y[sl] += bonus * v[sl]
            y = y * gate
            x = x + _mm(g(p + "att.output.weight"), y)

            xx2 = _ln(x, g(p + "ln2.weight"), g(p + "ln2.bias"))
            prev2 = ffn_shift[i]
            ffn_shift[i] = xx2.copy()
            kx2 = xx2 + g(p + "ffn.x_k") * (prev2 - xx2)
            kf = np.maximum(_mm(g(p + "ffn.key.weight"), kx2), 0.0) ** 2
            x = x + _mm(g(p + "ffn.value.weight"), kf)
        out.append(x.copy())
    return np.stack(out)


def oracle_v4(reader, tokens):
    def g(n):
        arr = np.asarray(reader.tensor(n, np.float32), np.float64)
        if arr.ndim == 2:
            return _round_like_engine(arr)
        return arr
    n_layer = 2
    C = g("emb.weight").shape[1]

    att_shift = [np.zeros(C) for _ in range(n_layer)]
    ffn_shift = [np.zeros(C) for _ in range(n_layer)]
    aa = [np.zeros(C) for _ in range(n_layer)]
    bb = [np.zeros(C) for _ in range(n_layer)]
    pp = [np.full(C, np.finfo(np.float32).min) for _ in range(n_layer)]
    out = []

    for tok in tokens:
        x = _ln(g("emb.weight")[tok], g("blocks.0.ln0.weight"), g("blocks.0.ln0.bias"))
        for i in range(n_layer):
            p = f"blocks.{i}."
            xx = _ln(x, g(p + "ln1.weight"), g(p + "ln1.bias"))
            prev = att_shift[i]
            att_shift[i] = xx.copy()

            def shift(mix):  # v4: non-reversed
                return prev + mix * (xx - prev)

            kx = shift(g(p + "att.time_mix_k"))
            vx = shift(g(p + "att.time_mix_v"))
            rx = shift(g(p + "att.time_mix_r"))
            k = _mm(g(p + "att.key.weight"), kx)
            v = _mm(g(p + "att.value.weight"), vx)
            r = _sigmoid(_mm(g(p + "att.receptance.weight"), rx))

            u = g(p + "att.time_first")
            w = -np.exp(g(p + "att.time_decay"))

            ww = u + k
            q = np.maximum(pp[i], ww)
            e1 = np.exp(pp[i] - q)
            e2 = np.exp(ww - q)
            y = r * (e1 * aa[i] + e2 * v) / (e1 * bb[i] + e2)

            ww = w + pp[i]
            q = np.maximum(ww, k)
            e1 = np.exp(ww - q)
            e2 = np.exp(k - q)
            aa[i] = e1 * aa[i] + e2 * v
            bb[i] = e1 * bb[i] + e2
            pp[i] = q

            x = x + _mm(g(p + "att.output.weight"), y)

            xx2 = _ln(x, g(p + "ln2.weight"), g(p + "ln2.bias"))
            prev2 = ffn_shift[i]
            ffn_shift[i] = xx2.copy()
            kx2 = prev2 + g(p + "ffn.time_mix_k") * (xx2 - prev2)
            rx2 = prev2 + g(p + "ffn.time_mix_r") * (xx2 - prev2)
            kf = np.maximum(_mm(g(p + "ffn.key.weight"), kx2), 0.0) ** 2
            vf = _mm(g(p + "ffn.value.weight"), kf)
            rf = _sigmoid(_mm(g(p + "ffn.receptance.weight"), rx2))
            x = x + rf * vf
        out.append(x.copy())
    return np.stack(out)


def test_v7_matches_scalar_oracle():
    raw = fixtures.make_v7_gguf(n_layer=2, n_emb=16, head_size=4, n_vocab=32, seed=21)
    reader = GgufFile(raw)
    info, params = load_model(reader, dtype=jnp.float32)
    tokens = [5, 1, 9, 3, 7, 2]

    want = oracle_v7(reader, tokens)
    x, _ = forward_chunk(
        info, params, init_state(info, 1),
        jnp.asarray([tokens], jnp.int32), jnp.asarray([len(tokens)], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(x[0]), want, rtol=2e-4, atol=2e-4)


def test_v4_matches_scalar_oracle():
    raw = fixtures.make_v4_gguf(n_layer=2, n_emb=16, n_vocab=32, seed=22)
    reader = GgufFile(raw)
    info, params = load_model(reader, dtype=jnp.float32)
    tokens = [4, 8, 1, 6, 2]

    want = oracle_v4(reader, tokens)
    x, _ = forward_chunk(
        info, params, init_state(info, 1),
        jnp.asarray([tokens], jnp.int32), jnp.asarray([len(tokens)], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(x[0]), want, rtol=2e-4, atol=2e-4)


def oracle_v5(reader, tokens):
    def g(n):
        arr = np.asarray(reader.tensor(n, np.float32), np.float64)
        if arr.ndim == 2 and n.endswith(".weight") and "ln" not in n:
            return _round_like_engine(arr)
        return arr

    n_layer = 2
    C = g("emb.weight").shape[1]
    tf = g("blocks.0.att.time_first")
    H, hs = tf.shape
    att_shift = [np.zeros(C) for _ in range(n_layer)]
    ffn_shift = [np.zeros(C) for _ in range(n_layer)]
    S = [np.zeros((H, hs, hs)) for _ in range(n_layer)]
    out = []

    for tok in tokens:
        x = _ln(g("emb.weight")[tok], g("blocks.0.ln0.weight"), g("blocks.0.ln0.bias"))
        for i in range(n_layer):
            p = f"blocks.{i}."
            xx = _ln(x, g(p + "ln1.weight"), g(p + "ln1.bias"))
            prev = att_shift[i]
            att_shift[i] = xx.copy()

            def shift(mix):  # v5: non-reversed
                return prev + mix * (xx - prev)

            k = _mm(g(p + "att.key.weight"), shift(g(p + "att.time_mix_k")))
            v = _mm(g(p + "att.value.weight"), shift(g(p + "att.time_mix_v")))
            r = _mm(g(p + "att.receptance.weight"), shift(g(p + "att.time_mix_r")))
            gate = _mm(g(p + "att.gate.weight"), shift(g(p + "att.time_mix_g")))

            u = g(p + "att.time_first").reshape(H, hs)
            w = np.exp(-np.exp(g(p + "att.time_decay").reshape(H, hs)))

            y = np.zeros(C)
            for h in range(H):
                sl = slice(h * hs, (h + 1) * hs)
                kv = np.outer(k[sl], v[sl])
                y[sl] = (u[h][:, None] * kv + S[i][h]).T @ r[sl]
                S[i][h] = w[h][:, None] * S[i][h] + kv
            y = _gn(y, g(p + "att.ln_x.weight"), g(p + "att.ln_x.bias"), H)
            y = y * (gate * _sigmoid(gate))  # silu
            x = x + _mm(g(p + "att.output.weight"), y)

            xx2 = _ln(x, g(p + "ln2.weight"), g(p + "ln2.bias"))
            prev2 = ffn_shift[i]
            ffn_shift[i] = xx2.copy()
            kx2 = prev2 + g(p + "ffn.time_mix_k") * (xx2 - prev2)
            rx2 = prev2 + g(p + "ffn.time_mix_r") * (xx2 - prev2)
            kf = np.maximum(_mm(g(p + "ffn.key.weight"), kx2), 0.0) ** 2
            x = x + _sigmoid(_mm(g(p + "ffn.receptance.weight"), rx2)) * _mm(
                g(p + "ffn.value.weight"), kf
            )
        out.append(x.copy())
    return np.stack(out)


def oracle_v6(reader, tokens):
    def g(n):
        arr = np.asarray(reader.tensor(n, np.float32), np.float64)
        if arr.ndim == 2 and n.endswith(".weight") and "ln" not in n:
            return _round_like_engine(arr)
        return arr

    n_layer = 2
    C = g("emb.weight").shape[1]
    tf = g("blocks.0.att.time_first")
    H, hs = tf.shape
    att_shift = [np.zeros(C) for _ in range(n_layer)]
    ffn_shift = [np.zeros(C) for _ in range(n_layer)]
    S = [np.zeros((H, hs, hs)) for _ in range(n_layer)]
    out = []

    for tok in tokens:
        x = _ln(g("emb.weight")[tok], g("blocks.0.ln0.weight"), g("blocks.0.ln0.bias"))
        for i in range(n_layer):
            p = f"blocks.{i}."
            xx = _ln(x, g(p + "ln1.weight"), g(p + "ln1.bias"))
            prev = att_shift[i]
            att_shift[i] = xx.copy()

            def rshift(mix):  # v6: reversed
                return xx + mix * (prev - xx)

            sx = rshift(g(p + "att.time_mix_x"))
            tm_w1 = g(p + "att.time_mix_w1")  # [5r, C]
            tm_w2 = g(p + "att.time_mix_w2")  # [5, C, r]
            r5 = tm_w1.shape[0] // 5
            z = np.tanh(tm_w1 @ sx).reshape(5, r5)
            mixes = np.stack(
                [tm_w2[f] @ z[f] for f in range(5)]
            )  # [5, C]
            base = {
                0: g(p + "att.time_mix_w"), 1: g(p + "att.time_mix_k"),
                2: g(p + "att.time_mix_v"), 3: g(p + "att.time_mix_r"),
                4: g(p + "att.time_mix_g"),
            }
            sxs = [rshift(mixes[f] + base[f]) for f in range(5)]

            k = _mm(g(p + "att.key.weight"), sxs[1])
            v = _mm(g(p + "att.value.weight"), sxs[2])
            r = _mm(g(p + "att.receptance.weight"), sxs[3])
            gate = _mm(g(p + "att.gate.weight"), sxs[4])

            dz = np.tanh(g(p + "att.time_decay_w1") @ sxs[0])
            w_raw = g(p + "att.time_decay_w2") @ dz + g(p + "att.time_decay").reshape(-1)
            w = np.exp(-np.exp(w_raw)).reshape(H, hs)
            u = g(p + "att.time_first").reshape(H, hs)

            y = np.zeros(C)
            for h in range(H):
                sl = slice(h * hs, (h + 1) * hs)
                kv = np.outer(k[sl], v[sl])
                y[sl] = (u[h][:, None] * kv + S[i][h]).T @ r[sl]
                S[i][h] = w[h][:, None] * S[i][h] + kv
            y = _gn(y, g(p + "att.ln_x.weight"), g(p + "att.ln_x.bias"), H)
            y = y * (gate * _sigmoid(gate))
            x = x + _mm(g(p + "att.output.weight"), y)

            xx2 = _ln(x, g(p + "ln2.weight"), g(p + "ln2.bias"))
            prev2 = ffn_shift[i]
            ffn_shift[i] = xx2.copy()
            kx2 = xx2 + g(p + "ffn.time_mix_k") * (prev2 - xx2)
            rx2 = xx2 + g(p + "ffn.time_mix_r") * (prev2 - xx2)
            kf = np.maximum(_mm(g(p + "ffn.key.weight"), kx2), 0.0) ** 2
            x = x + _sigmoid(_mm(g(p + "ffn.receptance.weight"), rx2)) * _mm(
                g(p + "ffn.value.weight"), kf
            )
        out.append(x.copy())
    return np.stack(out)


def test_v5_matches_scalar_oracle():
    raw = fixtures.make_v5_gguf(n_layer=2, n_emb=16, head_size=4, n_vocab=32, seed=23)
    reader = GgufFile(raw)
    info, params = load_model(reader, dtype=jnp.float32)
    tokens = [3, 7, 2, 9]
    want = oracle_v5(reader, tokens)
    x, _ = forward_chunk(
        info, params, init_state(info, 1),
        jnp.asarray([tokens], jnp.int32), jnp.asarray([len(tokens)], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(x[0]), want, rtol=2e-4, atol=2e-4)


def test_v6_matches_scalar_oracle():
    raw = fixtures.make_v6_gguf(n_layer=2, n_emb=16, head_size=4, n_vocab=32, seed=24)
    reader = GgufFile(raw)
    info, params = load_model(reader, dtype=jnp.float32)
    tokens = [6, 1, 8, 4]
    want = oracle_v6(reader, tokens)
    x, _ = forward_chunk(
        info, params, init_state(info, 1),
        jnp.asarray([tokens], jnp.int32), jnp.asarray([len(tokens)], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(x[0]), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("quant", ["q4k", "q6k"])
def test_v7_quantized_matches_oracle_end_to_end(quant):
    """End-to-end QUANTIZED bound (VERDICT r3 #4a): the engine forward on
    a Q4_K/Q6_K model vs the scalar oracle running on the SAME
    dequantized values.

    The direct-quantized load represents exactly the dequantized f32
    values (d*sc products formed in f32 — quant/repack.py), so the only
    engine-vs-oracle difference is compute-path rounding: bf16
    contractions (2^-9 relative per dot) amplified through L=2 layers of
    norms/gates — the 2e-2 rel / 5e-2-of-scale tolerance is that class,
    NOT quantization error (the oracle sees the same quantized weights).
    Chained with test_pallas.py (fused kernels vs the same dequantized
    values), this bounds the full quantized serving path against an
    independent scalar transcription of the reference math."""
    from web_rwkv_gguf_tpu.quant.ggml import GgmlDType

    gg = {"q4k": GgmlDType.Q4_K, "q6k": GgmlDType.Q6_K}[quant]
    raw = fixtures.make_v7_gguf(
        n_layer=2, n_emb=256, head_size=64, n_vocab=288, seed=21,
        quantize=gg,
    )
    reader = GgufFile(raw)
    info, params = load_model(reader)  # default (bf16 compute) path
    tokens = [5, 1, 9, 3, 7, 2]

    want = oracle_v7(reader, tokens, round_f16=False)
    x, _ = forward_chunk(
        info, params, init_state(info, 1),
        jnp.asarray([tokens], jnp.int32), jnp.asarray([len(tokens)], jnp.int32),
    )
    got = np.asarray(x[0])
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=5e-2 * scale)
