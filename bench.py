"""Headline benchmark: RWKV-7 0.1B-config Q4_K_M decode throughput/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
Baseline: the reference engine's generation throughput on its own headline
config — 169.5 tok/s (RWKV-7 0.1B, GGUF Q4_K native shaders, Apple M2
Max; BASELINE.md / reference plan.md:108). Methodology mirrors the
reference's ``bench_format`` (warmup then averaged timed runs); weights
are synthetic random (no model files ship with the image) with the exact
0.1B shape (L=12, C=768, hs=64, V=65536).

The headline model is the TRUE Q4_K_M placement (llama.cpp: Q4_K layer
matrices + Q6_K output head) — the format users actually download.
Rounds 1-3 reported a pure-Q4_K model under this metric name; that
number is still logged as an extra for cross-round continuity (the
Q6_K head costs ~14%, structural 2x head-code DMA — see CLAUDE.md).

Roofline columns: session throughput over this tunnel varies
several-fold, so every decode segment also reports achieved HBM GB/s
(known streamed bytes / measured step time) and the fraction of an
IN-SESSION measured dense-bf16 streaming peak — "at the DMA floor" stays
visible across rounds even when raw tok/s moves with the link.

Extra measurements (v6 decode, dense-bf16 decode, prefill) go to stderr
and into the JSON "extras" map.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_DECODE_Q4K_TPS = 169.5

EXTRAS: dict = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _measure_hbm_peak():
    """In-session dense-bf16 streaming rate (GB/s): a chained gemv scan
    whose per-iteration bytes are known exactly; slope between two chain
    lengths cancels the fetch RTT (block_until_ready lies over this
    tunnel — only a host fetch observes wall-clock)."""
    import jax
    import jax.numpy as jnp

    import functools

    M = K = 8192
    A = jnp.asarray(np.random.default_rng(0).normal(size=(M, K)) * 0.01,
                    jnp.bfloat16)
    x0 = jnp.ones((1, K), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(A, x, n):
        def body(x, _):
            y = jax.lax.dot_general(
                x, A, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (y * 1e-4).astype(jnp.bfloat16)[:, :K], None

        x, _ = jax.lax.scan(body, x, None, length=n)
        return x

    times = {}
    for n in (16, 64):
        o = run(A, x0, n)
        _ = np.asarray(o).ravel()[:1]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(A, x0, n)
            _ = np.asarray(o).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    gbps = 48 * M * K * 2 / (times[64] - times[16]) / 1e9
    return gbps


def _decode_stream_bytes(params, info, B):
    """Bytes one fused decode step must stream from HBM: every weight
    array touched per step (mega blocks or per-layer matrices + head)
    plus the recurrent state read+write."""
    total = 0

    def add_tree(tree):
        nonlocal total
        import jax

        for leaf in jax.tree.leaves(tree):
            total += leaf.size * leaf.dtype.itemsize

    mega = params.get("mega7") or params.get("mega56")
    if mega is not None:
        add_tree(mega.arrays)
    else:
        add_tree(params["blocks"])
    add_tree({"h": params["head"], "lo": params["ln_out"]})
    from web_rwkv_gguf_tpu.models.info import ModelVersion

    L, C, H, hs = info.num_layer, info.num_emb, info.num_head, info.head_size
    if info.version == ModelVersion.V4:  # aa/bb/pp + 2 shifts, per channel
        state_bytes = L * B * 5 * C * 4
    else:
        state_bytes = L * B * (H * hs * hs + 2 * C) * 4
    total += 2 * state_bytes  # read + write
    total += B * C * 2  # embedding row fetch
    return total


def _bench_decode(info, params, B=1, steps=64, reps=8, windows=3,
                  extra_key=None, hbm_peak=None):
    """Greedy decode throughput via the fused on-device generation loop
    (one launch per `steps` tokens; best of `windows` timing windows to
    ride out link-latency variance).

    Timing ends with a host fetch of the sampled tokens: over this
    environment's device tunnel, ``block_until_ready`` returns before the
    computation actually executed, so only a data fetch observes real
    wall-clock. The fetch round-trip (~25 ms) is amortized over
    ``reps * steps`` tokens.
    """
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import init_state
    from web_rwkv_gguf_tpu.models.generate import make_generator

    gen = make_generator(info, steps=steps)
    state = init_state(info, B)
    token = jnp.zeros((B, 1), jnp.int32)
    key = jax.random.key(0)
    t0 = time.perf_counter()
    toks, logits, state, key, _ = gen(params, state, token, key)
    _ = np.asarray(toks)
    log(f"  compile+first segment: {time.perf_counter()-t0:.2f}s")

    def window(n):
        nonlocal toks, logits, state, key
        t0 = time.perf_counter()
        for _ in range(n):
            toks, logits, state, key, _ = gen(params, state, toks[:, -1:], key)
        _ = np.asarray(toks)  # real sync: see docstring
        return time.perf_counter() - t0

    # slope between two window sizes cancels the fetch RTT and the
    # per-call link overhead on top of it; the slope is taken between the
    # per-size MINIMA (a max over per-window slopes would select noise
    # outliers — link-latency variance here exceeds the signal)
    t_small = min(window(reps) for _ in range(windows))
    t_big = min(window(3 * reps) for _ in range(windows))
    tps = 2 * reps * steps * B / (t_big - t_small)
    if extra_key is not None:
        rec = {"tok_s": round(tps, 1)}
        try:
            step_s = B / tps
            gbps = _decode_stream_bytes(params, info, B) / step_s / 1e9
            rec["hbm_gbps"] = round(gbps, 1)
            if hbm_peak:
                rec["pct_hbm_peak"] = round(100 * gbps / hbm_peak, 1)
        except Exception:
            pass
        EXTRAS[extra_key] = rec
    return tps


def _bench_decode_percall(info, params, n_steps=128, B=1):
    """Per-token dispatch decode (the Engine.infer path): includes one
    host->device launch per token."""
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import forward_chunk, init_state, logits_head

    def decode_step(params, state, token):
        x, state = forward_chunk(info, params, state, token, jnp.ones((B,), jnp.int32))
        logits = logits_head(params, x[:, 0])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        return nxt, state

    step = jax.jit(decode_step, donate_argnums=(1,))
    state = init_state(info, B)
    token = jnp.zeros((B, 1), jnp.int32)
    token, state = step(params, state, token)
    _ = np.asarray(token)
    for _ in range(8):
        token, state = step(params, state, token)
    _ = np.asarray(token)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        token, state = step(params, state, token)
    _ = np.asarray(token)  # real sync (block_until_ready lies over the tunnel)
    return n_steps * B / (time.perf_counter() - t0)


def _bench_prefill(info, params, T=256, B=1):
    """Long-document prefill: chained chunks (state carried) inside one
    compiled scan, timed at two chain lengths — the slope cancels both
    the fetch round-trip and the per-call link overhead of this
    environment's tunnel (which otherwise inflates per-chunk cost ~4x)."""
    import jax
    import jax.numpy as jnp

    from web_rwkv_gguf_tpu.models import forward_chunk, init_state

    lens = jnp.full((B,), T, jnp.int32)
    rng = np.random.default_rng(0)

    @jax.jit
    def run(params, state, toks):
        def body(st, t):
            x, st = forward_chunk(info, params, st, t, lens)
            return st, x[:, -1, 0]
        _, xs = jax.lax.scan(body, state, toks)
        return xs

    times = {}
    for n in (4, 16):
        toks = jnp.asarray(rng.integers(0, 1000, (n, B, T)), jnp.int32)
        o = run(params, init_state(info, B), toks)
        _ = np.asarray(o).ravel()[:1]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(params, init_state(info, B), toks)
            _ = np.asarray(o).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return 12 * T * B / (times[16] - times[4])


def main():
    # watchdog: the TPU tunnel in this environment occasionally stalls for
    # minutes; fail cleanly rather than hanging the harness
    import signal

    def _timeout(signum, frame):
        raise TimeoutError("device link unresponsive")

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(480)

    import jax

    from web_rwkv_gguf_tpu.utils.compile_cache import enable_compilation_cache
    from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v7_params

    cache_dir = enable_compilation_cache()
    log(f"device: {jax.devices()[0]}  (compile cache: {cache_dir})")

    from web_rwkv_gguf_tpu.models import prepare_decode

    try:
        hbm_peak = _measure_hbm_peak()
        log(f"in-session HBM streaming peak: {hbm_peak:.0f} GB/s")
        EXTRAS["hbm_peak_gbps"] = round(hbm_peak, 1)
    except Exception as e:
        hbm_peak = None
        log(f"[hbm probe skipped: {e}]")

    log("building Q4_K_M model (synthetic 0.1B, Q6_K output head)...")
    info, params_m = synthetic_v7_params(quant="q4km")
    log(f"model: RWKV-7 L={info.num_layer} C={info.num_emb} H={info.num_head} "
        f"V={info.num_vocab} hidden={info.num_hidden}")

    params_m1 = prepare_decode(params_m, info, batch_hint=1)
    q4km_decode = _bench_decode(info, params_m1, extra_key="v7_q4km_b1",
                                hbm_peak=hbm_peak)
    log(f"decode  Q4_K_M fused-loop batch1: {q4km_decode:.1f} tok/s "
        f"({EXTRAS['v7_q4km_b1']})")

    # headline-preserving watchdog: the extras below are best-effort —
    # SIGALRM cannot interrupt a C-level device fetch if the tunnel
    # stalls hard (documented: minutes, once an hour+), but a daemon
    # THREAD can still print. If the extras overrun their budget, emit
    # the already-measured headline (with whatever extras exist) and
    # exit so the driver never loses the metric.
    import os
    import threading

    headline = {
        "metric": "decode_tok_per_s_rwkv7_0.1b_q4km_batch1",
        "value": round(q4km_decode, 1),
        "unit": "tok/s",
        "vs_baseline": round(q4km_decode / BASELINE_DECODE_Q4K_TPS, 3),
    }
    _done = threading.Event()

    def _headline_watchdog():
        if not _done.wait(720):
            log("[extras watchdog fired: emitting headline and exiting]")
            print(json.dumps({**headline, "extras": EXTRAS}), flush=True)
            os._exit(0)

    threading.Thread(target=_headline_watchdog, daemon=True).start()

    signal.alarm(640)  # extras' own budget (incl. v6/v5/v4 + dense rows)
    try:
        # serving batch on the real format first (most-reported extra)
        q4km_decode8 = _bench_decode(info, params_m1, B=8,
                                     extra_key="v7_q4km_b8", hbm_peak=hbm_peak)
        log(f"decode  Q4_K_M fused-loop batch8: {q4km_decode8:.1f} tok/s")
        del params_m1, params_m

        # V6 — most real-world RWKV GGUFs are v6 "world" models; the
        # layer-scan kernel family covers it since round 5
        from web_rwkv_gguf_tpu.utils.synthetic import synthetic_v56_params

        log("building V6 Q4_K model (synthetic 0.1B)...")
        info6, params_6 = synthetic_v56_params(version=6, quant="q4k")
        params_6p = prepare_decode(params_6, info6, batch_hint=1)
        assert "mega56" in params_6p, "v6 fused decode prep failed"
        v6_decode = _bench_decode(info6, params_6p, extra_key="v6_q4k_b1",
                                  hbm_peak=hbm_peak)
        log(f"decode  v6 Q4_K fused-loop batch1: {v6_decode:.1f} tok/s "
            f"({EXTRAS['v6_q4k_b1']})")
        v6_decode8 = _bench_decode(info6, params_6p, B=8,
                                   extra_key="v6_q4k_b8", hbm_peak=hbm_peak)
        log(f"decode  v6 Q4_K fused-loop batch8: {v6_decode8:.1f} tok/s")
        del params_6p, params_6, info6

        # V5 and V4 — every supported model version gets a decode row
        # (VERDICT r4 weak #1); batch1 only, the batch scaling matches v6
        for _ver in (5, 4):
            log(f"building V{_ver} Q4_K model (synthetic 0.1B)...")
            info_v, params_v = synthetic_v56_params(version=_ver, quant="q4k")
            params_vp = prepare_decode(params_v, info_v, batch_hint=1)
            assert "mega56" in params_vp, f"v{_ver} fused decode prep failed"
            v_decode = _bench_decode(info_v, params_vp,
                                     extra_key=f"v{_ver}_q4k_b1",
                                     hbm_peak=hbm_peak)
            log(f"decode  v{_ver} Q4_K fused-loop batch1: {v_decode:.1f} tok/s "
                f"({EXTRAS[f'v{_ver}_q4k_b1']})")
            del params_vp, params_v, info_v

        # pure-Q4_K model: the rounds-1-3 headline config (continuity)
        log("building pure-Q4_K model (rounds 1-3 headline config)...")
        info, params_q = synthetic_v7_params(quant="q4k")
        params_qp = prepare_decode(params_q, info, batch_hint=1)
        q4k_decode = _bench_decode(info, params_qp, extra_key="v7_q4k_b1",
                                   hbm_peak=hbm_peak)
        log(f"decode  Q4_K fused-loop batch1: {q4k_decode:.1f} tok/s")
        q4k_decode8 = _bench_decode(info, params_qp, B=8,
                                    extra_key="v7_q4k_b8", hbm_peak=hbm_peak)
        log(f"decode  Q4_K fused-loop batch8: {q4k_decode8:.1f} tok/s")
        # B=16 under the ENGINE's auto accuracy policy (runtime.engine.
        # auto_decode_precise): at/above DECODE_FAST_MIN_B the default is
        # the plain-bf16 rounding class — the reference's own f16-dequant
        # accuracy class — measured 1.2x the FMA-exact class at B=16;
        # dense-weight promotion measured a dead end (13.3k, see
        # scripts/bench_b16_dense_ab.py). The exact class is logged too.
        from web_rwkv_gguf_tpu.ops.pallas import config as _pcfg
        from web_rwkv_gguf_tpu.runtime.engine import auto_decode_precise

        _pcfg.wide_precise = auto_decode_precise(16, _pcfg.wide_precise)
        q4k_decode16 = _bench_decode(info, params_qp, B=16,
                                     extra_key="v7_q4k_b16_auto",
                                     hbm_peak=hbm_peak)
        _pcfg.wide_precise = True
        log(f"decode  Q4_K batch16 (auto class): {q4k_decode16:.1f} tok/s")
        q4k_decode16f = _bench_decode(info, params_qp, B=16,
                                      extra_key="v7_q4k_b16_exact",
                                      hbm_peak=hbm_peak)
        log(f"decode  Q4_K batch16 FMA-exact:    {q4k_decode16f:.1f} tok/s")
        q4k_percall = _bench_decode_percall(info, params_qp)
        del params_qp
        log(f"decode  Q4_K per-call dispatch: {q4k_percall:.1f} tok/s")
        EXTRAS["v7_q4k_b1_percall"] = {"tok_s": round(q4k_percall, 1)}
        q4k_prefill = _bench_prefill(info, params_q)
        log(f"prefill Q4_K (T=256):          {q4k_prefill:.0f} tok/s")
        EXTRAS["v7_q4k_prefill_t256"] = {"tok_s": round(q4k_prefill, 0)}
        # Engine(prefill_dense=True) path: prefill against one-time-cached
        # dense weights (prefill is MXU-bound; decode stays quantized)
        from web_rwkv_gguf_tpu.models.loader import densify_matrices

        params_qd = densify_matrices(params_q)
        q4k_prefill_d = _bench_prefill(info, params_qd)
        log(f"prefill Q4_K dense-cached:     {q4k_prefill_d:.0f} tok/s")
        EXTRAS["v7_q4k_prefill_dense_t256"] = {"tok_s": round(q4k_prefill_d, 0)}
        del params_qd
        del params_q

        info, params_d = synthetic_v7_params()
        params_d = prepare_decode(params_d, info, batch_hint=1)
        bf16_decode = _bench_decode(info, params_d, extra_key="v7_bf16_b1",
                                    hbm_peak=hbm_peak)
        log(f"decode  bf16 fused-loop batch1: {bf16_decode:.1f} tok/s")
        # dense residents at B=16: the Engine's AUTO decode policy from
        # B>=DECODE_DENSE_MIN_B (round 5) — measured 1.39x the quantized
        # plain-bf16 point in the same session (22.9k vs 16.5k)
        bf16_decode16 = _bench_decode(info, params_d, B=16,
                                      extra_key="v7_dense_b16",
                                      hbm_peak=hbm_peak)
        log(f"decode  dense-resident batch16 (auto policy): "
            f"{bf16_decode16:.1f} tok/s")
        bf16_prefill = _bench_prefill(info, params_d)
        log(f"prefill bf16 (T=256):          {bf16_prefill:.0f} tok/s")
        EXTRAS["v7_bf16_prefill_t256"] = {"tok_s": round(bf16_prefill, 0)}
        del params_d

        # END-TO-END product surface: Engine.generate per-call rate
        # (prefill + sampling + segments + host round-trips), B=16 on
        # the quantized 0.1B — what a serving caller actually observes
        from web_rwkv_gguf_tpu.runtime import Engine

        info_e, params_e = synthetic_v7_params(quant="q4k")
        eng = Engine(info_e, params_e, num_batch=16)
        e_prompts = [[(i * 7 + 3) % 1000 + 1] * 8 for i in range(16)]
        eng.generate(e_prompts, 128)  # compile + warm
        best_e = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.generate(e_prompts, 128)
            best_e = min(best_e, time.perf_counter() - t0)
        e2e = 16 * 128 / best_e
        log(f"engine.generate end-to-end (B=16, 128 new tok/call): "
            f"{e2e:.1f} tok/s")
        EXTRAS["v7_engine_generate_b16"] = {
            "tok_s": round(e2e, 1),
            "dense_auto": eng.params_quantized is not None,
        }
        del eng, params_e

        # end-to-end GGUF load time (parse + repack + operand build +
        # one device transfer sweep) on a small real file — the
        # reference's bench_format load metric (plan.md:107-108)
        from web_rwkv_gguf_tpu.gguf import GgufFile
        from web_rwkv_gguf_tpu.models import load_model
        from web_rwkv_gguf_tpu.quant.ggml import GgmlDType
        from web_rwkv_gguf_tpu.utils.synthetic import make_v7_gguf

        raw = make_v7_gguf(n_layer=4, n_emb=256, head_size=64, n_vocab=2048,
                           quantize=GgmlDType.Q4_K)
        t0 = time.perf_counter()
        _info_l, _params_l = load_model(GgufFile(raw))
        _ = np.asarray(jax.tree.leaves(_params_l)[0]).ravel()[:1]
        t_load = time.perf_counter() - t0
        log(f"gguf load (L4 C256 V2048 Q4_K): {t_load:.2f}s")
        EXTRAS["gguf_load_s"] = round(t_load, 2)
        del _params_l, raw
    except Exception as e:  # pragma: no cover
        log(f"[extras skipped: {e}]")
    finally:
        signal.alarm(0)

    _done.set()
    print(json.dumps({**headline, "extras": EXTRAS}), flush=True)


if __name__ == "__main__":
    main()
