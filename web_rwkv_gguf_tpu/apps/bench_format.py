"""Format comparison benchmark: file size / load time / RAM / prefill /
generation across model formats (ref: examples/bench_format.rs — warmup 2
runs, 5 measured, prefill 256, gen 64)."""

from __future__ import annotations

import argparse
import os
import resource
import time
from pathlib import Path

import numpy as np

from . import common
from ..utils.trace import device_sync


def _rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def bench_one(path, args):
    import jax.numpy as jnp

    from ..models import forward_chunk, init_state, logits_head
    from ..runtime.engine import _bucket  # noqa: F401

    size_mb = Path(path).stat().st_size / 1e6
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    ns = argparse.Namespace(**{**vars(args), "model": path})
    info, params = common.load_any_model(ns)
    load_ms = (time.perf_counter() - t0) * 1e3
    rss_mb = _rss_mb() - rss0

    import jax

    B, T = 1, args.prefill_tokens
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, info.num_vocab, (B, T)), jnp.int32
    )
    lens = jnp.full((B,), T, jnp.int32)
    fwd = jax.jit(lambda p, s, t, l: forward_chunk(info, p, s, t, l))

    def decode_step(params, state, token):
        x, state = forward_chunk(info, params, state, token, jnp.ones((B,), jnp.int32))
        nxt = jnp.argmax(logits_head(params, x[:, 0]), axis=-1).astype(jnp.int32)[:, None]
        return nxt, state

    step = jax.jit(decode_step)

    # warmup
    for _ in range(args.warmup):
        x, st = fwd(params, init_state(info, B), tokens, lens)
        device_sync(x)
    ts = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        x, st = fwd(params, init_state(info, B), tokens, lens)
        device_sync(x)
        ts.append(time.perf_counter() - t0)
    prefill_tps = T / np.median(ts)

    tok = jnp.zeros((B, 1), jnp.int32)
    tok, st = step(params, st, tok)
    device_sync(tok)
    ts = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        for _ in range(args.gen_tokens):
            tok, st = step(params, st, tok)
        device_sync(tok)
        ts.append(time.perf_counter() - t0)
    gen_tps = args.gen_tokens / np.median(ts)
    return {
        "file": Path(path).name,
        "size_mb": size_mb,
        "load_ms": load_ms,
        "ram_mb": rss_mb,
        "prefill_tps": prefill_tps,
        "gen_tps": gen_tps,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("models", nargs="+", help="model files to compare")
    p.add_argument("--quant", default="none", choices=["none", "int8", "nf4", "sf4"])
    p.add_argument("--quant-layers", type=int, default=None)
    p.add_argument("--lora", action="append", default=[])
    p.add_argument("--token-chunk-size", type=int, default=128)
    p.add_argument("--rescale", type=int, default=None)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--vocab", default=None)
    p.add_argument("--prefill-tokens", type=int, default=256)
    p.add_argument("--gen-tokens", type=int, default=64)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--runs", type=int, default=5)
    args = p.parse_args(argv)

    rows = [bench_one(m, args) for m in args.models]
    hdr = f"{'file':30} {'size MB':>8} {'load ms':>8} {'RAM MB':>8} {'prefill t/s':>12} {'gen t/s':>9}"
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(
            f"{r['file']:30} {r['size_mb']:8.1f} {r['load_ms']:8.0f} "
            f"{r['ram_mb']:8.1f} {r['prefill_tps']:12.0f} {r['gen_tps']:9.1f}"
        )


if __name__ == "__main__":
    main()
