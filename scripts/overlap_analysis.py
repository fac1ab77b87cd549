"""Collective/compute overlap evidence for the shard_map TP forward.

Compiles the tensor-parallel forward on a virtual 8-device mesh and
inspects the OPTIMIZED HLO schedule: every `all-gather-start` /
`all-gather-done` (and collective-permute) pair is located in the
instruction sequence and the number of non-collective instructions
scheduled between start and done is reported — that window is exactly
the compute XLA overlaps with the collective on real hardware (the
latency-hiding scheduler hoists `*-start` ops early and sinks `*-done`
late; on TPU the DMA engines run the gather while the listed ops
execute).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/overlap_analysis.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import init_state
    from web_rwkv_gguf_tpu.parallel import make_mesh, shard_state
    from web_rwkv_gguf_tpu.parallel.tensor import make_tp_forward, shard_params_tp
    from web_rwkv_gguf_tpu.utils.synthetic import make_v7_gguf
    from web_rwkv_gguf_tpu.models import load_model

    info, params = load_model(
        GgufFile(make_v7_gguf(n_layer=4, n_emb=64, head_size=8, n_vocab=128))
    )
    mesh = make_mesh(2, 4)
    sp = shard_params_tp(params, mesh, info)
    fwd = make_tp_forward(info, mesh, sp)
    state = shard_state(init_state(info, 4), mesh)
    tokens = jnp.zeros((4, 8), jnp.int32)
    lens = jnp.asarray([8, 8, 8, 8], jnp.int32)

    lowered = fwd.lower(sp, state, tokens, lens)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    lines = hlo.splitlines()
    starts: dict[str, int] = {}
    pairs = []
    pat_start = re.compile(r"(%?[\w.\-]+)\s*=.*(all-gather-start|collective-permute-start)")
    pat_done = re.compile(r"=.*(all-gather-done|collective-permute-done)\(([^)]+)\)")
    for i, ln in enumerate(lines):
        m = pat_start.search(ln)
        if m:
            starts[m.group(1)] = i
        m = pat_done.search(ln)
        if m:
            op = m.group(2).strip().split(",")[0]
            if op in starts:
                pairs.append((op, starts[op], i))

    n_coll = len(re.findall(r"all-gather|collective-permute|all-reduce", hlo))
    print(f"collective ops referenced in optimized HLO: {n_coll}")
    if not pairs:
        # CPU backend may lower collectives synchronously; fall back to
        # counting the async-pair forms present at all
        n_async = len(re.findall(r"-start", hlo))
        print(f"async collective starts found: {n_async}")
        print(
            "NOTE: the CPU backend schedules collectives synchronously; "
            "on TPU the same HLO runs under the latency-hiding scheduler "
            "(async start/done pairs) — see docs note."
        )
        return
    print("start->done scheduling windows (instructions overlapped):")
    for op, s, d in pairs:
        window = d - s - 1
        print(f"  {op}: {window} instructions between start and done")


if __name__ == "__main__":
    main()
