"""Real multi-process DCN test: two JAX processes form a cluster and run
the DistributedEngine (plan broadcast from process 0) to completion; the
coordinator's result must match a single-process Engine."""

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    proc_id = int(sys.argv[1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="localhost:12717", num_processes=2,
        process_id=proc_id, local_device_ids=[0, 1],
    )
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {repo!r} + "/tests")
    import fixtures
    import numpy as np
    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import load_model
    from web_rwkv_gguf_tpu.runtime import RnnInput, RnnInputBatch
    from web_rwkv_gguf_tpu.runtime.distributed import DistributedEngine

    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_layer=2, n_emb=32, head_size=8, n_vocab=64))
    )
    eng = DistributedEngine(info, params, num_batch=2, token_chunk_size=32)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    if eng.is_coordinator:
        inp = RnnInput([RnnInputBatch(list(p)) for p in prompts], 32)
        logits = [None, None]
        while inp.num_token:
            out = eng.infer(inp)
            for b in range(2):
                if len(out[b]):
                    logits[b] = out[b][-1]
        print("RESULT " + json.dumps([int(np.argmax(l)) for l in logits]), flush=True)
    else:
        # mirror the coordinator's chunk count (same deterministic plan)
        steps = 0
        total = sum(len(p) for p in prompts)
        remaining = total
        while remaining > 0:
            eng.infer(None)
            remaining -= min(remaining, 32)
    """
)


def test_two_process_distributed_engine(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo))

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    result_lines = [l for o in outs for l in o.splitlines() if l.startswith("RESULT ")]
    assert len(result_lines) == 1, outs
    got = json.loads(result_lines[0][len("RESULT "):])

    # single-process reference
    sys.path.insert(0, repo + "/tests")
    import fixtures

    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import load_model
    from web_rwkv_gguf_tpu.runtime import Engine, RnnInput, RnnInputBatch

    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_layer=2, n_emb=32, head_size=8, n_vocab=64))
    )
    eng = Engine(info, params, num_batch=2, token_chunk_size=32)
    inp = RnnInput([RnnInputBatch([1, 2, 3, 4, 5]), RnnInputBatch([9, 8, 7])], 32)
    want = [None, None]
    while inp.num_token:
        out = eng.infer(inp)
        for b in range(2):
            if len(out[b]):
                want[b] = int(np.argmax(out[b][-1]))
    assert got == want
