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

_SCENARIO = textwrap.dedent(
    """
    def run_scenario(eng, infer, np, RnnInput, RnnInputBatch, RnnOption, emb_row):
        # phase 1: mixed options — lane 0 LAST, lane 1 FULL
        inp = RnnInput(
            [RnnInputBatch([1, 2, 3, 4, 5], RnnOption.LAST),
             RnnInputBatch([9, 8, 7], RnnOption.FULL)], 32,
        )
        collected = [[], []]
        while inp.num_token:
            out = infer(inp)
            for b in range(2):
                for row in out[b]:
                    collected[b].append(int(np.argmax(row)))
        # phase 2: lane swap mid-stream — admit a NEW sequence into lane 1
        # (state reset) while lane 0 continues decoding, with one
        # embedding-vector token in lane 0 (Token::Embed)
        if hasattr(eng, "reset_lane"):
            eng.reset_lane(1)
        else:
            eng.reset_state(1)
        inp.batches[0].tokens = [collected[0][-1], emb_row]
        inp.batches[1] = RnnInputBatch([4, 5, 6], RnnOption.FULL)
        while inp.num_token:
            out = infer(inp)
            for b in range(2):
                for row in out[b]:
                    collected[b].append(int(np.argmax(row)))
        return collected
    """
)

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
    from web_rwkv_gguf_tpu.runtime.scheduler import RnnOption
    from web_rwkv_gguf_tpu.runtime.distributed import DistributedEngine

    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_layer=2, n_emb=32, head_size=8, n_vocab=64))
    )
    mode = sys.argv[2] if len(sys.argv) > 2 else "gspmd"
    if mode == "shard_map":
        # Pallas-safe TP across the cluster: model axis = the 2 local
        # devices of each process, data axis = the 2 processes (DCN)
        from web_rwkv_gguf_tpu.parallel import make_mesh
        from web_rwkv_gguf_tpu.parallel.tensor import shard_params_tp

        mesh = make_mesh(2, 2)
        params = shard_params_tp(params, mesh, info)
        eng = DistributedEngine(
            info, params, num_batch=2, token_chunk_size=32, mesh=mesh,
            tp_mode="shard_map",
        )
    else:
        eng = DistributedEngine(info, params, num_batch=2, token_chunk_size=32)
    {scenario}
    if eng.is_coordinator:
        emb_row = np.asarray(params["emb"], np.float32)[11]
        collected = run_scenario(
            eng, eng.infer, np, RnnInput, RnnInputBatch, RnnOption, emb_row
        )
        eng.shutdown()
        print("RESULT " + json.dumps(collected), flush=True)
    else:
        # in-band control: workers loop until the coordinator's stop op
        eng.serve()
    """
)


@pytest.mark.parametrize("mode", ["gspmd", "shard_map"])
def test_two_process_distributed_engine(tmp_path, mode):
    """Two real processes over DCN: mixed LAST/FULL options, a lane swap
    mid-stream (state reset broadcast in-band), a Token::Embed input, and
    in-band worker shutdown — the coordinator's outputs must match a
    single-process Engine run of the same scenario. ``shard_map`` drives
    the Pallas-safe TP forward (model axis = intra-process devices, data
    axis = processes over DCN)."""
    repo = str(Path(__file__).resolve().parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=repo, scenario=_SCENARIO))

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), mode],
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

    # single-process reference: identical scenario through the plain Engine
    sys.path.insert(0, repo + "/tests")
    import fixtures

    from web_rwkv_gguf_tpu.gguf import GgufFile
    from web_rwkv_gguf_tpu.models import load_model
    from web_rwkv_gguf_tpu.runtime import Engine, RnnInput, RnnInputBatch
    from web_rwkv_gguf_tpu.runtime.scheduler import RnnOption

    info, params = load_model(
        GgufFile(fixtures.make_v7_gguf(n_layer=2, n_emb=32, head_size=8, n_vocab=64))
    )
    eng = Engine(info, params, num_batch=2, token_chunk_size=32)
    ns: dict = {}
    exec(_SCENARIO, ns)
    emb_row = np.asarray(params["emb"], np.float32)[11]
    want = ns["run_scenario"](
        eng, eng.infer, np, RnnInput, RnnInputBatch, RnnOption, emb_row
    )
    assert got == want
