"""Chunk scheduler tests — the same cases as the reference's
`test_run_iter` / `test_advance` / `test_redirect`
(ref: src/runtime/infer/rnn.rs:362-569)."""

from web_rwkv_gguf_tpu.runtime import (
    RnnInput,
    RnnInputBatch,
    RnnIter,
    RnnOption,
    redirect,
)


def _mk(batches, chunk):
    return RnnInput(
        [RnnInputBatch([0] * n, opt) for n, opt in batches], token_chunk_size=chunk
    )


def _plans(plan):
    return [(p.len, p.option) for p in plan]


L, F = RnnOption.LAST, RnnOption.FULL


def test_run_iter():
    run = _mk([(139, L), (1, L), (0, F), (65, F)], 128)
    it = RnnIter(run)
    assert _plans(next(it)) == [(65, None), (1, L), (0, F), (62, F)]
    assert _plans(next(it)) == [(60, None), (1, L), (0, F), (3, F)]
    assert _plans(next(it)) == [(14, L), (1, L), (0, F), (1, F)]
    assert _plans(next(it)) == [(1, L), (1, L), (0, F), (1, F)]
    assert _plans(next(it)) == [(1, L), (1, L), (0, F), (1, F)]


def test_advance():
    run = _mk([(139, L), (1, L), (0, F), (65, F)], 128)
    run.step()
    assert _plans(run.plan()) == [(61, None), (0, L), (0, F), (3, F)]

    run = _mk([(61, L), (1, L), (0, F), (3, F)], 128)
    assert _plans(run.plan()) == [(60, None), (1, L), (0, F), (3, F)]


def test_redirect():
    run = _mk([(61, L), (0, L), (0, F), (3, F)], 128)
    r = redirect(run.plan())
    assert r.headers == [60, 61, 62, 63]
    assert r.inputs == [(0, 61), (61, 61), (61, 61), (61, 64)]
    assert r.outputs == [(0, 1), (1, 1), (1, 1), (1, 4)]

    run = _mk(
        [(11, L), (8, L), (9, L), (4, L), (11, L), (8, L), (9, L), (4, L)], 32
    )
    r = redirect(run.plan())
    assert r.headers == [15, 31]
    assert r.inputs == [
        (0, 4), (4, 8), (8, 12), (12, 16), (16, 20), (20, 24), (24, 28), (28, 32),
    ]
    assert r.outputs == [
        (0, 0), (0, 0), (0, 0), (0, 1), (1, 1), (1, 1), (1, 1), (1, 2),
    ]


def test_min_chunk_rounding():
    run = RnnInput([RnnInputBatch([0] * 5)], token_chunk_size=1)
    assert run.token_chunk_size == 32
    run = RnnInput([RnnInputBatch([0] * 5)], token_chunk_size=33)
    assert run.token_chunk_size == 64


def test_plan_properties_randomized():
    """Property checks across random workloads: plans conserve tokens,
    respect the chunk budget and the 32-multiple rule, and assign output
    options correctly."""
    import numpy as np

    rng = np.random.default_rng(0)
    for _ in range(200):
        n_batch = int(rng.integers(1, 6))
        lens = [int(rng.integers(0, 90)) for _ in range(n_batch)]
        opts = [L if rng.random() < 0.7 else F for _ in range(n_batch)]
        chunk = int(rng.choice([32, 64, 128]))
        run = RnnInput(
            [RnnInputBatch([0] * n, o) for n, o in zip(lens, opts)], chunk
        )
        total = run.num_token
        consumed = 0
        for _ in range(64):
            if run.num_token == 0:
                break
            plan = run.plan()
            planned = sum(p.len for p in plan)
            assert planned <= chunk
            if min(planned, total - consumed) > 32:
                assert planned % 32 == 0
            for p, o, n_before in zip(plan, opts, lens):
                if o == F and p.len > 0:
                    assert p.option == F
            run.step(plan)
            consumed += planned
        assert consumed == total
        assert run.num_token == 0
