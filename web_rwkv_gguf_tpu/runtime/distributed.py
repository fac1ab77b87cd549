"""Cross-host continuous batching for multi-host pod slices.

Under multi-host SPMD every process must execute the same jitted program
with the same shapes each step (cf. SURVEY.md §7 "hard parts"). The
coordinator therefore:

  1. accepts requests on process 0 (the only process that needs real
     token queues),
  2. computes the chunk plan (lengths + token block) there,
  3. broadcasts ``(tokens[B,T], lengths[B])`` to all processes over DCN
     (``multihost_utils.broadcast_one_to_all``), and
  4. every process then runs the identical sharded forward; logits land
     replicated (or vocab-sharded) and are read on process 0.

On a single process the broadcast is the identity, so the same code path
is exercised by the CPU-mesh tests.
"""

from __future__ import annotations

import numpy as np

import jax

from ..models.forward import forward_chunk, init_state, logits_head
from ..models.info import ModelInfo
from .engine import RnnOutput, _bucket
from .scheduler import RnnInput, RnnOption


def _broadcast(arr: np.ndarray) -> np.ndarray:
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(arr))


class DistributedEngine:
    """Engine variant whose chunk plans are agreed across hosts.

    ``mesh``/shardings are prepared by the caller (``parallel.shard_params``
    etc.); this class only coordinates planning and execution order.
    """

    def __init__(
        self,
        info: ModelInfo,
        params,
        num_batch: int,
        *,
        mesh=None,
        token_chunk_size: int = 128,
    ):
        import functools

        import jax.numpy as jnp

        self.info = info
        self.params = params
        self.num_batch = num_batch
        self.token_chunk_size = token_chunk_size
        self.is_coordinator = jax.process_index() == 0

        state = init_state(info, num_batch)
        if mesh is not None:
            from ..parallel import shard_state

            state = shard_state(state, mesh)
        self.state = state
        self._jnp = jnp
        self._forward = jax.jit(
            functools.partial(forward_chunk, info), donate_argnums=(1,)
        )
        self._head = jax.jit(logits_head)

    def infer(self, input: RnnInput | None) -> RnnOutput | None:
        """One coordinated chunk. Non-coordinator processes pass
        ``input=None`` and receive ``None`` (logits are only materialized
        on process 0). All processes must make the same number of infer
        calls per request stream — drive workers from the same request
        metadata (or broadcast a done flag at a higher level)."""
        jnp = self._jnp
        B = self.num_batch

        if self.is_coordinator:
            assert input is not None and len(input.batches) == B
            plan = input.plan()
            lens = [p.len for p in plan]
            T = _bucket(max(max(lens), 1), self.token_chunk_size)
            tokens = np.zeros((B, T), np.int32)
            for b, (batch, p) in enumerate(zip(input.batches, plan)):
                tokens[b, : p.len] = batch.tokens[: p.len]
            header = np.concatenate([[T], lens]).astype(np.int32)
        else:
            plan = None
            header = np.zeros(1 + B, np.int32)

        header = _broadcast(header)
        T = int(header[0])
        lens_arr = header[1:]
        if T == 0 or lens_arr.sum() == 0:
            return None if not self.is_coordinator else RnnOutput(
                [np.zeros((0, self.info.num_vocab), np.float32)] * B
            )

        if not self.is_coordinator:
            tokens = np.zeros((B, T), np.int32)
        tokens = _broadcast(tokens)

        x, self.state = self._forward(
            self.params, self.state, jnp.asarray(tokens),
            jnp.asarray(lens_arr, jnp.int32),
        )

        # every process computes the (cheap) last-row logits so the
        # program is identical; only the coordinator materializes them
        rows = x[jnp.arange(B), jnp.clip(jnp.asarray(lens_arr) - 1, 0, T - 1)]
        logits = self._head(self.params, rows)

        if not self.is_coordinator:
            return None
        input.step(plan)
        host_logits = np.asarray(logits)
        out = []
        for b, p in enumerate(plan):
            if p.option == RnnOption.LAST and p.len > 0:
                out.append(host_logits[b : b + 1])
            else:
                out.append(np.zeros((0, self.info.num_vocab), np.float32))
        return RnnOutput(out)
