"""Cross-host continuous batching for multi-host pod slices.

Under multi-host SPMD every process must execute the same jitted program
with the same shapes each step (cf. SURVEY.md §7 "hard parts"). The
coordinator therefore:

  1. accepts requests on process 0 (the only process that needs real
     token queues),
  2. computes the chunk plan (lengths + options + token block) there,
  3. broadcasts an in-band control header + the token (or embedding)
     block to all processes over DCN
     (``multihost_utils.broadcast_one_to_all``),
  4. every process re-derives the output-redirect rows from the header
     alone and runs the identical sharded program.

Worker processes just call :meth:`serve` — the header carries an opcode,
so workers need no out-of-band call-count mirroring: they stop when the
coordinator broadcasts :data:`OP_STOP` (from :meth:`shutdown`).

Continuous batching across hosts: lanes can be swapped mid-stream — the
coordinator marks a lane with :meth:`reset_lane` when admitting a new
sequence, and the reset mask rides the same header so every process
zeroes that lane's recurrent state before the step (the reference's
chunk-level lane swap, ref: src/runtime/infer/rnn.rs:283-334, done
SPMD-safely).

On a single process the broadcast is the identity, so the same code path
is exercised by the CPU-mesh tests.
"""

from __future__ import annotations

import functools

import numpy as np

import jax

from ..models.forward import forward_chunk, init_state, logits_head
from ..models.info import ModelInfo
from .engine import RnnOutput, _bucket
from .scheduler import RnnInput, RnnOption

OP_STEP = 0
OP_STOP = 1

_OPT_CODE = {None: 0, RnnOption.LAST: 1, RnnOption.FULL: 2}


def _broadcast(arr: np.ndarray) -> np.ndarray:
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(arr))


def _redirect_rows(lens: np.ndarray, options: np.ndarray, T: int):
    """Deterministic output-redirect from header data alone (every
    process computes the same maps; ref: RnnInfo::redirect,
    src/runtime/infer/rnn.rs:41-99)."""
    rows_b, rows_t, counts = [], [], []
    for b, (ln, opt) in enumerate(zip(lens, options)):
        ln = int(ln)
        if opt == 0 or ln == 0:
            counts.append(0)
        elif opt == 1:  # LAST
            rows_b.append(b)
            rows_t.append(ln - 1)
            counts.append(1)
        else:  # FULL
            rows_b.extend([b] * ln)
            rows_t.extend(range(ln))
            counts.append(ln)
    return rows_b, rows_t, counts


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
        tp_mode: str = "gspmd",
    ):
        import jax.numpy as jnp

        from ..errors import EngineError

        if tp_mode not in ("gspmd", "shard_map"):
            raise EngineError(f"unknown tp_mode {tp_mode!r}")
        self.info = info
        self.params = params
        self.num_batch = num_batch
        self.token_chunk_size = token_chunk_size
        self.is_coordinator = jax.process_index() == 0
        self._pending_reset = np.zeros(num_batch, bool)

        state = init_state(info, num_batch)
        fresh = init_state(info, num_batch)  # distinct buffers: `state`
        # is donated through the forward, the template must survive
        if mesh is not None:
            from ..parallel import shard_state

            state = shard_state(state, mesh)
            fresh = shard_state(fresh, mesh)
        self.state = state
        self._fresh = fresh
        self._jnp = jnp
        if tp_mode == "shard_map":
            # Pallas-safe cross-host serving: GSPMD cannot partition a
            # pallas_call, so the forward runs under shard_map with every
            # device holding its local weight shard as a plain array
            # (parallel/tensor.py module docstring). ``params`` must be
            # placed with shard_params_tp(mesh).
            if mesh is None:
                raise EngineError("tp_mode='shard_map' requires a mesh")
            from ..parallel.tensor import make_tp_forward, make_tp_head

            self._forward = make_tp_forward(
                info, mesh, params, full_output=True
            )
            self._forward_embeds = make_tp_forward(
                info, mesh, params, full_output=True, input_embeds=True
            )
            self._head = make_tp_head(mesh, params)
        else:
            self._forward = jax.jit(
                functools.partial(forward_chunk, info), donate_argnums=(1,)
            )
            self._forward_embeds = jax.jit(
                lambda params, state, embeds, lengths: forward_chunk(
                    info, params, state, None, lengths, input_embeds=embeds
                ),
                donate_argnums=(1,),
            )
            self._head = jax.jit(logits_head)

        def _reset(state, fresh, mask):
            def leaf(a, f):
                m = mask.reshape((1, -1) + (1,) * (a.ndim - 2))
                return jnp.where(m, f, a)

            return jax.tree.map(leaf, state, fresh)

        self._reset = jax.jit(_reset)

    # -- admission ---------------------------------------------------------

    def reset_lane(self, batch: int):
        """Mark a lane for state reset before the next chunk (coordinator
        only) — used when admitting a new sequence into a drained lane."""
        self._pending_reset[batch] = True

    # -- coordinated stepping ----------------------------------------------

    def infer(self, input: RnnInput | None) -> RnnOutput | None:
        """One coordinated chunk (coordinator passes the live input;
        legacy workers may still call this with ``None`` to mirror
        manually, but :meth:`serve` is the supported worker loop)."""
        B = self.num_batch
        if self.is_coordinator:
            assert input is not None and len(input.batches) == B
            plan = input.plan()
            lens = np.asarray([p.len for p in plan], np.int32)
            opts = np.asarray([_OPT_CODE[p.option] for p in plan], np.int32)
            T = _bucket(max(int(lens.max()), 1), self.token_chunk_size)
            has_embeds = any(
                not isinstance(t, (int, np.integer))
                for batch, p in zip(input.batches, plan)
                for t in batch.tokens[: p.len]
            )
            header = np.concatenate(
                [[OP_STEP, T, int(has_embeds)], lens, opts,
                 self._pending_reset.astype(np.int32)]
            ).astype(np.int32)
        else:
            plan = None
            header = np.zeros(3 + 3 * B, np.int32)

        out = self._step(header, input, plan)
        if self.is_coordinator:
            self._pending_reset[:] = False
        return out

    def shutdown(self):
        """Broadcast the in-band stop opcode so :meth:`serve` loops on
        every worker return (coordinator only)."""
        header = np.zeros(3 + 3 * self.num_batch, np.int32)
        header[0] = OP_STOP
        _broadcast(header)

    def serve(self):
        """Worker loop: execute coordinated chunks until the coordinator
        broadcasts stop. Workers need no knowledge of the request
        stream — all control is in-band."""
        assert not self.is_coordinator
        while self._step(np.zeros(3 + 3 * self.num_batch, np.int32),
                         None, None) is not StopIteration:
            pass

    def _step(self, header, input, plan):
        jnp = self._jnp
        B = self.num_batch
        header = _broadcast(header)
        if int(header[0]) == OP_STOP:
            return StopIteration
        T = int(header[1])
        has_embeds = bool(header[2])
        lens_arr = header[3 : 3 + B]
        options = header[3 + B : 3 + 2 * B]
        resets = header[3 + 2 * B :]

        if resets.any():
            self.state = self._reset(
                self.state, self._fresh, jnp.asarray(resets, bool)
            )

        if lens_arr.sum() == 0:
            return None if not self.is_coordinator else RnnOutput(
                [np.zeros((0, self.info.num_vocab), np.float32)] * B
            )

        if has_embeds:
            C = self.info.num_emb
            if self.is_coordinator:
                if not hasattr(self, "_emb_np"):
                    self._emb_np = np.asarray(self.params["emb"], np.float32)
                embeds = np.zeros((B, T, C), np.float32)
                for b, (batch, p) in enumerate(zip(input.batches, plan)):
                    for t, tok in enumerate(batch.tokens[: p.len]):
                        if isinstance(tok, (int, np.integer)):
                            embeds[b, t] = self._emb_np[int(tok)]
                        else:
                            embeds[b, t] = np.asarray(tok, np.float32)
            else:
                embeds = np.zeros((B, T, C), np.float32)
            embeds = _broadcast(embeds)
            x, self.state = self._forward_embeds(
                self.params, self.state, jnp.asarray(embeds),
                jnp.asarray(lens_arr, jnp.int32),
            )
        else:
            if self.is_coordinator:
                tokens = np.zeros((B, T), np.int32)
                for b, (batch, p) in enumerate(zip(input.batches, plan)):
                    tokens[b, : p.len] = batch.tokens[: p.len]
            else:
                tokens = np.zeros((B, T), np.int32)
            tokens = _broadcast(tokens)
            x, self.state = self._forward(
                self.params, self.state, jnp.asarray(tokens),
                jnp.asarray(lens_arr, jnp.int32),
            )

        # redirect rows derived from the header on EVERY process (same
        # shapes -> same program); padded to a bucket for jit stability
        rows_b, rows_t, counts = _redirect_rows(lens_arr, options, T)
        if not rows_b:
            if self.is_coordinator:
                input.step(plan)
                return RnnOutput(
                    [np.zeros((0, self.info.num_vocab), np.float32)] * B
                )
            return None

        n = len(rows_b)
        npad = _bucket(n, 1 << 30)
        bi = np.zeros(npad, np.int32)
        ti = np.zeros(npad, np.int32)
        bi[:n] = rows_b
        ti[:n] = rows_t
        rows = x[jnp.asarray(bi), jnp.asarray(ti)]
        logits = self._head(self.params, rows)

        if not self.is_coordinator:
            return None
        input.step(plan)
        host_logits = np.asarray(logits)[:n]
        out, off = [], 0
        for c in counts:
            out.append(host_logits[off : off + c])
            off += c
        return RnnOutput(out)
