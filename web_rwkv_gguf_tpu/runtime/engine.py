"""Inference engine: chunked continuous batching over jit-cached dense
chunks.

Replaces the reference's ``TokioRuntime`` speculative job pipeline
(ref: src/runtime/mod.rs:84-219): JAX dispatch is asynchronous, so the
host loop plans the next chunk while the device executes the current one,
and compiled programs cached per ``(B, T-bucket)`` play the role of the
reference's job cache keyed by token count. Chunk lengths are bucketed to
powers of two to bound recompiles (cf. the reference's own perf note on
chunk-size-keyed pipelines, performance-review.md:16-24).
"""

from __future__ import annotations

import functools
import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import EngineError, TensorError, UnsupportedFeature
from ..models.forward import forward_chunk, init_state, logits_head
from ..models.info import ModelInfo
from .scheduler import RnnInput, RnnInputBatch, RnnOption


# serializes Engine._precision_scope (see its docstring)
_PRECISION_LOCK = threading.RLock()


def auto_prefill_dense(
    extra_bytes: int, memory_stats: dict | None, platform: str
) -> bool:
    """Default policy for ``Engine(prefill_dense=None)``: cache dense
    bf16 prefill weights when the extra HBM clearly fits — quantized +
    dense + headroom under ~60% of device memory.

    The limit comes from ``memory_stats()['bytes_limit']`` when the
    backend reports it. TPUs that don't (this environment's tunnel
    returns ``{}``) fall back to an 8 GiB floor — the smallest HBM of
    any TPU core generation (v2: 8 GiB/core), so the policy cannot
    overcommit an older part that hides its stats. On NON-TPU backends
    an unknown limit stays conservative (no dense cache): a
    guessed-large limit could OOM a small device at Engine construction
    with no opt-in."""
    limit = int((memory_stats or {}).get("bytes_limit", 0))
    if not limit and platform == "tpu":
        limit = 8 << 30
    return limit > 0 and extra_bytes > 0 and 2.3 * extra_bytes < 0.6 * limit


# smallest decode batch at which the default accuracy class flips to
# plain-bf16 dequant rounding. Measured B=16 A/B on the 0.1B Q4_K config
# (scripts/bench_b16_dense_ab.py, 2026-08-21 in-session): quantized
# FMA-precise 13.7k, quantized plain-bf16 16.5k, DENSE bf16 weights
# 13.3k tok/s — so at high batch the win is the ROUNDING CLASS (~2^-9,
# the reference's own f16-dequant class), NOT dense residents (dense
# decode stays weight-DMA-bound and loses even at B=16; a measured dead
# end, recorded in CLAUDE.md).
DECODE_FAST_MIN_B = 16

# smallest decode batch at which Engine(decode_dense=None) auto-promotes
# to dense bf16 residents served through the fused kernel's plain-dot
# branch (quantized arrays stay as the cold copy). Measured in-session
# crossover (2026-08-21, fused-vs-fused back-to-back A/B against the
# rebuilt NARROW quantized path): quantized wins B<=2 (b1 5.0k vs 2.6k,
# b2 7.3k vs 5.1k) and ties at B=4 (9.4k vs 9.2k — quantized keeps ~3x
# less HBM, so it stays); dense wins decisively from B=8
# (15.8k vs 12.2k) and B=16 (22.9k vs 16.5k plain-bf16 / 13.4k exact).
DECODE_DENSE_MIN_B = 8


def auto_decode_dense(
    num_batch: int, extra_bytes: int, memory_stats: dict | None,
    platform: str,
) -> bool:
    """Default policy for ``Engine(decode_dense=None)``: serve dense
    bf16 residents through the fused kernel's plain-dot branch when the
    batch is at/above ``DECODE_DENSE_MIN_B`` AND the dense copy clearly
    fits in HBM (same fit rule as :func:`auto_prefill_dense`).

    Accuracy class: bf16-rounded weights (~2^-8) — the same class as
    the reference engine, which dequantizes K-quants to f16 at load
    (ref: gguf.rs:1785). ``Engine(decode_dense=False)`` restores the
    quantized FMA-exact path at any batch."""
    return num_batch >= DECODE_DENSE_MIN_B and auto_prefill_dense(
        extra_bytes, memory_stats, platform
    )


def auto_decode_precise(num_batch: int, default: bool = True) -> bool:
    """Default policy for ``Engine(decode_precise=None)``: batches at or
    above ``DECODE_FAST_MIN_B`` serve the plain-bf16 dequant rounding
    class (~2^-9 — the accuracy class of the reference engine's
    f16-dequant shaders), which is ~1.2x faster at B=16 where serving
    throughput matters most; smaller batches keep the process default
    (FMA-exact double-bf16, ~2^-16). ``Engine(decode_precise=True)``
    restores the exact class at any batch."""
    if num_batch >= DECODE_FAST_MIN_B:
        return False
    return default


def _bucket(n: int, cap: int) -> int:
    """Round up to the next power of two (≤ cap) to bound jit recompiles."""
    b = 1
    while b < n:
        b *= 2
    return min(b, cap) if cap >= n else n


@dataclass
class RnnOutput:
    """Per-batch logit rows: list of ``[n_out, vocab]`` f32 arrays (empty
    when a batch produced no logits this chunk)."""

    batches: list[np.ndarray]

    def __getitem__(self, i):
        return self.batches[i]

    def __len__(self):
        return len(self.batches)


@jax.jit
def _softmax(x):
    return jax.nn.softmax(x, axis=-1)


def softmax(logits) -> np.ndarray:
    """GPU softmax helper (ref: src/runtime/softmax.rs)."""
    return np.asarray(_softmax(jnp.asarray(logits)))


class Engine:
    """Stateful batched inference over one loaded model.

    The engine owns the recurrent state for ``num_batch`` lanes (like the
    reference's ``Bundle``); ``infer`` consumes one chunk of the input per
    call, returning logits per the per-batch output option.
    """

    def __init__(
        self,
        info: ModelInfo,
        params,
        num_batch: int,
        *,
        token_chunk_size: int = 128,
        rescale: int | None = None,
        initial_wkv: np.ndarray | None = None,
        mesh=None,
        unroll: bool | None = None,
        hooks: dict | None = None,
        tp_mode: str = "gspmd",
        prefill_dense: bool | None = None,
        prefill_dense_min_t: int = 64,
        seq_parallel: bool = False,
        seq_parallel_min_t: int = 64,
        pipeline_microbatches: int | None = None,
        decode_precise: bool | None = None,
        decode_dense: bool | None = None,
    ):
        if tp_mode not in ("gspmd", "shard_map"):
            raise EngineError(f"unknown tp_mode {tp_mode!r}")
        # warm restarts reload compiled decode/prefill programs from disk
        # (5-7 s of XLA compile per (format, B) config otherwise;
        # WEB_RWKV_TPU_CACHE=0 disables)
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        # Decode accuracy class for batches above config.scan_wide_batch
        # (8) lanes: True (the config default) keeps the double-bf16
        # correction (~2^-16, FMA-class); False selects plain-bf16
        # dequant rounding (~2^-9, the XLA-fallback / reference-f16
        # class) for maximum wide-batch throughput. Narrow batches
        # (B <= scan_wide_batch) are exact either way.
        # PER-ENGINE: the flag is applied as a scoped trace-time value
        # around this engine's jit INVOCATIONS (_precision_scope), so
        # engines with different settings coexist in one process — each
        # engine's jit objects trace under its own value and the module
        # global is never left mutated. Default engines SNAPSHOT the
        # process default at construction, so a concurrent scoped
        # engine's temporarily-set value can never leak into their
        # retraces (round-5 fix; the scope lock covers only dispatch,
        # not host fetches, so pooled engines don't serialize on it).
        from ..ops.pallas import config as _pcfg

        self._decode_precise = (
            auto_decode_precise(num_batch, _pcfg.wide_precise)
            if decode_precise is None
            else bool(decode_precise)
        )
        self.info = info
        # device memory info for the dense-resident auto policy
        try:
            dev = jax.devices()[0]
            _mem_stats = dev.memory_stats()
            _platform = dev.platform
        except Exception:  # backends without memory_stats
            _mem_stats, _platform = None, ""

        # Decode-side dense residents: AUTO at batch >= DECODE_DENSE_MIN_B
        # when HBM fits (round 5). The round-4 "dense loses at B=16"
        # measurement (13.3k vs 13.7k) was on the COMPOSED dense path —
        # the fused layer-scan kernel's dense plain-dot branch flips it
        # (see the DECODE_DENSE_MIN_B crossover table above). Small
        # batches stay quantized: decode is weight-DMA-bound there and
        # dense is ~2.9x the bytes. The quantized arrays stay resident
        # as the cold copy (params_quantized).
        self.params_quantized = None
        if decode_dense is None and mesh is None:
            from ..models.loader import dense_cache_bytes
            from ..ops.pallas.layer7 import scan_batch_slice

            # the policy's win is the fused kernel's dense plain-dot
            # branch — never auto-promote a config the layer-scan kernel
            # won't serve (B above the scan cap, mixed per-layer stacks,
            # Pallas off): composed-dense decode is the measured dead end
            decode_dense = (
                auto_decode_dense(
                    num_batch, dense_cache_bytes(params), _mem_stats,
                    _platform,
                )
                and scan_batch_slice(num_batch) is not None
                and _pcfg.use_pallas()
                and not isinstance(params.get("blocks"), list)
            )
        if decode_dense and mesh is None:
            from ..models.loader import densify_matrices

            self.params_quantized = params
            params = densify_matrices(params)
            prefill_dense = False  # already dense — no separate cache
        # per-layer (unrolled) weight buffers avoid the lax.scan
        # dynamic-slice copy of every layer's weights per decode step
        # (models/loader.py::unroll_params); default on for single-device
        # engines, off under a mesh (sharding needs the stacked form)
        if unroll is None:
            unroll = mesh is None
        if unroll and mesh is None and not isinstance(params.get("blocks"), list):
            from ..models.loader import prepare_decode

            params = prepare_decode(params, info, batch_hint=num_batch)
        self.params = params
        self.num_batch = num_batch
        self.token_chunk_size = token_chunk_size
        self.mesh = mesh
        # prefill against cached dense weights (models.loader.
        # densify_matrices): prefill is MXU-bound, so the dense copies
        # remove per-chunk dequant work; decode chunks (T below the
        # threshold) keep the DMA-light quantized arrays
        self._params_prefill = None
        self._prefill_min_t = prefill_dense_min_t
        if prefill_dense is None and mesh is None:
            # automatic policy: cache dense bf16 prefill weights when the
            # extra HBM clearly fits. The dense cache is the >1x-of-dense
            # prefill answer (direct-quantized prefill is structurally
            # capped near dense speed — the expansion is extra MXU tile
            # work), so take it whenever quantized + dense + headroom
            # stays under ~60% of device memory.
            from ..models.loader import dense_cache_bytes

            prefill_dense = auto_prefill_dense(
                dense_cache_bytes(params), _mem_stats, _platform
            )
        if prefill_dense and mesh is None:
            from ..models.loader import densify_matrices

            self._params_prefill = densify_matrices(params)
        # fused-generator / prefill-sampler caches: make_generator
        # returns a fresh jit each call, so an uncached generate() would
        # RETRACE the whole steps-long scan every invocation (hundreds
        # of ms against a ~25 ms segment) — keyed per sampling config
        self._gen_cache: dict = {}
        self._sampler_cache: dict = {}
        self.state = init_state(info, num_batch)
        if mesh is not None:
            from ..parallel import shard_state

            self.state = shard_state(self.state, mesh)
        if initial_wkv is not None:
            if "wkv" not in self.state:
                raise UnsupportedFeature(
                    "initial_wkv (pretrained time_state) needs a "
                    "matrix-state model (V5/V6/V7); V4 carries "
                    "per-channel (aa, bb, pp) state"
                )
            # pretrained time_state: [L, H, K, V] broadcast over batch lanes
            wkv = jnp.asarray(initial_wkv)[:, None]
            self.state["wkv"] = jnp.broadcast_to(
                wkv, self.state["wkv"].shape
            ).astype(jnp.float32)
        self._initial_wkv = initial_wkv

        # optional model-structure hooks compiled into every forward (the
        # reference's Bundle::new_with_hooks, used by the othello/puzzle15
        # game examples); hooks bind at trace time, so they cost nothing
        # when absent
        self._hooks = hooks
        self._forward = jax.jit(
            functools.partial(forward_chunk, info, rescale=rescale, hooks=hooks),
            donate_argnums=(1,),
        )
        self._forward_embeds = jax.jit(
            lambda params, state, embeds, lengths: forward_chunk(
                info, params, state, None, lengths,
                rescale=rescale, input_embeds=embeds, hooks=hooks,
            ),
            donate_argnums=(1,),
        )

        # fused variant for all-LAST chunks (decode): one launch computes
        # the forward AND each lane's last-token logits
        def _fwd_last(params, state, tokens, lengths):
            x, state = forward_chunk(
                info, params, state, tokens, lengths, rescale=rescale,
                hooks=hooks,
            )
            B, T = tokens.shape
            idx = jnp.clip(lengths - 1, 0, T - 1)
            rows = x[jnp.arange(B), idx]
            return logits_head(params, rows, hooks=hooks), state

        self._forward_last = jax.jit(_fwd_last, donate_argnums=(1,))
        self._head = jax.jit(functools.partial(logits_head, hooks=hooks))

        # sequence-parallel prefill (parallel/sequence.py): long
        # full-length chunks shard their TIME axis over the model axis —
        # devices exchange only O(H*K^2) per-layer affine state maps.
        # Routed automatically in infer() when a chunk qualifies (every
        # lane full-length, T divisible by axis*16, no hooks/embeds).
        self._spf = None
        self._sp_min_t = seq_parallel_min_t
        if seq_parallel:
            if mesh is None:
                raise EngineError("seq_parallel requires a mesh")
            if hooks:
                raise UnsupportedFeature(
                    "hooks are not supported on the seq-parallel prefill path"
                )
            from ..parallel.sequence import make_seq_parallel_prefill

            self._spf = make_seq_parallel_prefill(info, mesh, axis="model")
            self._sp_axis = mesh.shape["model"]

        # pipeline parallelism (parallel/pipeline.py): the layer stack
        # shards over the model axis; engine lanes are grouped into
        # microbatches (lane m*B_mb + b = microbatch m, slot b) that flow
        # through the GPipe ppermute schedule. The engine-facing state
        # layout stays [L, num_batch, ...]; conversion is a pure reshape.
        self._ppf = None
        if pipeline_microbatches:
            if mesh is None:
                raise EngineError("pipeline_microbatches requires a mesh")
            if hooks:
                raise UnsupportedFeature(
                    "hooks are not supported on the pipeline path"
                )
            if num_batch % pipeline_microbatches:
                raise EngineError("num_batch must divide by microbatches")
            from ..parallel.pipeline import make_pipeline_forward

            self._ppf = make_pipeline_forward(
                info, mesh, axis="model",
                num_microbatch=pipeline_microbatches,
            )
            self._pp_m = pipeline_microbatches

        # explicit shard_map tensor parallelism (parallel/tensor.py):
        # per-device local shards keep the Pallas kernels usable on real
        # multi-chip TPU; collectives are explicit ICI all_gathers. The
        # GSPMD default relies on XLA's partitioner instead.
        if mesh is not None and tp_mode == "shard_map":
            from ..parallel.tensor import make_tp_forward, shard_params_tp

            self.params = params = shard_params_tp(params, mesh, info)
            self._forward_last = make_tp_forward(
                info, mesh, params, rescale=rescale, hooks=hooks
            )
            self._forward = make_tp_forward(
                info, mesh, params, rescale=rescale, full_output=True,
                hooks=hooks,
            )
            fwd_emb = make_tp_forward(
                info, mesh, params, rescale=rescale, full_output=True,
                hooks=hooks, input_embeds=True,
            )
            self._forward_embeds = (
                lambda params, state, embeds, lengths:
                fwd_emb(params, state, embeds, lengths)
            )

    def _precision_scope(self):
        """Scoped trace-time application of this engine's decode
        precision: jit retraces happen inside jit invocations, so
        setting the config only for their duration gives per-engine
        semantics (each engine's jit objects cache programs traced under
        its own value; cached executions don't read the flag at all).
        A process-wide lock serializes these scopes — without it, two
        engines inferring from different THREADS could interleave: one
        engine's retrace would read the other's value and permanently
        cache the wrong accuracy class. EVERY engine scopes (default
        engines snapshot the process default at construction), and the
        scope wraps only jit dispatch — never host fetches — so pooled
        engines contend only for microseconds."""
        import contextlib

        from ..ops.pallas import config as _pcfg

        @contextlib.contextmanager
        def scope():
            with _PRECISION_LOCK:
                prev = _pcfg.wide_precise
                _pcfg.wide_precise = self._decode_precise
                try:
                    yield
                finally:
                    _pcfg.wide_precise = prev

        return scope()

    def _scoped(self, fn, *args, **kwargs):
        """Invoke a jitted entry point under this engine's precision
        scope (see :meth:`_precision_scope`)."""
        with self._precision_scope():
            return fn(*args, **kwargs)

    # -- state management (ref: State trait, src/runtime/model.rs:78-103) --

    def back_state(self, batch: int) -> dict:
        """Read one lane's recurrent state to host (checkpoint/retry)."""
        return jax.tree.map(lambda a: np.asarray(a[:, batch]), self.state)

    def load_state(self, batch: int, snapshot: dict):
        """Restore one lane's state from :meth:`back_state`."""
        self.state = jax.tree.map(
            lambda a, s: a.at[:, batch].set(jnp.asarray(s)), self.state, snapshot
        )

    def reset_state(self, batch: int | None = None):
        fresh = init_state(self.info, self.num_batch)
        if self._initial_wkv is not None:
            wkv = jnp.asarray(self._initial_wkv)[:, None]
            fresh["wkv"] = jnp.broadcast_to(wkv, fresh["wkv"].shape).astype(jnp.float32)
        if batch is None:
            self.state = fresh
        else:
            self.state = jax.tree.map(
                lambda a, f: a.at[:, batch].set(f[:, batch]), self.state, fresh
            )

    # -- inference ---------------------------------------------------------

    def infer(self, input: RnnInput) -> RnnOutput:
        """Process one chunk of ``input`` (tokens are consumed in place).

        Mirrors ``Runtime::infer`` (ref: src/runtime/mod.rs:267-276): call
        repeatedly until every batch is drained / generation is driven by
        pushing sampled tokens back into the input lanes.
        """
        return self._infer_impl(input)

    def _infer_impl(self, input: RnnInput) -> RnnOutput:
        if len(input.batches) != self.num_batch:
            raise TensorError.batch(len(input.batches), self.num_batch)
        plan = input.plan()
        lens = [p.len for p in plan]
        n_tok = sum(lens)
        if n_tok == 0:
            return RnnOutput([np.zeros((0, self.info.num_vocab), np.float32)] * self.num_batch)

        T = _bucket(max(lens), self.token_chunk_size)
        has_embeds = any(
            not isinstance(t, (int, np.integer))
            for batch, p in zip(input.batches, plan)
            for t in batch.tokens[: p.len]
        )
        lengths = jnp.asarray(lens, jnp.int32)
        fw_params = (
            self._params_prefill
            if self._params_prefill is not None and T >= self._prefill_min_t
            else self.params
        )

        # sequence-parallel routing: full-length uniform chunks of a long
        # prompt shard T across devices instead of replicating the whole
        # chunk per device
        sp_ok = (
            self._spf is not None
            and not has_embeds
            and T >= self._sp_min_t
            and T % (self._sp_axis * 16) == 0
            and all(p.len == T for p in plan)
        )

        all_last = (
            not sp_ok and self._ppf is None and not has_embeds
            and all(p.option in (None, RnnOption.LAST) for p in plan)
        )
        if all_last:
            tokens = np.zeros((self.num_batch, T), np.int32)
            for b, (batch, p) in enumerate(zip(input.batches, plan)):
                tokens[b, : p.len] = batch.tokens[: p.len]
            logits, self.state = self._scoped(
                self._forward_last,
                fw_params, self.state, jnp.asarray(tokens), lengths,
            )
            input.step(plan)
            active = [
                b for b, p in enumerate(plan)
                if p.option == RnnOption.LAST and p.len > 0
            ]
            # fetch only the active lanes' logits rows to the host — at
            # num_vocab=65536 each lane is 256 KB; a single-lane step in a
            # wide engine otherwise pays B times that per step
            if len(active) == len(plan):
                host_logits = np.asarray(logits)
            elif active:
                rows = jnp.take(logits, jnp.asarray(active, jnp.int32), axis=0)
                fetched = np.asarray(rows)
                host_logits = {b: fetched[i] for i, b in enumerate(active)}
            out = []
            for b, p in enumerate(plan):
                if p.option == RnnOption.LAST and p.len > 0:
                    if isinstance(host_logits, dict):
                        out.append(host_logits[b][None])
                    else:
                        out.append(host_logits[b : b + 1])
                else:
                    out.append(np.zeros((0, self.info.num_vocab), np.float32))
            return RnnOutput(out)

        if has_embeds:
            # Token::Embed path (ref: src/runtime/infer/mod.rs:21-56):
            # mix raw embedding vectors with table rows host-side
            if not hasattr(self, "_emb_np"):
                self._emb_np = np.asarray(self.params["emb"], np.float32)
            C = self.info.num_emb
            embeds = np.zeros((self.num_batch, T, C), np.float32)
            for b, (batch, p) in enumerate(zip(input.batches, plan)):
                for t, tok in enumerate(batch.tokens[: p.len]):
                    if isinstance(tok, (int, np.integer)):
                        embeds[b, t] = self._emb_np[int(tok)]
                    else:
                        embeds[b, t] = np.asarray(tok, np.float32)
            x, self.state = self._scoped(
                self._forward_embeds,
                fw_params, self.state, jnp.asarray(embeds), lengths,
            )
        else:
            tokens = np.zeros((self.num_batch, T), np.int32)
            for b, (batch, p) in enumerate(zip(input.batches, plan)):
                tokens[b, : p.len] = batch.tokens[: p.len]
            if sp_ok:
                x, self.state = self._scoped(
                    self._spf, fw_params, self.state, jnp.asarray(tokens)
                )
            elif self._ppf is not None:
                M = self._pp_m
                Bm = self.num_batch // M
                st_p = jax.tree.map(
                    lambda a: a.reshape(a.shape[0], M, Bm, *a.shape[2:]),
                    self.state,
                )
                x_p, st_p = self._scoped(
                    self._ppf, fw_params, st_p,
                    jnp.asarray(tokens).reshape(M, Bm, T),
                    lengths.reshape(M, Bm),
                )
                self.state = jax.tree.map(
                    lambda a: a.reshape(a.shape[0], M * Bm, *a.shape[3:]),
                    st_p,
                )
                x = x_p.reshape(M * Bm, T, x_p.shape[-1])
            else:
                x, self.state = self._scoped(
                    self._forward, fw_params, self.state,
                    jnp.asarray(tokens), lengths,
                )

        # gather logit-producing rows (dense-layout redirect)
        rows_b, rows_t, counts = [], [], []
        for b, p in enumerate(plan):
            if p.option is None or p.len == 0:
                counts.append(0)
            elif p.option == RnnOption.LAST:
                rows_b.append(b)
                rows_t.append(p.len - 1)
                counts.append(1)
            else:  # FULL
                rows_b.extend([b] * p.len)
                rows_t.extend(range(p.len))
                counts.append(p.len)

        input.step(plan)

        if not rows_b:
            return RnnOutput([np.zeros((0, self.info.num_vocab), np.float32)] * self.num_batch)

        n = len(rows_b)
        npad = _bucket(n, 1 << 30)
        bi = np.zeros(npad, np.int32)
        ti = np.zeros(npad, np.int32)
        bi[:n] = rows_b
        ti[:n] = rows_t
        rows = x[jnp.asarray(bi), jnp.asarray(ti)]
        logits = np.asarray(self._scoped(self._head, self.params, rows))[:n]

        out, off = [], 0
        for c in counts:
            out.append(logits[off : off + c])
            off += c
        return RnnOutput(out)

    # -- fused generation --------------------------------------------------

    def _gen_prefill(self, prompts, temperature, top_k, top_p, seed,
                     device=False):
        """Prefill the prompts and sample the first generated token with
        the SAME on-device sampler as the fused segment loop (greedy /
        temperature / top-k / nucleus, jax PRNG). Returns
        ``(first [B, 1] int32, key)`` — a host numpy array, or (with
        ``device=True``) the un-fetched device array so pooled engines
        can dispatch every group's prefill before any fetch."""
        from ..models.generate import make_sampler

        if len(prompts) != self.num_batch:
            raise TensorError.batch(len(prompts), self.num_batch)
        if any(len(p) == 0 for p in prompts):
            raise EngineError(
                "generate() requires a non-empty prompt per lane "
                "(there are no logits to sample the first token from)"
            )
        inp = RnnInput(
            [RnnInputBatch(list(p)) for p in prompts], self.token_chunk_size
        )
        key = jax.random.key(seed)
        key, sub = jax.random.split(key)
        skey = (temperature, top_k, top_p)
        sample = self._sampler_cache.get(skey)
        if sample is None:
            sample = jax.jit(make_sampler(temperature, top_k, top_p))
            self._sampler_cache[skey] = sample

        if self._ppf is None and self._spf is None:
            # lean path: logits stay ON DEVICE (generation only needs the
            # sampled ids) — the infer() loop would fetch every lane's
            # [V] logits row to the host (B=16, V=65536: 4 MB over this
            # environment's ~25 ms-RTT tunnel) and re-upload them to
            # sample; here only the B sampled int32s cross the link
            logits_dev = None
            while inp.num_token:
                plan = inp.plan()
                lens = [p.len for p in plan]
                if sum(lens) == 0:
                    break
                T = _bucket(max(lens), self.token_chunk_size)
                tokens = np.zeros((self.num_batch, T), np.int32)
                for b, (batch, p) in enumerate(zip(inp.batches, plan)):
                    tokens[b, : p.len] = batch.tokens[: p.len]
                fw = (
                    self._params_prefill
                    if self._params_prefill is not None
                    and T >= self._prefill_min_t
                    else self.params
                )
                lg, self.state = self._scoped(
                    self._forward_last, fw, self.state,
                    jnp.asarray(tokens), jnp.asarray(lens, jnp.int32),
                )
                upd = jnp.asarray(
                    [p.len > 0 for p in plan], jnp.bool_
                )[:, None]
                logits_dev = (
                    lg if logits_dev is None
                    else jnp.where(upd, lg, logits_dev)
                )
                inp.step(plan)
            first_dev = sample(logits_dev, sub)[:, None]
            if device:
                return first_dev, key
            return np.asarray(first_dev, np.int32), key

        last_logits = [None] * self.num_batch
        while inp.num_token:
            out = self.infer(inp)
            for b in range(self.num_batch):
                if len(out[b]):
                    last_logits[b] = out[b][-1]
        first = np.asarray(
            sample(jnp.asarray(np.stack(last_logits)), sub), np.int32
        )[:, None]
        return first, key

    def generate(
        self,
        prompts: list[list[int]],
        max_tokens: int,
        *,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 0.0,
        stop_tokens: set[int] | None = None,
        seed: int = 0,
        segment: int = 32,
    ) -> list[list[int]]:
        """Prefill + fused on-device generation: decodes ``segment``
        tokens per device launch with on-chip sampling (~15x decode
        throughput vs per-token dispatch over high-latency links).

        ``top_p`` in (0, 1) enables on-device nucleus sampling (the
        reference ships nucleus in its chat example, ref:
        examples/chat.rs:158-194). Lanes decode in lockstep, but a lane
        that samples a stop token FREEZES on-device (its recurrent
        state stops advancing, via the padding mask) and the loop exits
        as soon as every lane has stopped; surplus tokens are trimmed.
        """
        from ..models.generate import make_generator

        first, key = self._gen_prefill(prompts, temperature, top_k, top_p, seed)

        stop_tokens = stop_tokens or set()
        gkey = (segment, temperature, top_k, top_p,
                tuple(sorted(stop_tokens)))
        gen = self._gen_cache.get(gkey)
        if gen is None:
            gen = make_generator(
                self.info, steps=segment, temperature=temperature,
                top_k=top_k, top_p=top_p, stop_ids=gkey[4],
            )
            self._gen_cache[gkey] = gen
        token = jnp.asarray(first)
        results = [[int(t)] for t in first[:, 0]]
        segs = []
        produced = 1
        while produced < max_tokens:
            toks, logits, self.state, key, done = self._scoped(
                gen, self.params, self.state, token, key
            )
            # tokens STAY ON DEVICE between segments — one concat+fetch
            # at the end replaces a ~25 ms tunnel round-trip per segment
            segs.append(toks)
            produced += segment
            token = toks[:, -1:]
            if stop_tokens and bool(np.asarray(done).all()):
                break  # every lane froze on its stop token
        if segs:
            all_toks = np.asarray(
                segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)
            )
            for b in range(self.num_batch):
                results[b].extend(int(t) for t in all_toks[b])
        return _trim_stop(results, max_tokens, stop_tokens)


def _trim_stop(seqs: list[list[int]], max_tokens: int, stop_tokens: set[int]):
    trimmed = []
    for seq in seqs:
        seq = seq[:max_tokens]
        for i, t in enumerate(seq):
            if t in stop_tokens:
                seq = seq[: i + 1]
                break
        trimmed.append(seq)
    return trimmed


class EnginePool:
    """Serve more lanes than the fused decode kernel's batch cap as a
    pool of independent engines.

    Measured recipe (round 4, scripts/bench_b32_split.py): two
    independent B=16 engines out-serve one B=32 engine (13.7k vs
    10.6–12.5k tok/s aggregate) — the layer-scan kernel caps at
    ``MAX_SCAN_BATCH`` lanes, and above it the composed per-op path is
    slower per lane than running the kernel twice. The pool splits
    ``num_lanes`` into near-equal per-engine groups (each at most
    ``lanes_per_engine``, default the kernel cap) and INTERLEAVES fused
    segments across engines: every engine's segment is dispatched before
    any result is fetched, so one engine's host-side sampling
    bookkeeping overlaps the others' device compute (JAX dispatch is
    async). All engines share one set of device weight buffers — decode
    prep runs once here and ``prepare_decode`` is idempotent.
    """

    def __init__(self, info: ModelInfo, params, num_lanes: int, *,
                 lanes_per_engine: int | None = None, **engine_kwargs):
        from ..models.loader import prepare_decode
        from ..ops.pallas.layer7 import MAX_SCAN_BATCH

        if lanes_per_engine is None:
            lanes_per_engine = MAX_SCAN_BATCH
        if num_lanes <= 0:
            raise EngineError("num_lanes must be positive")
        n_eng = -(-num_lanes // lanes_per_engine)
        base, rem = divmod(num_lanes, n_eng)
        self.group_sizes = [base + (1 if i < rem else 0) for i in range(n_eng)]
        self.info = info
        self.params_quantized = None
        # resolve dense opt-in and decode prep ONCE at pool level so
        # every engine shares the same device weight buffers (engines
        # would otherwise each densify/unroll their own copies)
        if engine_kwargs.get("mesh") is None and not isinstance(
            params.get("blocks"), list
        ):
            dd = engine_kwargs.pop("decode_dense", None)
            if dd is None:
                # pool-level auto (the per-engine policy, resolved once
                # here so every engine shares the same dense buffers);
                # same fused-kernel eligibility gate as Engine.__init__
                from ..models.loader import dense_cache_bytes
                from ..ops.pallas import config as _pcfg
                from ..ops.pallas.layer7 import scan_batch_slice

                try:
                    dev = jax.devices()[0]
                    _ms, _plat = dev.memory_stats(), dev.platform
                except Exception:
                    _ms, _plat = None, ""
                dd = (
                    auto_decode_dense(
                        self.group_sizes[0], dense_cache_bytes(params),
                        _ms, _plat,
                    )
                    and scan_batch_slice(self.group_sizes[0]) is not None
                    and _pcfg.use_pallas()
                )
            if dd:
                from ..models.loader import densify_matrices

                self.params_quantized = params
                params = densify_matrices(params)
            engine_kwargs["decode_dense"] = False
            params = prepare_decode(params, info,
                                    batch_hint=self.group_sizes[0])
        self.engines = [
            Engine(info, params, g, **engine_kwargs) for g in self.group_sizes
        ]
        # the auto prefill-dense policy is size-independent, so every
        # engine derives the IDENTICAL dense cache from the shared
        # params — keep one copy of those buffers, not one per engine
        if self.engines and self.engines[0]._params_prefill is not None:
            for eng in self.engines[1:]:
                if eng._params_prefill is not None:
                    eng._params_prefill = self.engines[0]._params_prefill
        self._gen_cache: dict = {}

    @property
    def num_lanes(self) -> int:
        return sum(self.group_sizes)

    def generate(
        self,
        prompts: list[list[int]],
        max_tokens: int,
        *,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 0.0,
        stop_tokens: set[int] | None = None,
        seed: int = 0,
        segment: int = 32,
    ) -> list[list[int]]:
        """Pool equivalent of :meth:`Engine.generate`: lane ``i`` maps to
        the same prompt index, numerics per lane match a standalone
        engine of that group's size."""
        from ..models.generate import make_generator

        if len(prompts) != self.num_lanes:
            raise TensorError.batch(len(prompts), self.num_lanes)
        bounds = np.cumsum([0] + self.group_sizes)
        groups = [
            prompts[bounds[i] : bounds[i + 1]] for i in range(len(self.engines))
        ]
        stop_tokens = stop_tokens or set()
        # one generator per sampling config, cached across calls (an
        # uncached make_generator retraces the segment scan every call)
        gkey = (segment, temperature, top_k, top_p,
                tuple(sorted(stop_tokens)))
        gen = self._gen_cache.get(gkey)
        if gen is None:
            gen = make_generator(
                self.info, steps=segment, temperature=temperature,
                top_k=top_k, top_p=top_p, stop_ids=gkey[4],
            )
            self._gen_cache[gkey] = gen

        tokens, keys, results = [], [], []
        # dispatch EVERY group's prefill before fetching any sampled ids
        # (JAX dispatch is async: engine i+1's prefill overlaps engine
        # i's device compute and the tiny id fetches)
        for i, (eng, grp) in enumerate(zip(self.engines, groups)):
            first_dev, key = eng._gen_prefill(
                grp, temperature, top_k, top_p, seed + i, device=True
            )
            tokens.append(first_dev)
            keys.append(key)
        for i in range(len(self.engines)):
            first = np.asarray(tokens[i], np.int32)
            tokens[i] = jnp.asarray(first)
            results.append([[int(t)] for t in first[:, 0]])

        seg_lists: list[list] = [[] for _ in self.engines]
        produced = 1
        while produced < max_tokens:
            outs = []
            # dispatch EVERY engine's segment before fetching any result
            for i, eng in enumerate(self.engines):
                outs.append(eng._scoped(
                    gen, eng.params, eng.state, tokens[i], keys[i]
                ))
            all_done = bool(stop_tokens)
            for i, (eng, (toks, _logits, state, key, done)) in enumerate(
                zip(self.engines, outs)
            ):
                eng.state = state
                keys[i] = key
                # tokens stay on device; one concat+fetch per engine at
                # the end (a per-round fetch costs a tunnel RTT each)
                seg_lists[i].append(toks)
                tokens[i] = toks[:, -1:]
                if stop_tokens and not bool(np.asarray(done).all()):
                    all_done = False
            produced += segment
            if all_done:
                break
        for i, segs in enumerate(seg_lists):
            if not segs:
                continue
            all_toks = np.asarray(
                segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)
            )
            for b in range(len(results[i])):
                results[i][b].extend(int(t) for t in all_toks[b])
        flat = [seq for grp in results for seq in grp]
        return _trim_stop(flat, max_tokens, stop_tokens)
