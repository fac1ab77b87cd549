"""Pipeline-parallel FUSED decode: the layer-scan mega kernel per stage.

Tensor-parallel decode cannot keep the whole-stack Pallas kernel — TP
needs a collective in the middle of every layer (Wo / ffn.Wv reduce),
and a ``pallas_call`` cannot host XLA collectives. Sharding the LAYER
stack instead keeps the fast path bit-for-bit: the layer-scan kernel
(ops/pallas/layer7.py) already runs an arbitrary contiguous stack, so
each pipeline stage runs it UNCHANGED on its local ``L/S`` layers, and
only the tiny residual payload (x, v0 anchor — 2·[B, C] f32) crosses
ICI per stage via ``ppermute``.

Decode is autoregressive, so a single sequence cannot be pipelined —
but serving runs many: ``G`` round-robin GROUPS of ``B`` lanes keep
every stage busy (group g's token t+1 enters stage 0 exactly when its
token t leaves the last stage, G ≥ S fills the pipe; utilization is
G·steps/(G·steps + S − 1) → 1). Sampling happens on-device on the last
stage and the next token id rides the same tick's collective back to
stage 0, so the whole multi-token schedule is ONE compiled program —
the multi-chip version of models/generate.make_generator.

Ref: SURVEY.md §2.6 north star (the reference is single-GPU; this is
the repo's own multi-chip serving design).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import EngineError, UnsupportedFeature
from ..models.forward import GN_EPS, L2_EPS, LN_EPS, logits_head
from ..models.generate import make_sampler
from ..models.info import ModelInfo
from ..ops.pallas.layer7 import DecodeBlocks7, layer_scan7
from ..ops.pallas.layer56 import layer_scan56


def _find_mega(params: dict) -> DecodeBlocks7:
    """The attached layer-scan decode blocks (V7's ``mega7`` or the
    V4/V5/V6 ``mega56``), or raise."""
    mega = params.get("mega7") or params.get("mega56")
    if mega is None:
        raise UnsupportedFeature(
            "pipelined decode needs the layer-scan blocks "
            "(models.loader.prepare_decode)"
        )
    return mega


def make_pp_params(params: dict, mesh: Mesh, *, axis: str = "pp") -> dict:
    """Place loaded params for the pipelined decoder: the mega decode
    blocks shard their leading L axis over ``axis``; embedding, ln0,
    ln_out and the head replicate. Requires ``params["mega7"]`` (V7) or
    ``params["mega56"]`` (V4/V5/V6) — loader.prepare_decode builds
    them."""
    mega: DecodeBlocks7 = _find_mega(params)
    L = mega.static["L"]
    S = mesh.shape[axis]
    if L % S:
        raise EngineError(f"num_layer {L} must divide pipeline stages {S}")
    rep = NamedSharding(mesh, P())
    stage = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(*([axis] + [None] * (a.ndim - 1))))
    )
    return {
        "emb": jax.device_put(params["emb"], rep),
        "ln0": jax.tree.map(lambda a: jax.device_put(a, rep), params["ln0"]),
        "ln_out": jax.tree.map(lambda a: jax.device_put(a, rep), params["ln_out"]),
        "head": jax.tree.map(lambda a: jax.device_put(a, rep), params["head"]),
        "mega_arrays": {k: stage(a) for k, a in mega.arrays.items()},
        "mega_static": dict(mega.static),  # python metadata, not traced
    }


def pp_state(info: ModelInfo, n_groups: int, batch: int) -> dict:
    """Zero recurrent state for the pipelined decoder: leaves
    ``[L, G, B, ...]`` (sharded on L at run time)."""
    from ..models.forward import init_state

    base = init_state(info, batch)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(
            a[:, None], (a.shape[0], n_groups) + a.shape[1:]
        ).copy(),
        base,
    )


def greedy_scan_reference(info: ModelInfo, params: dict, token0, steps: int,
                          rescale: int | None = None):
    """Single-device greedy decode on the SAME kernels as the pipelined
    generator (layer-scan mega kernel + logits_head + argmax) — the
    bit-exact parity reference for :func:`make_pp_generator`. (The
    engine's production generator routes through forward_chunk, whose
    interpret-mode fallback is the composed path — a different rounding
    class, so greedy tokens can legitimately differ on near-ties.)"""
    from ..models.forward import embed_tokens, init_state

    mega: DecodeBlocks7 = _find_mega(params)
    version = mega.static.get("version", 7)
    B = token0.shape[0]
    state = init_state(info, B)
    mask = jnp.ones((B,), jnp.float32)
    do_rescale = rescale is not None and rescale < mega.static["L"]
    tok = token0.astype(jnp.int32)
    toks = []
    for _ in range(steps):
        x = embed_tokens(params, tok[:, None])[:, 0]
        if version == 7:
            xo, state = layer_scan7(
                mega, state, x, mask, rescale if do_rescale else None,
                LN_EPS, GN_EPS, L2_EPS,
            )
        else:
            xo, state = layer_scan56(
                mega, state, x, mask, rescale if do_rescale else None,
                LN_EPS, GN_EPS,
            )
        logits = logits_head(params, xo)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks.append(tok)
    return jnp.stack(toks, axis=-1), state  # [B, steps]


def make_pp_generator(
    info: ModelInfo,
    mesh: Mesh,
    mega_static: dict,
    *,
    n_groups: int,
    steps: int,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 0.0,
    rescale: int | None = None,
    axis: str = "pp",
):
    """Build the jitted pipelined generator.

    ``fn(pp_params, state, token0 [G, B], key) -> (tokens [G, B, steps],
    state)`` decodes ``steps`` tokens for each of ``G`` groups of ``B``
    lanes, pipelined over the mesh's ``axis`` stages; ``state`` leaves
    are ``[L, G, B, ...]`` (:func:`pp_state`), sharded on L. Greedy
    (temperature 0) matches models.generate.make_generator per group
    exactly — same kernels, same head, same argmax.
    """
    version = mega_static.get("version", 7)
    S = mesh.shape[axis]
    L = mega_static["L"]
    if L % S:
        raise EngineError(f"num_layer {L} must divide pipeline stages {S}")
    if n_groups < S:
        raise EngineError(
            f"need n_groups >= stages to fill the pipe ({n_groups} < {S}): "
            "a group's next token can only enter once its previous one left"
        )
    lps = L // S
    G, jobs = n_groups, n_groups * steps
    sample = make_sampler(temperature, top_k, top_p)
    do_rescale = rescale is not None and rescale < L

    def run(pp, state, token0, key):
        stage = jax.lax.axis_index(axis)
        is_last = stage == S - 1
        B = token0.shape[1]
        C = info.num_emb
        mega_local = DecodeBlocks7(pp["mega_arrays"], {**mega_static, "L": lps})
        mask = jnp.ones((B,), jnp.float32)
        meta = jnp.stack(
            [jnp.where(stage == 0, 0.0, 1.0),
             (stage * lps).astype(jnp.float32)]
        )[None]  # [1, 2]: (v0-from-pipe flag, global layer offset)

        head_params = {"head": pp["head"], "ln_out": pp["ln_out"]}

        def tick(t, carry):
            x_pipe, v0_pipe, tok_table, state, out = carry
            j = t - stage  # this stage's job index
            active = jnp.logical_and(j >= 0, j < jobs)
            g = jnp.clip(j % G, 0, G - 1)

            # stage 0 sources from the embedding of the group's current
            # token; later stages from the pipe
            tok = jax.lax.dynamic_index_in_dim(tok_table, g, 0, keepdims=False)
            from ..ops import basic as _B

            emb = pp["emb"][tok].astype(jnp.float32)
            x_e = _B.layer_norm(emb, pp["ln0"]["w"], pp["ln0"]["b"], LN_EPS)
            x_in = jnp.where(stage == 0, x_e, x_pipe)

            lst = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, g, 1, keepdims=False),
                state,
            )
            if version == 7:
                x_o, new_lst, v0_o = layer_scan7(
                    mega_local, lst, x_in, mask,
                    rescale if do_rescale else None, LN_EPS, GN_EPS, L2_EPS,
                    v0_carry=(v0_pipe, meta),
                )
            else:
                # V4/V5/V6 have no cross-stage value-residual carry —
                # only x crosses the pipe; meta[0,1] is the global layer
                # offset (keeps a stage-split rescale modulo aligned)
                x_o, new_lst = layer_scan56(
                    mega_local, lst, x_in, mask,
                    rescale if do_rescale else None, LN_EPS, GN_EPS,
                    goff=meta[0, 1],
                )
                v0_o = v0_pipe
            # gate the UPDATE VALUE, not the whole array: a
            # jnp.where(active, dus(state), state) would read+write every
            # [lps, G, B, ...] leaf (incl. the f32 wkv tensor) each tick;
            # writing back the unchanged slice on inactive ticks touches
            # only group g's [lps, B, ...] slice
            state = jax.tree.map(
                lambda a, old, n_: jax.lax.dynamic_update_index_in_dim(
                    a, jnp.where(active, n_, old), g, 1
                ),
                state, lst, new_lst,
            )

            # last stage: head + on-device sampling; the sampled ids ride
            # one [G, B] psum back to every stage's token table (stage 0
            # reads them G ticks later — exactly when the group re-enters)
            def head_sample(x_rows):
                logits = logits_head(head_params, x_rows)
                sub = jax.random.fold_in(key, j)
                return sample(logits, sub)

            nxt = jax.lax.cond(
                is_last,
                head_sample,
                lambda x_rows: jnp.zeros((B,), jnp.int32),
                x_o,
            )
            contrib = jnp.logical_and(active, is_last)
            delta = jnp.where(
                contrib,
                jax.lax.dynamic_update_index_in_dim(
                    jnp.zeros_like(tok_table), nxt - tok, g, 0
                ),
                jnp.zeros_like(tok_table),
            )
            tok_table = tok_table + jax.lax.psum(delta, axis)
            k_idx = jnp.clip(j // G, 0, steps - 1)
            out = jnp.where(
                contrib,
                out.at[g, :, k_idx].set(nxt),
                out,
            )

            perm = [(i, (i + 1) % S) for i in range(S)]
            x_nxt = jax.lax.ppermute(x_o, axis, perm)
            # v0 only crosses stages on V7 (value-residual anchor)
            v0_nxt = (jax.lax.ppermute(v0_o, axis, perm)
                      if version == 7 else v0_pipe)
            return (x_nxt, v0_nxt, tok_table, state, out)

        zeros = jnp.zeros((B, C), jnp.float32)
        out0 = jnp.zeros((G, B, steps), jnp.int32)
        _, _, _, state, out = jax.lax.fori_loop(
            0, jobs + S - 1, tick,
            (zeros, zeros, token0.astype(jnp.int32), state, out0),
        )
        out = jax.lax.psum(out, axis)  # only the last stage wrote rows
        return out, state

    # "mega_static" is python metadata and never crosses the jit
    # boundary (the wrapper strips it), so it has no spec entry
    spec = {
        "emb": P(), "ln0": P(), "ln_out": P(), "head": P(),
        "mega_arrays": P(axis),
    }
    mapped = jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(spec, P(axis), P(), P()),
            out_specs=(P(), P(axis)),
            check_vma=False,
        ),
        donate_argnums=(1,),
    )

    def wrapper(pp, state, token0, key):
        # mega_static is python metadata; strip it before the jit boundary
        pp_traced = {k: v for k, v in pp.items() if k != "mega_static"}
        return mapped(pp_traced, state, token0, key)

    return wrapper


class PipelinedDecoder:
    """Product surface for the pipelined fused decode: own the placed
    params, the [L, G, B, ...] state, and a per-(G, B, steps) generator
    cache, so serving code can just call :meth:`generate`.

    ::

        dec = PipelinedDecoder(info, params, mesh)        # mesh has "pp"
        toks = dec.generate(token0, steps=64)             # [G, B, 64]
        toks = dec.generate(toks[..., -1], steps=64)      # continues

    ``params`` may come straight from ``load_model`` — the layer-scan
    decode blocks are prepared here if absent. Greedy output is
    token-for-token identical to the single-device fused generator
    (pinned by tests/test_decode_pp.py).
    """

    def __init__(
        self,
        info: ModelInfo,
        params: dict,
        mesh: Mesh,
        *,
        axis: str = "pp",
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 0.0,
        rescale: int | None = None,
    ):
        if "mega7" not in params and "mega56" not in params:
            from ..models.loader import prepare_decode

            params = prepare_decode(params, info, batch_hint=1)
            if "mega7" not in params and "mega56" not in params:
                raise UnsupportedFeature(
                    "pipelined decode needs a uniformly quantized "
                    "V4/V5/V6/V7 stack (layer-scan decode blocks)"
                )
        self.info = info
        self.mesh = mesh
        self.axis = axis
        self._static = dict(_find_mega(params).static)
        self._pp = make_pp_params(params, mesh, axis=axis)
        self._sampling = dict(
            temperature=temperature, top_k=top_k, top_p=top_p,
            rescale=rescale,
        )
        self._gens: dict = {}
        self.state = None
        self._key = jax.random.PRNGKey(0)

    @property
    def num_stages(self) -> int:
        return self.mesh.shape[self.axis]

    def reset(self, n_groups: int | None = None, batch: int | None = None):
        """Zero the recurrent state (lazily re-created on generate if
        sizes are omitted)."""
        if n_groups is None or batch is None:
            self.state = None
        else:
            self.state = pp_state(self.info, n_groups, batch)

    def generate(self, token0, steps: int, key=None):
        """Decode ``steps`` tokens for every lane: ``token0 [G, B]`` →
        ``[G, B, steps]`` sampled ids (G >= pipeline stages). State
        carries across calls; pass the previous call's last column to
        continue."""
        token0 = jnp.asarray(token0, jnp.int32)
        G, B = token0.shape
        if self.state is None:
            self.state = pp_state(self.info, G, B)
        else:
            # state leaves are [L, G, B, ...]; a silent rebuild would
            # throw away carried state, so a size change must be explicit
            sG, sB = jax.tree.leaves(self.state)[0].shape[1:3]
            if (sG, sB) != (G, B):
                raise EngineError(
                    f"token0 is ({G}, {B}) lanes but the carried state is "
                    f"({sG}, {sB}); call reset() (or reset(G, B)) before "
                    "changing the group/batch shape"
                )
        gen = self._gens.get((G, B, steps))
        if gen is None:
            gen = make_pp_generator(
                self.info, self.mesh, self._static, n_groups=G,
                steps=steps, axis=self.axis, **self._sampling,
            )
            self._gens[(G, B, steps)] = gen
        if key is None:
            self._key, key = jax.random.split(self._key)
        toks, self.state = gen(self._pp, self.state, token0, key)
        return toks
