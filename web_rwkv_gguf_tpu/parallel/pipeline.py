"""Pipeline parallelism: shard the LAYER stack over devices.

GPipe-style inference schedule: the stacked layer params (and the
per-layer recurrent state) shard on a ``pp`` mesh axis; microbatches of
sequences stream through the stages, with the inter-stage payload
(residual x and, on V7, the value-residual anchor v0) moving by
``ppermute``. With M microbatches and S stages the pipeline runs S+M−1
ticks at ~M/(S+M−1) utilization. Complements TP/DP (`sharding.py`) and
sequence-parallel prefill (`sequence.py`). Serves every model version;
below V7 only x crosses stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.forward import (
    _layer_v4,
    _layer_v5,
    _layer_v6,
    _layer_v7,
    embed_tokens,
)
from ..models.info import ModelInfo, ModelVersion
from ..models.matrix import Matrix
from ..errors import EngineError, UnsupportedFeature

_LAYER_FNS = {
    ModelVersion.V4: _layer_v4,
    ModelVersion.V5: _layer_v5,
    ModelVersion.V6: _layer_v6,
}


def _stage_forward(info, blocks_local, state_local_mb, x, v0, stage, layers_per_stage,
                   mask, lengths):
    """Run this device's contiguous layer slice on one microbatch."""
    base = stage * layers_per_stage
    layer_ids = base + jnp.arange(layers_per_stage)

    if info.version == ModelVersion.V7:
        def body(carry, xs):
            x, v0 = carry
            blk, lst, idx = xs
            x, v0, new = _layer_v7(info, blk, lst, x, v0, idx, mask, lengths)
            return (x, v0), new
    else:
        fn = _LAYER_FNS[info.version]

        def body(carry, xs):
            x, v0 = carry
            blk, lst, _ = xs
            x, new = fn(info, blk, lst, x, mask, lengths)
            return (x, v0), new

    (x, v0), new_state = jax.lax.scan(
        body, (x, v0), (blocks_local, state_local_mb, layer_ids)
    )
    return x, v0, new_state


def make_pipeline_forward(
    info: ModelInfo,
    mesh: Mesh,
    *,
    axis: str = "model",
    num_microbatch: int = 4,
):
    """Build a jitted pipeline-parallel forward (any model version).

    ``fn(params, state, tokens [M, B, T], lengths [M, B]) -> (x [M, B, T,
    C], new_state)`` where M = ``num_microbatch`` groups of B sequences.
    Layer-stacked params and state shard their leading L axis over
    ``axis``; tokens/lengths/outputs are replicated. Apply
    ``models.logits_head`` to the returned x as usual.
    """
    if info.version not in _LAYER_FNS and info.version != ModelVersion.V7:
        raise UnsupportedFeature(
            f"pipeline-parallel forward: unsupported version {info.version}"
        )
    L = info.num_layer
    n_stages = mesh.shape[axis]
    if L % n_stages:
        raise EngineError(f"num_layer {L} must divide by pipeline stages {n_stages}")
    lps = L // n_stages
    M = num_microbatch

    pp_mesh = Mesh(mesh.devices, tuple("pp" if a == axis else a for a in mesh.axis_names))

    def inner(params, state, tokens, lengths):
        # params["blocks"] leaves arrive with leading dim L/n (sharded);
        # state leaves [L/n, M, B, ...]
        stage = jax.lax.axis_index("pp")
        blocks = params["blocks"]
        B, T = tokens.shape[1], tokens.shape[2]
        C = info.num_emb

        x_buf = jnp.zeros((B, T, C), jnp.float32)
        v0_buf = jnp.zeros((B, T, C), jnp.float32)
        out = jnp.zeros((M, B, T, C), jnp.float32)

        def tick(step, carry):
            x_in, v0_in, state, out = carry
            mb = step - stage  # which microbatch this stage works on
            active = jnp.logical_and(mb >= 0, mb < M)
            mb_c = jnp.clip(mb, 0, M - 1)

            toks = jax.lax.dynamic_index_in_dim(tokens, mb_c, 0, keepdims=False)
            lens = jax.lax.dynamic_index_in_dim(lengths, mb_c, 0, keepdims=False)
            mask = jnp.arange(T)[None, :] < lens[:, None]

            # stage 0 sources from the embedding, others from the pipe
            emb = embed_tokens(params, toks)
            emb = jnp.where(mask[..., None], emb, 0.0)
            x = jnp.where(stage == 0, emb, x_in)
            v0 = jnp.where(stage == 0, jnp.zeros_like(v0_in), v0_in)

            lst = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mb_c, 1, keepdims=False),
                state,
            )
            x_o, v0_o, new_lst = _stage_forward(
                info, blocks, lst, x, v0, stage, lps, mask, lens
            )

            state = jax.tree.map(
                lambda a, n_: jnp.where(
                    active,
                    jax.lax.dynamic_update_index_in_dim(a, n_, mb_c, 1),
                    a,
                ),
                state, new_lst,
            )
            out = jnp.where(
                jnp.logical_and(active, stage == n_stages - 1),
                jax.lax.dynamic_update_index_in_dim(out, x_o, mb_c, 0),
                out,
            )

            # hand off to the next stage
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            x_nxt = jax.lax.ppermute(x_o, "pp", perm)
            # the v0 anchor only exists on V7; skip its ICI traffic below
            v0_nxt = (jax.lax.ppermute(v0_o, "pp", perm)
                      if info.version == ModelVersion.V7 else v0_in)
            return (x_nxt, v0_nxt, state, out)

        x_in, v0_in, state, out = jax.lax.fori_loop(
            0, n_stages + M - 1, tick, (x_buf, v0_buf, state, out)
        )
        # every stage holds the out rows it wrote (only the last stage
        # wrote any); sum-reduce to replicate
        out = jax.lax.psum(out, "pp")
        return out, state

    # prefix specs: every leaf under "blocks" shards its leading L axis
    # (all layer-stacked leaves, incl. Matrix arrays and the NF4 LUT,
    # carry a leading L dim by construction — see models/loader.py)
    params_spec = {
        "emb": P(), "ln0": P(), "ln_out": P(), "head": P(),
        "blocks": P("pp"),
    }
    mapped = shard_map(
        inner,
        mesh=pp_mesh,
        in_specs=(params_spec, P("pp"), P(), P()),
        out_specs=(P(), P("pp")),
        check_vma=False,
    )
    return jax.jit(mapped)


def pipeline_state(info: ModelInfo, num_microbatch: int, batch: int):
    """Zero state shaped for the pipeline: leaves [L, M, B, ...]."""
    from ..models.forward import init_state

    base = init_state(info, batch)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(
            a[:, None], (a.shape[0], num_microbatch) + a.shape[1:]
        ).copy(),
        base,
    )
