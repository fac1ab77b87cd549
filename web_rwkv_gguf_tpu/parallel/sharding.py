"""Mesh + NamedSharding assignment for parameters, state, and inputs.

Sharding plan (axes ``("data", "model")``):

  * Column-parallel (output dim on ``model``): att Wr/Wk/Wv/Wg, ffn Wk,
    all heads-facing projections — the per-head WKV state then lives
    entirely on the chip that owns those heads (heads are contiguous in
    the output dim), so the recurrence needs **no** communication.
  * Row-parallel (input dim on ``model``): att Wo, ffn Wv — XLA inserts
    one ``psum`` over ``model`` after each, restoring a replicated
    residual stream.
  * head (vocab proj): vocab dim on ``model`` (logits all-gather).
  * Recurrent state: batch on ``data``; WKV ``[L,B,H,K,V]`` additionally
    heads on ``model``.
  * Everything small (norms, mixing vectors, inner-LoRA adapters):
    replicated.

Because the K-quant repack de-interleaves scales into per-32-group
arrays (quant/repack.py), shard boundaries only need 32-element
alignment — not the 256-element super-block alignment the raw GGML
layout would force (cf. SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.info import ModelInfo
from ..models.matrix import Matrix
from ..errors import UnsupportedFeature


def make_mesh(
    n_data: int | None = None, n_model: int | None = None, devices=None
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None and n_model is None:
        n_model = n
        n_data = 1
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    assert n_data * n_model == n, (n_data, n_model, n)
    dev = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def multihost_initialize(**kwargs):
    """Initialize JAX distributed for a multi-host pod slice (DCN).

    Thin wrapper over ``jax.distributed.initialize`` so apps have one
    entry point; on a single host it is a no-op.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or kwargs:
        jax.distributed.initialize(**kwargs)


def _shard_matrix(m: Matrix, mesh: Mesh, dim: str) -> Matrix:
    """Shard a layer-stacked Matrix on its output (column) or input (row)
    dim. Arrays are [L, M, ...K-structured...]. Falls back to replication
    when a quantization-group dim is not divisible by the model axis."""
    n_model = mesh.shape["model"]
    # drop the precomputed gemv scale operands (position-ordered [G, M]
    # transposes, see models/matrix.py::_gemv_scale_arrays): their layout
    # assumptions do not compose with resharding, and the Pallas gemv falls
    # back to deriving them at trace time when absent
    arrays = {k: a for k, a in m.arrays.items() if k not in ("st", "mnt")}
    m = Matrix(m.kind, m.shape, arrays)
    specs = {}
    for k, a in m.arrays.items():
        if k == "lut":
            specs[k] = P()
        elif dim == "col":
            # shard M: axis 1 of [L, M, *]
            specs[k] = P(None, "model")
            if a.shape[1] % n_model:
                return Matrix(m.kind, m.shape, _replicate(m.arrays, mesh))
        else:
            # shard K-structure: last axis of codes/scales/mins/mn/mx
            specs[k] = P(*([None] * (a.ndim - 1) + ["model"]))
            if a.shape[-1] % n_model:
                return Matrix(m.kind, m.shape, _replicate(m.arrays, mesh))
    out = {
        k: jax.device_put(a, NamedSharding(mesh, specs[k]))
        for k, a in m.arrays.items()
    }
    return Matrix(m.kind, m.shape, out)


def _replicate(tree, mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def shard_params(params: dict, mesh: Mesh, info: ModelInfo) -> dict:
    """Place parameters on the mesh per the sharding plan."""
    if isinstance(params["blocks"], list):
        raise UnsupportedFeature(
            "mixed per-layer quant (unrolled form) does not support "
            "sharding; use a uniform quant scheme"
        )
    col = {"Wr", "Wk", "Wv", "Wg"}
    row = {"Wo"}

    blocks = dict(params["blocks"])
    att = dict(blocks["att"])
    ffn = dict(blocks["ffn"])
    for k in list(att):
        if isinstance(att[k], Matrix):
            if k in col:
                att[k] = _shard_matrix(att[k], mesh, "col")
            elif k in row:
                att[k] = _shard_matrix(att[k], mesh, "row")
            else:
                att[k] = Matrix(
                    att[k].kind, att[k].shape, _replicate(att[k].arrays, mesh)
                )
        else:
            att[k] = _replicate(att[k], mesh)
    for k in list(ffn):
        if isinstance(ffn[k], Matrix):
            ffn[k] = _shard_matrix(ffn[k], mesh, "col" if k == "Wk" else "row")
        else:
            ffn[k] = _replicate(ffn[k], mesh)
    blocks["att"] = att
    blocks["ffn"] = ffn
    blocks["ln1"] = _replicate(blocks["ln1"], mesh)
    blocks["ln2"] = _replicate(blocks["ln2"], mesh)

    out = {
        "emb": jax.device_put(params["emb"], NamedSharding(mesh, P())),
        "ln0": _replicate(params["ln0"], mesh),
        "ln_out": _replicate(params["ln_out"], mesh),
        "head": _shard_matrix(params["head"], mesh, "col"),
        "blocks": blocks,
    }
    return out


def shard_state(state: dict, mesh: Mesh) -> dict:
    """Batch on ``data``; WKV heads (or V4's per-channel aa/bb/pp)
    additionally on ``model``."""
    out = {}
    for k, a in state.items():
        if k == "wkv":  # [L, B, H, K, V]
            spec = P(None, "data", "model")
        elif k in ("aa", "bb", "pp"):  # [L, B, C] per-channel WKV state
            spec = P(None, "data", "model")
        else:  # [L, B, C] token-shift boundaries (input-side: replicated)
            spec = P(None, "data")
        out[k] = jax.device_put(a, NamedSharding(mesh, spec))
    return out


def data_sharding(mesh: Mesh):
    """Sharding for [B, T] token / [B] length inputs."""
    return NamedSharding(mesh, P("data")), NamedSharding(mesh, P("data"))
