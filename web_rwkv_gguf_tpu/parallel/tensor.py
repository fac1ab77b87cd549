"""Explicit tensor-parallel forward via ``shard_map`` (V7).

The GSPMD path (``shard_params`` + jit) lets XLA partition the forward
automatically, but XLA cannot partition a ``pallas_call`` — on real
multi-chip TPU the fused quant kernels would be replicated or rejected.
This module instead runs the forward under ``jax.shard_map``: every
device sees its LOCAL weight shard as an ordinary array, so the Pallas
kernels run unchanged per device, and the collectives are explicit.

Sharding plan (v1, all column-parallel):

* every weight matrix is sharded on its OUTPUT dim (M). M-row slicing is
  layout-safe for every quantized format — rows are independent in the
  repacked layouts, so no 256-block or split-halves constraint applies
  (K-sharding of the split-halves "qk" layout would need a per-shard
  scale reorder; deferred).
* projections whose input is the replicated residual (Wr/Wk/Wv/Wg,
  ffn.Wk, head) are plain local matmuls producing local outputs; the
  attention heads are co-sharded with their projections, so the WKV
  recurrence is communication-free.
* matrices whose input is itself sharded (Wo, ffn.Wv) gather the small
  activation over ICI first (``all_gather``), then local-matmul, then
  gather the output — two activation-sized collectives per use vs
  Megatron's single psum, in exchange for format-independent sharding.
  RWKV activations are tiny (C..4C floats/token), so ICI cost is
  negligible against the weight-bandwidth win.
* output-side per-head/per-channel vectors (k_k/k_a/r_k/gn/w0/a0/v0 and
  the adapter up-projections w2/a2/g2/v2) are sliced to the local head
  range inside the mapped function; input-side params stay replicated.
* recurrent state: batch on ``data``, WKV heads on ``model`` (matching
  ``shard_state``).

Ref: SURVEY.md §2.6 (the reference has no distributed support; this is
the BASELINE north-star design).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.forward import forward_chunk, logits_head
from ..models.info import ModelInfo, ModelVersion
from ..models.matrix import Matrix
from ..errors import EngineError, UnsupportedFeature

_COL = ("Wr", "Wk", "Wv", "Wg", "Wo")
_COL_FFN = ("Wk", "Wv", "Wr")
# att vectors sliced to the local head range inside the mapped fn:
# (key, axis-from-end, "C"|"H") per version — output-side params only
# (input-side params stay replicated and produce local outputs through
# the sliced up-projections / col-sharded matrices)
_ATT_SLICES = {
    # V4's WKV is per-CHANNEL diagonal — the state and the decay/bonus
    # vectors slice on C exactly like an FFN hidden dim
    ModelVersion.V4: (("time_first", 1, "C"), ("time_decay", 1, "C")),
    ModelVersion.V5: (("time_first", 2, "H"), ("time_decay", 2, "H")),
    ModelVersion.V6: (("time_first", 2, "H"), ("time_decay", 1, "C"),
                      ("td_w2", 2, "C")),
    ModelVersion.V7: (("k_k", 1, "C"), ("k_a", 1, "C"), ("w0", 1, "C"),
                      ("a0", 1, "C"), ("v0", 1, "C"), ("r_k", 2, "H"),
                      ("w2", 2, "C"), ("a2", 2, "C"), ("g2", 2, "C"),
                      ("v2", 2, "C"), ("lora_up", 2, "C")),
}


@jax.tree_util.register_pytree_node_class
class _GatherInCol:
    """Column-parallel matrix whose input is itself model-sharded: gather
    the activation over ICI, local-matmul, gather the local output back
    to the full (replicated) vector. Registered as a pytree so the layer
    scan can slice the stacked inner Matrix through it."""

    def __init__(self, mat: Matrix, axis: str):
        self.mat = mat
        self.axis = axis

    def tree_flatten(self):
        return (self.mat,), (self.axis,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    def matmul(self, x):
        x_full = jax.lax.all_gather(x, self.axis, axis=-1, tiled=True)
        y_local = self.mat.matmul(x_full)
        return jax.lax.all_gather(y_local, self.axis, axis=-1, tiled=True)


@jax.tree_util.register_pytree_node_class
class _ColGatherOut:
    """Column-parallel matrix whose input is replicated but whose output
    must be full (e.g. the v5/v6 FFN receptance gate): local matmul, then
    gather the local output."""

    def __init__(self, mat: Matrix, axis: str):
        self.mat = mat
        self.axis = axis

    def tree_flatten(self):
        return (self.mat,), (self.axis,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    def matmul(self, x):
        return jax.lax.all_gather(self.mat.matmul(x), self.axis, axis=-1, tiled=True)


def _reshard_gemv_arrays(m: Matrix, n: int) -> dict:
    """Per-shard gemv scale operands for an M-sharded Matrix.

    The precomputed ``st``/``mnt`` are position-ordered per the kernel's
    M-tiling, which does not survive row slicing — instead each shard's
    operands are rebuilt from its OWN row range (host-side, at placement
    time) and concatenated along M so a ``model``-axis slice hands every
    device exactly the local-position-ordered arrays. Without this, TP
    decode recomputes the transpose inside the loop — measured at ~2/3 of
    head-gemv time (ops/pallas/matmul.py:280-289)."""
    import numpy as np

    from ..models.matrix import recompute_gemv_arrays

    from ..ops.pallas.matmul import (
        build_gemv_operands_native,
        build_gemv_operands_native_nomin,
    )

    # prefer the loader's VALIDATED numpy mirror; for mirrorless
    # matrices convert each needed array to numpy ONCE here — inside
    # the per-shard loops every np.asarray on a device array would be
    # a separate device→host transfer (n transfers of the full array
    # for an n-way mesh; see models/matrix.Matrix.host)
    a = m.host_arrays() or m.arrays
    mdim, k = m.dims()
    m_loc = mdim // n
    keys = [key for key in ("scales", "mins", "mn", "mx", "absmax",
                            "sc6", "mn6", "d8", "dm8", "q6s", "q6d")
            if key in a]
    signed = a["codes"].dtype == np.int8 if "codes" in a else False
    a = {key: np.asarray(a[key]) for key in keys}
    kdim = k // 2 if m.kind == "qk" else k

    def native_piece(s: int) -> dict:
        # native scale-factor operands rebuilt from the raw row-major
        # factor arrays (sc6/mn6/d8/dm8 or q6s/q6d slice fine along M) so
        # multi-chip decode keeps the 2.7-9.6x scale-DMA win
        lo = s * m_loc
        if "sc6" in a:
            stacked = np.asarray(a["sc6"]).ndim == 3
            def cut(key):
                return np.asarray(a[key])[..., lo : lo + m_loc, :]
            args = [cut("sc6"), cut("mn6"), cut("d8"), cut("dm8")]
            if stacked:
                outs = [
                    build_gemv_operands_native(
                        *(x[i] for x in args), m_loc, k, kdim
                    )
                    for i in range(args[0].shape[0])
                ]
                if not outs[0]:
                    return {}
                return {key: jnp.stack([o[key] for o in outs])
                        for key in outs[0]}
            return build_gemv_operands_native(*args, m_loc, k, kdim)
        if "q6s" in a:
            stacked = np.asarray(a["q6s"]).ndim == 3
            sc = np.asarray(a["q6s"])[..., lo : lo + m_loc, :]
            d = np.asarray(a["q6d"])[..., lo : lo + m_loc, :]
            if stacked:
                outs = [
                    build_gemv_operands_native_nomin(sc[i], d[i], m_loc, k, kdim)
                    for i in range(sc.shape[0])
                ]
                if not outs[0]:
                    return {}
                return {key: jnp.stack([o[key] for o in outs])
                        for key in outs[0]}
            return build_gemv_operands_native_nomin(sc, d, m_loc, k, kdim)
        return {}

    pieces = []
    for s in range(n):
        loc = {key: np.asarray(a[key])[..., s * m_loc : (s + 1) * m_loc, :]
               for key in keys}
        piece = recompute_gemv_arrays(m.kind, loc, m_loc, k, signed=signed)
        piece.update(native_piece(s))
        pieces.append(piece)
    if not pieces or not pieces[0]:
        return {}
    return {
        key: jnp.concatenate([jnp.asarray(p[key]) for p in pieces], axis=-1)
        for key in pieces[0]
    }


# gemv operands derived from the row-major storage arrays, [.., r, m]-
# shaped (M on the LAST axis, per-tile column permutation): rebuilt per
# shard at placement, sharded on their last axis
_DERIVED_KEYS = ("st", "mnt", "stq", "mnq", "sd", "sdm", "scq", "sdn")


def _col_shardable(m: Matrix, n: int) -> bool:
    # derived gemv operands are dropped and rebuilt at placement
    # (_shard_mat_col) — only the row-major [.., m, ..] storage arrays
    # decide shardability
    return "lut" not in m.arrays and all(
        a.shape[-2] % n == 0
        for k, a in m.arrays.items()
        if k not in _DERIVED_KEYS
    )


def _shard_mat_col(m: Matrix, mesh: Mesh) -> Matrix:
    """Place a (stacked) Matrix column-sharded on ``model``; the derived
    gemv scale operands are rebuilt per shard (see
    :func:`_reshard_gemv_arrays`) and sharded along their M axis. A
    matrix whose M does not divide the axis is replicated whole (its
    original operands remain valid)."""
    n = mesh.shape["model"]
    if not _col_shardable(m, n):
        return Matrix(
            m.kind, m.shape,
            {k2: jax.device_put(a2, NamedSharding(mesh, P()))
             for k2, a2 in m.arrays.items()},
        )
    # derived operands ([.., g, m] layouts, per-tile permutation tied to
    # the GLOBAL m) cannot ride the generic M-axis spec; drop and rebuild
    # per shard — f32 st/mnt AND the native-factor forms (stq/mnq/sd/sdm,
    # scq/sdn), so TP decode keeps the native scale-DMA win
    arrays = {k: a for k, a in m.arrays.items()
              if k not in _DERIVED_KEYS}
    arrays.update(_reshard_gemv_arrays(m, n))
    out = {}
    for k, a in arrays.items():
        if k in _DERIVED_KEYS:
            spec = P(*([None] * (a.ndim - 1) + ["model"]))
        else:
            spec = P(*([None] * (a.ndim - 2) + ["model", None]))
        out[k] = jax.device_put(a, NamedSharding(mesh, spec))
    return Matrix(m.kind, m.shape, out)


def _spec_for_mat(m: Matrix, mesh: Mesh) -> object:
    """Spec pytree matching :func:`_shard_mat_col` — a Matrix-shaped tree
    of PartitionSpecs so the gemv scale operands (sharded on their LAST
    axis) get per-leaf specs while codes/scales shard on M. Call with the
    PLACED matrix (post-``shard_params_tp``)."""
    n = mesh.shape["model"]
    if not _col_shardable(m, n):
        return P()
    specs = {}
    for k, a in m.arrays.items():
        if k in _DERIVED_KEYS:
            specs[k] = P(*([None] * (a.ndim - 1) + ["model"]))
        else:
            specs[k] = P(*([None] * (a.ndim - 2) + ["model", None]))
    return Matrix(m.kind, m.shape, specs)


def shard_params_tp(params: dict, mesh: Mesh, info: ModelInfo) -> dict:
    """Place parameters for :func:`make_tp_forward` (all-column plan)."""
    if isinstance(params["blocks"], list):
        raise UnsupportedFeature("TP requires the stacked (scan) form")
    rep = NamedSharding(mesh, P())

    def replicate(tree):
        return jax.tree.map(lambda a: jax.device_put(a, rep), tree)

    blocks = dict(params["blocks"])
    att = dict(blocks["att"])
    ffn = dict(blocks["ffn"])
    for k in list(att):
        if isinstance(att[k], Matrix):
            att[k] = (
                _shard_mat_col(att[k], mesh) if k in _COL
                else Matrix(att[k].kind, att[k].shape, replicate(att[k].arrays))
            )
        else:
            att[k] = replicate(att[k])
    for k in list(ffn):
        if isinstance(ffn[k], Matrix):
            ffn[k] = (
                _shard_mat_col(ffn[k], mesh) if k in _COL_FFN
                else Matrix(ffn[k].kind, ffn[k].shape, replicate(ffn[k].arrays))
            )
        else:
            ffn[k] = replicate(ffn[k])
    blocks["att"] = att
    blocks["ffn"] = ffn
    blocks["ln1"] = replicate(blocks["ln1"])
    blocks["ln2"] = replicate(blocks["ln2"])
    return {
        "emb": jax.device_put(params["emb"], rep),
        "ln0": replicate(params["ln0"]),
        "ln_out": replicate(params["ln_out"]),
        "head": _shard_mat_col(params["head"], mesh),
        "blocks": blocks,
    }


def _param_specs(params: dict, mesh: Mesh):
    """in_specs pytree (prefix form: one spec per Matrix) matching
    :func:`shard_params_tp`."""
    blocks = params["blocks"]

    def mat_or_rep(m, shard):
        if isinstance(m, Matrix):
            return _spec_for_mat(m, mesh) if shard else P()
        return P()

    att = {
        k: mat_or_rep(v, k in _COL) if isinstance(v, Matrix)
        else jax.tree.map(lambda _: P(), v)
        for k, v in blocks["att"].items()
    }
    ffn = {
        k: mat_or_rep(v, k in _COL_FFN) if isinstance(v, Matrix)
        else jax.tree.map(lambda _: P(), v)
        for k, v in blocks["ffn"].items()
    }
    return {
        "emb": P(),
        "ln0": jax.tree.map(lambda _: P(), params["ln0"]),
        "ln_out": jax.tree.map(lambda _: P(), params["ln_out"]),
        "head": _spec_for_mat(params["head"], mesh),
        "blocks": {
            "att": att,
            "ffn": ffn,
            "ln1": jax.tree.map(lambda _: P(), blocks["ln1"]),
            "ln2": jax.tree.map(lambda _: P(), blocks["ln2"]),
        },
    }


def _localize(params: dict, info: ModelInfo, axis: str) -> dict:
    """Slice output-side per-head vectors to this device's head range and
    wrap the sharded-input matrices with gather logic."""
    idx = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    C = info.num_emb
    H = info.num_head
    c_loc, h_loc = C // n, H // n

    def sl(a, axis_from_end, size):
        return jax.lax.dynamic_slice_in_dim(a, idx * size, size, a.ndim - axis_from_end)

    blocks = dict(params["blocks"])
    att = dict(blocks["att"])
    for k, ax, unit in _ATT_SLICES[info.version]:
        if k in att:
            att[k] = sl(att[k], ax, h_loc if unit == "H" else c_loc)
    if "gn" in att:
        att["gn"] = {k2: sl(a, 1, c_loc) for k2, a in att["gn"].items()}
    att["Wo"] = _GatherInCol(att["Wo"], axis)
    blocks["att"] = att
    ffn = dict(blocks["ffn"])
    ffn["Wv"] = _GatherInCol(ffn["Wv"], axis)
    if "Wr" in ffn:  # v5/v6 FFN gate: replicated input, full output needed
        ffn["Wr"] = _ColGatherOut(ffn["Wr"], axis)
    blocks["ffn"] = ffn
    out = dict(params)
    out["blocks"] = blocks
    return out


def make_tp_forward(info: ModelInfo, mesh: Mesh, params: dict, *, rescale=None,
                    full_output: bool = False, hooks: dict | None = None,
                    input_embeds: bool = False):
    """Build a jitted tensor+data-parallel ``(params, state, tokens,
    lengths) -> (out, new_state)`` forward under ``shard_map``.

    ``params`` must be placed with :func:`shard_params_tp` (used here
    only for its pytree structure/specs) and the state with
    :func:`shard_state`. Any model version; C/H/hidden must divide the
    model-axis size. ``out`` is the last-token logits per lane
    (default) or, with ``full_output``, the full residual stream
    ``[B, T, C]`` (apply ``logits_head`` yourself) — both replicated over
    ``model``.

    ``hooks`` are resolved at trace time like the single-device path;
    inside the mapped function taps observe PER-DEVICE tensors — the
    batch axis is the local ``data`` shard and output-side channel dims
    (time-mix output, FFN hidden, logits) are the local ``model`` shard.
    ``input_embeds=True`` builds the Token::Embed variant (``tokens`` is
    a ``[B, T, C]`` float embedding tensor instead of ids).
    """
    if info.version not in _ATT_SLICES:
        raise UnsupportedFeature(
            f"shard_map TP: unsupported version {info.version}"
        )
    n = mesh.shape["model"]
    # V4 has no head axis (num_head == 1 by convention); its per-channel
    # state shards on C, so only C/hidden divisibility matters
    h_ok = info.version == ModelVersion.V4 or info.num_head % n == 0
    if info.num_emb % n or not h_ok or info.num_hidden % n:
        raise EngineError(f"C/H/hidden must divide model axis ({n})")

    specs = _param_specs(params, mesh)
    head_sharded = _spec_for_mat(params["head"], mesh) != P()
    if info.version == ModelVersion.V4:
        state_specs = {
            "att_shift": P(None, "data", None),
            "aa": P(None, "data", "model"),
            "bb": P(None, "data", "model"),
            "pp": P(None, "data", "model"),
            "ffn_shift": P(None, "data", None),
        }
    else:
        state_specs = {
            "att_shift": P(None, "data", None),
            "wkv": P(None, "data", "model", None, None),
            "ffn_shift": P(None, "data", None),
        }

    import dataclasses

    # inside the mapped fn every device owns H/n heads (V4: headless)
    info_local = dataclasses.replace(info, num_head=max(1, info.num_head // n))

    def body(params, state, tokens, lengths):
        local = _localize(params, info, "model")
        kw = dict(rescale=rescale, hooks=hooks)
        if input_embeds:
            x, new_state = forward_chunk(
                info_local, local, state, None, lengths,
                input_embeds=tokens, **kw,
            )
        else:
            x, new_state = forward_chunk(
                info_local, local, state, tokens, lengths, **kw
            )
        if full_output:
            return x, new_state
        idx = jnp.clip(lengths - 1, 0, tokens.shape[1] - 1)
        rows = x[jnp.arange(tokens.shape[0]), idx]
        lg = logits_head(local, rows, hooks=hooks)
        if head_sharded:
            lg = jax.lax.all_gather(lg, "model", axis=-1, tiled=True)
        return lg, new_state

    tok_spec = P("data", None, None) if input_embeds else P("data", None)
    out_spec = P("data", None, None) if full_output else P("data", None)
    return jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(specs, state_specs, tok_spec, P("data")),
            out_specs=(out_spec, state_specs),
            check_vma=False,
        )
    )


def make_tp_head(mesh: Mesh, params: dict):
    """Jitted ``(params, rows[N, C]) -> logits[N, V]`` head projection
    under ``shard_map`` for TP-placed params (the Pallas-safe counterpart
    of ``logits_head`` — GSPMD cannot partition a ``pallas_call``). Rows
    are replicated; each device computes its local vocab slice and the
    result is gathered."""
    head_spec = _spec_for_mat(params["head"], mesh)
    sharded = head_spec != P()

    def body(p, rows):
        lg = logits_head(p, rows)
        if sharded:
            lg = jax.lax.all_gather(lg, "model", axis=-1, tiled=True)
        return lg

    specs = {
        "head": head_spec,
        "ln_out": jax.tree.map(lambda _: P(), params["ln_out"]),
    }

    def pick(p):
        return {"head": p["head"], "ln_out": p["ln_out"]}

    mapped = shard_map(
        body, mesh=mesh, in_specs=(specs, P(None, None)),
        out_specs=P(None, None), check_vma=False,
    )
    return jax.jit(lambda p, rows: mapped(pick(p), rows))
