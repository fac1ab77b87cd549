"""Build per-version parameter pytrees from a GGUF/SafeTensors reader.

Ref: src/runtime/loader.rs (vector/matrix loads, LoRA blending, quant
selection, direct-quantized path) and the per-version builders
(v4.rs:840-961, v5.rs:926-1110, v6.rs:994-1200, v7.rs:1039-1227).

Layout decisions (TPU-first):
  * All layer params are stacked with a leading ``[L, ...]`` axis so the
    forward runs as a ``lax.scan`` over layers (one compiled layer body).
  * Big matrices are :class:`Matrix` (dense bf16 or quantized); small
    inner-LoRA adapters are dense f32 arrays.
  * Mixing vectors / decay / bonus params are f32.
  * The embedding table keeps f16 for bit-parity with the reference's CPU
    embed; everything is upcast to f32 before LayerNorm.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.formats import QuantScheme
from .info import ModelInfo, ModelVersion, detect_info
from .matrix import Matrix
from ..errors import TensorNotFound

log = logging.getLogger(__name__)


@dataclass
class LoraPatch:
    """A LoRA to merge at load (ref: loader.rs Lora/LoraBlend).

    ``blend`` maps regex patterns to alpha; the last matching pattern wins
    (ref: loader.rs:373-441).
    """

    reader: object  # GgufFile/SafeTensors-like reader
    blend: list[tuple[str, float]] = field(default_factory=list)

    # the reference's big-matrix pattern (loader.rs:166-174)
    MATRIX_PATTERN = (
        r"blocks\.([0-9]+)\.(att|ffn)\."
        r"(key|value|receptance|gate|output)\.weight"
    )

    @classmethod
    def full(cls, reader, alpha: float) -> "LoraPatch":
        """Replace all vectors, add to all matrices with ``alpha``
        (ref: loader.rs:150-155 ``LoraBlend::full``)."""
        return cls(reader, cls.blend_full(alpha))

    @staticmethod
    def blend_full(alpha: float) -> list[tuple[str, float]]:
        return (LoraPatch.blend_nominal(1.0)
                + LoraPatch.blend_matrices(alpha))

    @staticmethod
    def blend_nominal(alpha: float) -> list[tuple[str, float]]:
        """Interpolate every tensor with factor ``alpha``
        (ref: loader.rs:158-163 ``add_nominal``)."""
        return [(r".+", alpha)]

    @staticmethod
    def blend_matrices(alpha: float) -> list[tuple[str, float]]:
        """Add to all big matrices with ``alpha``
        (ref: loader.rs:166-174 ``add_matrices``)."""
        return [(LoraPatch.MATRIX_PATTERN, alpha)]

    @staticmethod
    def blend_layer_nominal(layer: int, alpha: float) -> list[tuple[str, float]]:
        """ref: loader.rs:177-182 ``add_layer_nominal``."""
        return [(rf"blocks\.{layer}", alpha)]

    @staticmethod
    def blend_layer_matrices(layer: int, alpha: float) -> list[tuple[str, float]]:
        """ref: loader.rs:185-191 ``add_layer_matrices``."""
        return [(
            rf"blocks\.{layer}\.(att|ffn)\."
            rf"(key|value|receptance|gate|output)\.weight",
            alpha,
        )]


def _np(reader, name, dtype=np.float32) -> np.ndarray:
    return np.asarray(reader.tensor(name, dtype))


class _Loader:
    def __init__(self, reader, lora: list[LoraPatch], quant, dtype):
        self.reader = reader
        self.lora = lora
        self.quant = quant or {}
        self.dtype = dtype

    def _lora_vectors(self, name: str):
        import re

        out = []
        for patch in self.lora:
            if not patch.reader.contains(name):
                continue
            alpha = None
            for pattern, a in patch.blend:
                if re.search(pattern, name):
                    alpha = a
            if alpha is None:
                continue
            out.append((alpha, _np(patch.reader, name)))
        return out

    def _lora_matrices(self, name: str):
        """(alpha, A, B) adds alpha/rank * B@A (ref: loader.rs blend_lora)."""
        import re

        out = []
        for patch in self.lora:
            a_name, b_name = f"{name}.lora.0", f"{name}.lora.1"
            if not (patch.reader.contains(a_name) and patch.reader.contains(b_name)):
                continue
            alpha = None
            for pattern, a in patch.blend:
                if re.search(pattern, name):
                    alpha = a
            if alpha is None:
                continue
            out.append((alpha, _np(patch.reader, a_name), _np(patch.reader, b_name)))
        return out

    def vector(self, name: str) -> np.ndarray:
        """f32 vector with LoRA vector blending: x ← α·lora + (1-α)·x
        (ref: loader.rs:459-476 blend factor [alpha, 1-alpha])."""
        v = _np(self.reader, name).reshape(-1)
        for alpha, lv in self._lora_vectors(name):
            v = alpha * lv.reshape(-1) + (1.0 - alpha) * v
        return v

    def vector_exp(self, name: str) -> np.ndarray:
        """-exp(x) — V4 time_decay (ref: loader.rs:480-519 OppositeExp)."""
        return -np.exp(self.vector(name))

    def vector_exp_exp(self, name: str) -> np.ndarray:
        """exp(-exp(x)) — V5 time_decay (ref: loader.rs:521-561 StableExp)."""
        return np.exp(-np.exp(self.vector(name)))

    def _apply_lora_matrix(self, name: str, w: np.ndarray) -> np.ndarray:
        for alpha, a, b in self._lora_matrices(name):
            rank = a.shape[0] if a.ndim == 2 else 1
            w = w + (alpha / rank) * (b.astype(np.float32) @ a.astype(np.float32))
        return w

    def matrix_f32(self, name: str, discount: float = 1.0) -> np.ndarray:
        w = _np(self.reader, name)
        w = self._apply_lora_matrix(name, w)
        if discount != 1.0:
            w = w * discount
        return w

    def matrix(self, name: str, layer: int | None = None, discount: float = 1.0,
               device: bool = True) -> Matrix:
        """Load a big matrix honoring quant config and the direct-quantized
        GGUF path (ref: loader.rs:756-921). ``device=False`` keeps the
        arrays in numpy so per-layer matrices can be stacked host-side
        and transferred once (_stack_matrices)."""
        scheme = self.quant.get(layer, QuantScheme.NONE) if layer is not None else QuantScheme.NONE
        has_lora = bool(self._lora_matrices(name))
        if discount == 1.0 and not has_lora and hasattr(self.reader, "quantized_tensor"):
            qt = self.reader.quantized_tensor(name)
            if qt is not None:
                dtype, raw = qt
                shape = self.reader.shape(name)
                try:
                    return Matrix.from_gguf_blocks(dtype, raw, shape,
                                                   device=device)
                except ValueError:
                    pass
        w = self.matrix_f32(name, discount)
        return Matrix.from_f16(w.astype(np.float16), scheme, self.dtype,
                               device=device)


def _stack(items: list[np.ndarray]) -> np.ndarray:
    # numpy on purpose: the whole load path stays host-side and a single
    # tree-wide device transfer runs at the end of load_model (eager jnp
    # ops each cost a remote XLA compile over this environment's tunnel)
    return np.stack(items)


def _stack_matrices(mats: list[Matrix]):
    """Stack per-layer matrices into one Matrix with leading L axis.

    Mixed storage formats (per-layer quant configs) cannot stack; the
    per-layer list is returned instead and ``load_model`` switches the
    whole block stack to per-layer (unrolled-forward) form."""
    kind = mats[0].kind
    shape = mats[0].shape
    if any(m.kind != kind or m.shape != shape for m in mats):
        return mats
    # stack HOST-side: per-layer arrays at load time are freshly-uploaded
    # numpy-origin buffers, and an eager jnp.stack is a compiled XLA
    # concatenate — one remote compile per array shape (~0.4 s each over
    # this environment's tunnel; 36 of them made a tiny model take 14.5 s
    # to load). np.stack + one device_put per stacked array instead.
    arrays = {
        k: np.stack([np.asarray(m.arrays[k]) for m in mats])
        for k in mats[0].arrays
    }
    return Matrix(kind, shape, arrays)


def pad_matrix_rows(mat, multiple: int = 512):
    """Zero-pad a quantized matrix's output rows up to a multiple of the
    gemv M-tile so the decode kernel grid-pipelines DMA with compute
    instead of running the whole matrix as ONE un-pipelined grid step
    (measured ~2x on the [2688, 768] ffn key: scripts/bench_gemv_ragged.py
    and the stable-session numbers in CLAUDE.md). Padded rows dequantize
    to exactly 0 (zero scales and offsets), so consumers only need to
    slice the extra output columns (forward slices kf to Wv's K). Only
    worthwhile for m > 2*multiple; small matrices run fine whole-M."""
    from .matrix import Matrix, recompute_gemv_arrays

    if not isinstance(mat, Matrix) or mat.kind not in (
        "qk", "qk_b", "qk_nomin", "int8"
    ):
        return mat
    m, k = mat.dims()
    if m % multiple == 0 or m <= 2 * multiple:
        return mat
    pad = -(-m // multiple) * multiple - m
    arrays = {
        key: jnp.asarray(np.pad(np.asarray(a), ((0, pad), (0, 0))))
        for key, a in mat.arrays.items()
        # derived gemv operands are [g, m]-shaped (m on lanes) — drop and
        # rebuild instead of row-padding; the native-factor forms
        # (stq/mnq/sd/sdm) cannot be rebuilt from the f32 products, so a
        # padded matrix falls back to the f32 operand path
        if key not in ("st", "mnt", "stq", "mnq", "sd", "sdm", "scq", "sdn")
    }
    arrays.update({
        key: jnp.asarray(v)  # rebuild is numpy (see matrix._dev)
        for key, v in recompute_gemv_arrays(mat.kind, arrays, m + pad, k).items()
    })
    return Matrix(mat.kind, (m + pad, k), arrays)


def group_gemv_matrices(mats: list) -> dict | None:
    """Stack same-shape quantized matrices for the grouped decode gemv
    (ops/pallas/matmul.py::quant_gemv_grouped): codes row-concatenated,
    each matrix's position-ordered scale operands stacked. Returns None
    when the matrices aren't uniformly eligible (different kinds/shapes,
    no precomputed scale operands, or a tiled — non-whole-M — layout)."""
    from ..ops.pallas.matmul import _gemv_block_m
    from .matrix import Matrix, _gemv_scale_arrays

    if not all(isinstance(mt, Matrix) for mt in mats):
        return None
    kind = mats[0].kind
    if kind not in ("qk", "qk_b", "qk_nomin", "int8"):
        return None
    m, k = mats[0].dims()
    if any(mt.kind != kind or mt.dims() != (m, k) for mt in mats):
        return None
    kdim = mats[0].arrays["codes"].shape[-1]
    if _gemv_block_m(m, kdim) != m:
        return None  # grouped kernel serves one whole matrix per grid step

    def v1_ops(mt):
        # the grouped kernel keeps the v1 per-nibble layout; its operands
        # are built here (Matrix stores the v2 packed-pair layout)
        a = mt.arrays
        if kind == "int8":
            mn = np.asarray(a["mn"], np.float32)
            scales = (np.asarray(a["mx"], np.float32) - mn) / 255.0
            return _gemv_scale_arrays(m, k, scales, mn, kdim=kdim)
        from .matrix import scale_products

        sp, mnp = scale_products(kind, a)
        mins = np.asarray(mnp, np.float32) if mnp is not None else None
        return _gemv_scale_arrays(
            m, k, np.asarray(sp, np.float32), mins, kdim=kdim
        )

    ops = [v1_ops(mt) for mt in mats]
    if not ops[0]:
        return None
    out = {
        "codes": jnp.concatenate([mt.arrays["codes"] for mt in mats]),
        "st": jnp.stack([o["st"] for o in ops]),
    }
    if "mnt" in ops[0]:
        out["mnt"] = jnp.stack([o["mnt"] for o in ops])
    return out


def unroll_params(params: dict) -> dict:
    """Convert stacked ``[L, ...]`` blocks to per-layer list form.

    ``forward_chunk`` runs list-form blocks as an unrolled trace, which
    binds each layer's weights as separate device buffers. For
    single-token decode this removes the ``lax.scan`` dynamic-slice copy
    of every layer's weights per step (measured 1.6x faster decode on the
    0.1B config, 690 -> 433 us/token); prefill runtime is unchanged.
    Compile time grows with depth, and sharded (mesh) runs require the
    stacked form. No-op if the blocks are already a list.
    """
    blocks = params["blocks"]
    if isinstance(blocks, list):
        return params
    leaves = jax.tree.leaves(blocks)
    num_layer = leaves[0].shape[0]
    out = dict(params)
    # eager slicing materializes one device buffer per layer (no host trip)
    # (NOT tile-padding the ffn key here: pad_matrix_rows measured net
    # NEGATIVE end-to-end, see the dead-ends list in CLAUDE.md)
    out["blocks"] = [
        jax.tree.map(lambda a: a[i], blocks) for i in range(num_layer)
    ]
    # grouped r/k/v projection for the fused decode path: one kernel
    # launch instead of three (duplicates the codes — a few MB of HBM —
    # so prefill keeps the per-matrix form)
    for blk in out["blocks"]:
        att = blk.get("att")
        if att and all(key in att for key in ("Wr", "Wk", "Wv")):
            grouped = group_gemv_matrices([att["Wr"], att["Wk"], att["Wv"]])
            if grouped is not None:
                att["Wrkv_g"] = grouped
    return out


def dense_cache_bytes(params: dict, itemsize: int = 2) -> int:
    """HBM bytes a :func:`densify_matrices` cache would add (dense copies
    of every quantized matrix at ``itemsize`` bytes/element) — used by the
    engine's automatic prefill-dense policy."""
    total = 0

    def visit(node):
        nonlocal total
        if isinstance(node, Matrix) and node.kind != "dense":
            m, k = node.dims()
            stack = 1
            codes = node.arrays.get("codes")
            if codes is not None and getattr(codes, "ndim", 2) == 3:
                stack = codes.shape[0]
            total += stack * m * k * itemsize

    def walk(tree):
        if isinstance(tree, Matrix):
            visit(tree)
        elif isinstance(tree, dict):
            for v in tree.values():
                walk(v)
        elif isinstance(tree, list):
            for v in tree:
                walk(v)

    visit(params.get("head"))
    walk(params.get("blocks"))
    return total


def densify_matrices(params: dict, dtype=jnp.bfloat16) -> dict:
    """Dense copies of every quantized matrix (one-time dequantize into
    HBM). Prefill is MXU-bound, not weight-DMA-bound, so running chunks
    against cached dense weights removes the per-chunk dequant VPU work
    entirely — the TPU answer to the reference's finding that its K-quant
    prefill shaders barely broke even (BASELINE.md notes, gguf.rs:1785).
    Decode keeps the quantized arrays (it IS DMA-bound). Cost: dense-model
    HBM footprint alongside the quantized one (~2.3x total for Q4_K)."""

    def densify(node):
        if isinstance(node, Matrix) and node.kind != "dense":
            return Matrix.dense(node.dequantize(dtype))
        return node

    def walk(tree):
        if isinstance(tree, Matrix):
            return densify(tree)
        if isinstance(tree, dict):
            return {k: walk(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v) for v in tree]
        return tree

    out = dict(params)
    out["head"] = densify(params["head"])
    out["blocks"] = walk(params["blocks"])
    out.pop("mega7", None)  # decode-only blocks: not needed for prefill
    out.pop("mega56", None)
    return out


def prepare_decode(params: dict, info, batch_hint: int = 1) -> dict:
    """Arrange params for fastest single-device decode.

    V7 models whose matrices are uniformly quantized get the whole-stack
    decode kernel blocks attached as ``params["mega7"]``
    (ops/pallas/layer7.py — one Pallas launch runs all layers; weights
    stay in the stacked scan form; batches above ~2 lanes switch the
    in-kernel gemv to the batch-independent ``wide`` strategy). Anything
    else — engines decoding batches with no uniform ``MAX_SCAN_BATCH``
    split (see ``layer7.scan_batch_slice``; B=32 runs the kernel per
    16-lane slice), mixed per-layer formats, dense/NF4 weights — falls
    back to :func:`unroll_params` (per-layer buffers, no scan-slice
    copies).
    """
    from ..models.info import ModelVersion
    from ..ops.pallas import config as _pcfg

    from ..ops.pallas.layer7 import scan_batch_slice

    if "mega7" in params or "mega56" in params:
        return params  # already prepped (idempotent: pooled engines share)
    if (
        info.version == ModelVersion.V7
        and scan_batch_slice(batch_hint) is not None
        and _pcfg.use_pallas()
        and not isinstance(params.get("blocks"), list)
    ):
        from ..ops.pallas.layer7 import prep_decode7

        mega = prep_decode7(params, info)
        if mega is not None:
            out = dict(params)
            out["mega7"] = mega
            return out
    if (
        info.version in (ModelVersion.V4, ModelVersion.V5, ModelVersion.V6)
        and scan_batch_slice(batch_hint) is not None
        and _pcfg.use_pallas()
        and not isinstance(params.get("blocks"), list)
    ):
        from ..ops.pallas.layer56 import prep_decode56

        mega = prep_decode56(params, info)
        if mega is not None:
            out = dict(params)
            out["mega56"] = mega
            return out
    return unroll_params(params)


def _has_ragged(tree) -> bool:
    if isinstance(tree, list):
        return True
    if isinstance(tree, dict):
        return any(_has_ragged(v) for v in tree.values())
    return False


def _layer_slice(tree, i):
    if isinstance(tree, list):
        return tree[i]
    if isinstance(tree, dict):
        return {k: _layer_slice(v, i) for k, v in tree.items()}
    if isinstance(tree, Matrix):
        return Matrix(tree.kind, tree.shape, {k: a[i] for k, a in tree.arrays.items()})
    return tree[i]


def _to_per_layer(blocks: dict, L: int) -> list[dict]:
    """Stacked blocks dict → list of per-layer dicts (for mixed-format
    quant configs, which run through the unrolled forward)."""
    return [_layer_slice(blocks, i) for i in range(L)]


def load_model(
    reader,
    *,
    quant: dict[int, QuantScheme] | QuantScheme | None = None,
    lora: list[LoraPatch] | None = None,
    dtype=jnp.bfloat16,
    rescale: int | None = None,
):
    """Load a model into ``(info, params)``.

    ``quant``: per-layer requant scheme (or one scheme for all layers),
    applied when the source matrix is not direct-quantized-loadable.
    ``rescale``: halve-activation interval; weights of ``att.output`` /
    ``ffn.value`` at layer L are pre-multiplied by ``2^-(L//rescale)`` and
    the forward halves the residual every ``rescale`` layers — identity
    math retained for parity with the reference (default: off; f32
    residual cannot overflow). Ref: loader.rs:923-951, v7.rs:1002-1004.
    """
    info = detect_info(reader)
    if isinstance(quant, QuantScheme):
        quant = {i: quant for i in range(info.num_layer)}
    ld = _Loader(reader, lora or [], quant, dtype)

    rescale = rescale or 10**9
    version = info.version
    C, L, H = info.num_emb, info.num_layer, info.num_head
    hs = info.head_size

    params = {
        "emb": jnp.asarray(_np(reader, "emb.weight", np.float16)),
        "ln0": {"w": jnp.asarray(ld.vector("blocks.0.ln0.weight")),
                "b": jnp.asarray(ld.vector("blocks.0.ln0.bias"))},
        "ln_out": {"w": jnp.asarray(ld.vector("ln_out.weight")),
                   "b": jnp.asarray(ld.vector("ln_out.bias"))},
        "head": ld.matrix("head.weight"),
    }

    def ln(prefix):
        return {
            "w": [ld.vector(f"{p}.weight") for p in prefix],
            "b": [ld.vector(f"{p}.bias") for p in prefix],
        }

    ln1 = [f"blocks.{i}.ln1" for i in range(L)]
    ln2 = [f"blocks.{i}.ln2" for i in range(L)]

    blocks: dict = {
        "ln1": {k: _stack(v) for k, v in ln(ln1).items()},
        "ln2": {k: _stack(v) for k, v in ln(ln2).items()},
    }

    def vecs(fmt):
        return _stack([ld.vector(fmt.format(i=i)) for i in range(L)])

    def mats(fmt, discounted=False):
        out = []
        for i in range(L):
            d = 2.0 ** -(i // rescale) if discounted else 1.0
            # device=False: arrays stay numpy so the stack below is one
            # host-side np.stack + one transfer per array (instead of L
            # uploads + an eager jnp.stack compile per shape)
            out.append(ld.matrix(fmt.format(i=i), layer=i, discount=d,
                                 device=False))
        return _stack_matrices(out)

    def dense_f32(fmt):
        return _stack([ld.matrix_f32(fmt.format(i=i)) for i in range(L)])

    def dense_d(fmt):
        """Small dense adapter matrices in the model compute dtype (the
        reference stores/loads these as F16 and matmuls them with its
        fp16 shaders, loader.rs:104-132 + matmul_vec_fp16; bf16 here
        halves their decode HBM traffic vs f32). Converted HOST-side —
        an eager device astype is a remote XLA compile per shape."""
        import ml_dtypes

        np_dtype = (ml_dtypes.bfloat16 if dtype == jnp.bfloat16
                    else np.dtype(dtype))
        return np.stack(
            [ld.matrix_f32(fmt.format(i=i)) for i in range(L)]
        ).astype(np_dtype)

    if version == ModelVersion.V4:
        blocks["att"] = {
            "time_decay": jnp.asarray(-np.exp(
                np.stack([ld.vector(f"blocks.{i}.att.time_decay")
                          for i in range(L)])
            )),
            "time_first": vecs("blocks.{i}.att.time_first"),
            "mix_k": vecs("blocks.{i}.att.time_mix_k"),
            "mix_v": vecs("blocks.{i}.att.time_mix_v"),
            "mix_r": vecs("blocks.{i}.att.time_mix_r"),
            "Wk": mats("blocks.{i}.att.key.weight"),
            "Wv": mats("blocks.{i}.att.value.weight"),
            "Wr": mats("blocks.{i}.att.receptance.weight"),
            "Wo": mats("blocks.{i}.att.output.weight", discounted=True),
        }
        blocks["ffn"] = {
            "mix_k": vecs("blocks.{i}.ffn.time_mix_k"),
            "mix_r": vecs("blocks.{i}.ffn.time_mix_r"),
            "Wk": mats("blocks.{i}.ffn.key.weight"),
            "Wv": mats("blocks.{i}.ffn.value.weight", discounted=True),
            "Wr": mats("blocks.{i}.ffn.receptance.weight"),
        }
    elif version == ModelVersion.V5:
        blocks["att"] = {
            "time_decay": jnp.asarray(
                np.exp(-np.exp(np.stack([ld.vector(f"blocks.{i}.att.time_decay") for i in range(L)])))
            ).reshape(L, H, hs),
            "time_first": vecs("blocks.{i}.att.time_first").reshape(L, H, hs),
            "mix_k": vecs("blocks.{i}.att.time_mix_k"),
            "mix_v": vecs("blocks.{i}.att.time_mix_v"),
            "mix_r": vecs("blocks.{i}.att.time_mix_r"),
            "mix_g": vecs("blocks.{i}.att.time_mix_g"),
            "gn": {"w": vecs("blocks.{i}.att.ln_x.weight"),
                   "b": vecs("blocks.{i}.att.ln_x.bias")},
            "Wk": mats("blocks.{i}.att.key.weight"),
            "Wv": mats("blocks.{i}.att.value.weight"),
            "Wr": mats("blocks.{i}.att.receptance.weight"),
            "Wg": mats("blocks.{i}.att.gate.weight"),
            "Wo": mats("blocks.{i}.att.output.weight", discounted=True),
        }
        blocks["ffn"] = {
            "mix_k": vecs("blocks.{i}.ffn.time_mix_k"),
            "mix_r": vecs("blocks.{i}.ffn.time_mix_r"),
            "Wk": mats("blocks.{i}.ffn.key.weight"),
            "Wv": mats("blocks.{i}.ffn.value.weight", discounted=True),
            "Wr": mats("blocks.{i}.ffn.receptance.weight"),
        }
    elif version == ModelVersion.V6:
        # stacked 5-way mix params in (w, k, v, r, g) order (ref: v6.rs:1057-1075)
        time_mix = np.stack(
            [
                np.stack(
                    [ld.vector(f"blocks.{i}.att.time_mix_{s}") for s in "wkvrg"]
                )
                for i in range(L)
            ]
        )  # [L, 5, C]
        blocks["att"] = {
            "time_decay": vecs("blocks.{i}.att.time_decay"),  # raw; activated in fwd
            "time_first": vecs("blocks.{i}.att.time_first").reshape(L, H, hs),
            "mix_x": vecs("blocks.{i}.att.time_mix_x"),
            "time_mix": np.asarray(time_mix),
            "tm_w1": dense_d("blocks.{i}.att.time_mix_w1"),  # [L, 5r, C]
            "tm_w2": dense_d("blocks.{i}.att.time_mix_w2"),  # [L, 5, C, r]
            "td_w1": dense_d("blocks.{i}.att.time_decay_w1"),  # [L, D, C]
            "td_w2": dense_d("blocks.{i}.att.time_decay_w2"),  # [L, C, D]
            "gn": {"w": vecs("blocks.{i}.att.ln_x.weight"),
                   "b": vecs("blocks.{i}.att.ln_x.bias")},
            "Wk": mats("blocks.{i}.att.key.weight"),
            "Wv": mats("blocks.{i}.att.value.weight"),
            "Wr": mats("blocks.{i}.att.receptance.weight"),
            "Wg": mats("blocks.{i}.att.gate.weight"),
            "Wo": mats("blocks.{i}.att.output.weight", discounted=True),
        }
        blocks["ffn"] = {
            "mix_k": vecs("blocks.{i}.ffn.time_mix_k"),
            "mix_r": vecs("blocks.{i}.ffn.time_mix_r"),
            "Wk": mats("blocks.{i}.ffn.key.weight"),
            "Wv": mats("blocks.{i}.ffn.value.weight", discounted=True),
            "Wr": mats("blocks.{i}.ffn.receptance.weight"),
        }
    else:  # V7
        zeros_c = np.zeros(C, np.float32)

        def v7_vec(i, s, default=None):
            name = f"blocks.{i}.att.{s}"
            if reader.contains(name):
                return ld.vector(name)
            if default is not None:
                return default
            raise TensorNotFound(name)

        v0 = [v7_vec(i, "v0", zeros_c if i == 0 else None) for i in range(L)]
        dv = info.custom.v or 1
        zero_v1 = np.zeros((dv, C), np.float32)
        zero_v2 = np.zeros((C, dv), np.float32)
        v1 = [zero_v1 if i == 0 else ld.matrix_f32(f"blocks.{i}.att.v1") for i in range(L)]
        v2 = [zero_v2 if i == 0 else ld.matrix_f32(f"blocks.{i}.att.v2") for i in range(L)]

        blocks["att"] = {
            **{f"x_{s}": vecs("blocks.{i}.att.x_" + s) for s in "rwkvag"},
            "w0": vecs("blocks.{i}.att.w0"),
            "a0": vecs("blocks.{i}.att.a0"),
            "v0": _stack(v0),
            "w1": dense_d("blocks.{i}.att.w1"),
            "w2": dense_d("blocks.{i}.att.w2"),
            "a1": dense_d("blocks.{i}.att.a1"),
            "a2": dense_d("blocks.{i}.att.a2"),
            "g1": dense_d("blocks.{i}.att.g1"),
            "g2": dense_d("blocks.{i}.att.g2"),
            "v1": _stack(v1).astype(dtype),
            "v2": _stack(v2).astype(dtype),
            "r_k": _stack([_np(reader, f"blocks.{i}.att.r_k").reshape(H, hs) for i in range(L)]),
            "k_k": vecs("blocks.{i}.att.k_k"),
            "k_a": vecs("blocks.{i}.att.k_a"),
            "gn": {"w": vecs("blocks.{i}.att.ln_x.weight"),
                   "b": vecs("blocks.{i}.att.ln_x.bias")},
            "Wk": mats("blocks.{i}.att.key.weight"),
            "Wv": mats("blocks.{i}.att.value.weight"),
            "Wr": mats("blocks.{i}.att.receptance.weight"),
            "Wo": mats("blocks.{i}.att.output.weight", discounted=True),
        }
        att = blocks["att"]
        # decode fast-path stacks: one lerp serves all six token shifts,
        # two MXU dots serve all four inner-LoRA adapter pairs (forward's
        # _lora_stacked masks the cross blocks to exact zeros)
        att["x_stack"] = np.stack(
            [np.asarray(att[f"x_{s}"]) for s in "rwkvag"], axis=1
        )  # [L, 6, C]
        att["lora_down"] = np.concatenate(
            [np.asarray(att[k]) for k in ("w1", "a1", "g1", "v1")], axis=1
        )  # [L, D, C], D = dw+da+dg+dv
        att["lora_up"] = np.concatenate(
            [np.asarray(att[k]) for k in ("w2", "a2", "g2", "v2")], axis=2
        )  # [L, C, D]
        blocks["ffn"] = {
            "x_k": vecs("blocks.{i}.ffn.x_k"),
            "Wk": mats("blocks.{i}.ffn.key.weight"),
            "Wv": mats("blocks.{i}.ffn.value.weight", discounted=True),
        }

    if _has_ragged(blocks):
        log.info("mixed per-layer quantization: using per-layer (unrolled) form")
        blocks = _to_per_layer(blocks, L)
    params["blocks"] = blocks
    # single tree-wide device transfer: everything above computed in
    # numpy (stacks, dtype casts, LoRA blends) — 36 eager jnp ops here
    # used to cost 14.5 s of remote XLA compiles for a tiny model
    host_params = params
    params = jax.tree.map(
        lambda a: a if isinstance(a, jax.Array) else jnp.asarray(a), params
    )
    # attach the pre-transfer numpy arrays as host mirrors on each
    # Matrix (Matrix.host): decode prep / TP placement read weights
    # host-side, and without the mirror every read is a device→host
    # fetch back over the link (~30 s for a 0.1B model here). Costs
    # host RAM about the file size; dropped at any jit/tree boundary.
    _attach_host_mirrors(params, host_params)
    return info, params


def _attach_host_mirrors(placed, host) -> None:
    """Walk ``placed`` and ``host`` in parallel and set ``Matrix.host``
    to the pre-transfer numpy array dict (skipping matrices whose
    arrays were already device-resident)."""
    if isinstance(placed, Matrix) and isinstance(host, Matrix):
        if all(not isinstance(a, jax.Array) for a in host.arrays.values()):
            placed.host = host.arrays
        return
    if isinstance(placed, dict) and isinstance(host, dict):
        for k, v in placed.items():
            _attach_host_mirrors(v, host.get(k))
    elif isinstance(placed, list) and isinstance(host, list):
        for p, h in zip(placed, host):
            _attach_host_mirrors(p, h)


def load_initial_state(reader, info: ModelInfo) -> np.ndarray:
    """Load a pretrained ``time_state`` (per-layer WKV init) from a file.

    Returns ``[L, H, K, V]`` f32, the WKV part of the engine state
    (ref: v7.rs:1229-1262 — the reference transposes the stored
    ``[H·V, K]`` matrix into its state rows).
    """
    L, H, hs = info.num_layer, info.num_head, info.head_size
    out = np.zeros((L, H, hs, hs), np.float32)
    for layer in range(L):
        st = _np(reader, f"blocks.{layer}.att.time_state")
        # stored [num_emb(head*v), head_size(k)] → per head [v, k] → [k, v]
        st = st.reshape(H, hs, hs).transpose(0, 2, 1)
        out[layer] = st
    return out
