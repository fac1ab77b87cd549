"""Weight-matrix abstraction over storage formats (dense / Int8 / NF4 /
GGML K-quants), registered as a JAX pytree so matrices stack across layers
and flow through ``lax.scan`` / ``jit`` / sharding.

Physical layout is output-major ``[M, K]`` (row = output feature), the
same major order as GGUF, so quantization block structures run along K.
``matmul(x)`` computes ``x @ Wᵀ`` via einsum; XLA contracts on the MXU
either way. Quantized formats dequantize on the fly (XLA fuses the
elementwise expansion); the Pallas fused kernels in ``ops/pallas`` replace
this on TPU for the supported formats.

Ref: src/tensor/matrix.rs (Matrix enum + dispatch).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.ggml import GgmlDType
from ..quant import formats as qf
from ..errors import LoaderError, UnsupportedTensorType


def _gemv_scale_arrays(m: int, k: int, scales, mins, kdim: int | None = None) -> dict:
    """v1 position-ordered scale operands (ops/pallas/matmul.py::
    ``_quant_gemv``, the per-nibble-extraction kernel) — still used by the
    NF4/SF4 LUT path and the grouped r/k/v kernel.

    The v1 kernel's bitcast unpack interleaves rows within each M-tile
    (position tile·BM + b·BM/4 + s ↔ logical row tile·BM + 4s + b); its
    scale operands must be [G, M] in that position order. ``kdim`` is the
    packed code-block K width (k/2 for nibble-packed kinds); the M-tile
    choice must match the kernel's (same ``_gemv_block_m`` call).
    """
    from ..ops.pallas.matmul import _gemv_block_m

    bm = _gemv_block_m(m, kdim if kdim is not None else k)
    if bm is None:
        return {}
    g = scales.shape[-1]

    def to_pos(a):
        a = np.asarray(a, np.float32).reshape(m // bm, bm // 4, 4, g)
        return np.ascontiguousarray(a.transpose(3, 0, 2, 1).reshape(g, m))

    out = {"st": to_pos(scales)}  # numpy: see _dev
    if mins is not None:
        out["mnt"] = to_pos(mins)
    return out


def _gemv_ops(kind, scales, mins, m, k, kdim, signed) -> dict:
    """v2 packed-pair gemv operands (ops/pallas/matmul.py::
    ``build_gemv_operands``): scale rows + the folded offset operand."""
    from ..ops.pallas.matmul import build_gemv_operands

    return build_gemv_operands(kind, scales, mins, m, k, kdim, signed)


def scale_products(kind: str, a: dict):
    """Per-group f32 ``(scales, mins|None)`` for a quantized Matrix —
    read from the stored arrays, or formed from the native factor arrays
    when the f32 products were slimmed at load (bit-exact: the repackers
    built ``scales`` as ``d.repeat(r) * sc`` in f32, see
    quant/repack.py::q4k_scale_factors). Works on stacked ``[L, ...]``
    arrays and under a jit trace."""
    if "scales" in a:
        mins = a["mins"].astype(jnp.float32) if "mins" in a else None
        return a["scales"].astype(jnp.float32), mins
    if "sc6" in a:  # qk / qk_b native factors (scale + min codes)
        sc = a["sc6"]
        d = a["d8"].astype(jnp.float32)
        reps = sc.shape[-1] // d.shape[-1]
        scales = jnp.repeat(d, reps, axis=-1) * sc.astype(jnp.float32)
        mins = (jnp.repeat(a["dm8"].astype(jnp.float32), reps, axis=-1)
                * a["mn6"].astype(jnp.float32))
        return scales, mins
    if "q6s" in a:  # qk_nomin native factors (signed scale codes)
        sc = a["q6s"].astype(jnp.int8)
        d = a["q6d"].astype(jnp.float32)
        reps = sc.shape[-1] // d.shape[-1]
        scales = jnp.repeat(d, reps, axis=-1) * sc.astype(jnp.float32)
        return scales, None
    raise LoaderError(f"no scale arrays for kind {kind!r}: {sorted(a)}")


def recompute_gemv_arrays(
    kind: str, arrays: dict, m: int, k: int, signed: bool | None = None
) -> dict:
    """Rebuild the derived gemv scale operands ("st"/"mnt") for a Matrix
    reconstructed from storage (snapshots drop them — their layout is
    tied to the kernel M-tile choice). Handles layer-stacked arrays.
    ``signed`` (code dtype) matters for qk_nomin's offset fold; inferred
    from ``arrays["codes"]`` when present."""
    if signed is None and "codes" in arrays:
        signed = np.asarray(arrays["codes"]).dtype == np.int8
    if kind == "int8":
        mn = np.asarray(arrays["mn"], np.float32)
        mx = np.asarray(arrays["mx"], np.float32)
        return _gemv_ops(kind, (mx - mn) / 255.0, mn, m, k, k, False)
    if kind in ("qk", "qk_b", "qk_nomin"):
        s, mn = scale_products(kind, arrays)
        s = np.asarray(s, np.float32)
        mn = np.asarray(mn, np.float32) if mn is not None else None
        if kind == "qk":
            return _gemv_ops(kind, s, mn, m, k, k // 2, False)
        if kind == "qk_b":
            return _gemv_ops(kind, s, mn, m, k, k, False)
        if signed is None:
            raise ValueError("qk_nomin operand rebuild needs the code sign")
        return _gemv_ops(kind, s, None, m, k, k, signed)
    if kind == "nf4":
        am = np.asarray(arrays["absmax"], np.float32)
        scales = np.concatenate([am, am], -1)
        if scales.ndim == 2:
            return _gemv_scale_arrays(m, k, scales, None, kdim=k // 2)
        outs = [
            _gemv_scale_arrays(m, k, scales[i], None, kdim=k // 2)
            for i in range(scales.shape[0])
        ]
        if not outs or not outs[0]:
            return {}
        return {key: np.stack([np.asarray(o[key]) for o in outs])
                for key in outs[0]}
    return {}


def _dev(arrays: dict, device: bool = True) -> dict:
    """Final numpy -> device transfer for a load-time array dict. The
    whole load path computes in numpy (eager jnp ops each trigger a
    remote XLA compile over this environment's tunnel — 36 of them made
    a tiny model take 14.5 s to load); device=False keeps numpy so the
    stacked loader can np.stack per-layer matrices host-side and
    transfer once."""
    if not device:
        return arrays
    return {k: jnp.asarray(v) for k, v in arrays.items()}


def _native_b_arrays(factors, m, k) -> dict:
    """Native byte-kind (qk_b) scale-factor arrays: tiled operands for
    the gemv (shared stq/mnq/sd/sdm keys — the Matrix kind disambiguates
    the form) plus the raw row-major factors for the layer-scan prep."""
    from ..ops.pallas.matmul import build_gemv_operands_native

    sc, mn, d, dmin = factors
    arrays = dict(build_gemv_operands_native(sc, mn, d, dmin, m, k, k))
    arrays.update({"sc6": sc, "mn6": mn, "d8": d, "dm8": dmin})
    return arrays


@jax.tree_util.register_pytree_node_class
@dataclass
class Matrix:
    kind: str  # "dense" | "int8" | "nf4" | "qk" | "qk_nomin" (static)
    shape: tuple[int, int]  # logical (M, K) without layer stacking (static)
    arrays: dict[str, Any]  # format-specific arrays (leaves)
    # optional NUMPY mirror of ``arrays`` attached by the loader (not a
    # pytree field — dropped at any jit/tree boundary). Decode prep and
    # TP placement read weights host-side; without the mirror every read
    # is a device→host transfer over whatever link the device sits
    # behind (~30 s for a 0.1B model on this environment's tunnel).
    host: dict | None = None

    def host_arrays(self) -> dict | None:
        """The loader-attached numpy mirror, VALIDATED against the live
        arrays (same keys, shapes, dtypes) so a stale mirror — e.g. a
        dataclasses.replace that swapped ``arrays`` but carried ``host``
        along — can never silently feed the decode preps; None when
        absent or inconsistent."""
        h = self.host
        if h is None or set(h) != set(self.arrays):
            return None
        for k, v in h.items():
            a = self.arrays[k]
            if (tuple(v.shape) != tuple(a.shape)
                    or np.dtype(v.dtype) != np.dtype(a.dtype)):
                return None
        return h

    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        return tuple(self.arrays[k] for k in keys), (self.kind, self.shape, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, shape, keys = aux
        return cls(kind, shape, dict(zip(keys, children)))

    # -- constructors ------------------------------------------------------

    @classmethod
    def dense(cls, w: jax.Array | np.ndarray) -> "Matrix":
        return cls("dense", tuple(w.shape[-2:]), {"w": w})

    @classmethod
    def from_f16(
        cls, w: np.ndarray, scheme: qf.QuantScheme, dtype=jnp.bfloat16,
        device: bool = True,
    ) -> "Matrix":
        """Build from a dense [M, K] matrix with optional engine requant
        (ref: Quant::{None,Int8,NF4,SF4}, src/tensor/matrix.rs:211-271)."""
        import ml_dtypes

        m, k = w.shape
        # dtype conversion HOST-side (ml_dtypes covers bf16): an eager
        # device-side astype is a remote XLA compile per shape (see _dev)
        np_dtype = np.dtype(dtype) if dtype != jnp.bfloat16 else ml_dtypes.bfloat16

        def dense(arr):
            arr = np.asarray(arr).astype(np_dtype)
            return cls("dense", tuple(arr.shape[-2:]),
                       _dev({"w": arr}, device))

        if scheme == qf.QuantScheme.NONE:
            return dense(w)
        block = qf.INT8_BLOCK_SIZE if scheme == qf.QuantScheme.INT8 else qf.NF4_BLOCK_SIZE
        if k % block:
            # row-aligned block layout needs K divisible by the block size;
            # tiny matrices stay dense
            return dense(w)
        if scheme == qf.QuantScheme.INT8:
            codes, mn, mx = qf.quantize_int8(np.asarray(w, np.float32))
            g = qf.INT8_BLOCK_SIZE
            mn2 = mn.astype(np.float32).reshape(m, k // g)
            mx2 = mx.astype(np.float32).reshape(m, k // g)
            return cls(
                "int8",
                (m, k),
                _dev({
                    "codes": codes.reshape(m, k),
                    "mn": mn2,
                    "mx": mx2,
                    **_gemv_ops("int8", (mx2 - mn2) / 255.0, mn2, m, k, k, False),
                }, device),
            )
        if scheme in (qf.QuantScheme.NF4, qf.QuantScheme.SF4):
            lut = qf.NF4_QUANTILES if scheme == qf.QuantScheme.NF4 else qf.sf4_quantiles()
            packed, absmax, lut = qf.quantize_nf4(np.asarray(w, np.float32), lut)
            g = qf.NF4_BLOCK_SIZE
            am = absmax.astype(np.float32).reshape(m, k // g)
            return cls(
                "nf4",
                (m, k),
                _dev({
                    "codes": packed.reshape(m, k // 2),
                    "absmax": am,
                    "lut": np.asarray(lut),
                    # tiled-absmax position-ordered scale operand for the
                    # fused LUT gemv (lo/hi planes share the per-64 group)
                    **_gemv_scale_arrays(
                        m, k, np.concatenate([am, am], -1), None, kdim=k // 2
                    ),
                }, device),
            )
        raise LoaderError(f"unsupported scheme {scheme}")

    @classmethod
    def from_gguf_blocks(cls, dtype: GgmlDType, raw: np.ndarray, shape,
                         device: bool = True) -> "Matrix":
        """Direct-quantized load: repack raw GGML blocks into TPU-friendly
        structured arrays (consecutive nibble order, de-interleaved scales).

        The repack preserves exact dequant values: effective per-32-group
        scale/min are precomputed in f32 (`d*sc`, `dmin*m`) exactly as the
        reference kernels compute them (ref: matmul_vec_q4k_v2.wgsl).
        """
        from ..quant import repack

        m, k = int(shape[0]), int(shape[1])

        def slim(arrays: dict) -> dict:
            # With native factors present, the f32 scale products AND the
            # precomputed gemv operands are redundant resident HBM (for
            # the 16-element-group kinds they weigh 1.25 B/weight — more
            # than Q2_K's own codes): the narrow gemv streams the native
            # forms; every other consumer derives the f32 products
            # in-trace from the factor arrays (scale_products /
            # _derive_gemv_operands_traced) — bit-exactly, since the
            # repackers formed them as d·sc in f32 to begin with.
            if "stq" in arrays or "scq" in arrays:
                arrays.pop("st", None)
                arrays.pop("mnt", None)
                arrays.pop("scales", None)
                arrays.pop("mins", None)
            return arrays
        if dtype == GgmlDType.Q4_K:
            codes, scales, mins = repack.repack_q4_k(raw, m, k)
            arrays = {
                "codes": codes,
                "scales": scales,
                "mins": mins,
                **_gemv_ops("qk", scales, mins, m, k, k // 2, False),
            }
            factors = repack.q4k_scale_factors(raw, m, k)
            if factors is not None:
                # native 6-bit + super-scale operands: the decode gemv
                # streams these instead of the f32 product arrays. The
                # raw row-major factors (sc6/mn6/d8/dm8) are kept too —
                # the layer-scan kernel (ops/pallas/layer7.py) derives
                # its own plain-transposed layout from them at prep time
                from ..ops.pallas.matmul import build_gemv_operands_native

                sc6, mn6, d8, dm8 = factors
                arrays.update(
                    build_gemv_operands_native(sc6, mn6, d8, dm8, m, k, k // 2)
                )
                arrays.update({
                    "sc6": sc6, "mn6": mn6, "d8": d8, "dm8": dm8,
                })
            return cls("qk", (m, k), _dev(slim(arrays), device))
        if dtype == GgmlDType.Q5_K:
            codes, scales, mins = repack.repack_q5_k(raw, m, k)
            arrays = {
                "codes": codes,
                "scales": scales,
                "mins": mins,
                **_gemv_ops("qk_b", scales, mins, m, k, k, False),
            }
            factors = repack.q5k_scale_factors(raw, m, k)
            if factors is not None:
                arrays.update(_native_b_arrays(factors, m, k))
            return cls("qk_b", (m, k), _dev(slim(arrays), device))
        if dtype == GgmlDType.Q6_K:
            codes, scales = repack.repack_q6_k(raw, m, k)
            arrays = {
                "codes": codes, "scales": scales,
                **_gemv_ops("qk_nomin", scales, None, m, k, k,
                            codes.dtype == np.int8),
            }
            factors = repack.q6k_scale_factors(raw, m, k)
            if factors is not None:
                # native signed scale codes + super-scales (see Q4_K
                # branch above); raw forms kept for the layer-scan prep
                from ..ops.pallas.matmul import build_gemv_operands_native_nomin

                sc8, d8 = factors
                arrays.update(
                    build_gemv_operands_native_nomin(sc8, d8, m, k, k)
                )
                arrays.update({"q6s": sc8, "q6d": d8})
            return cls("qk_nomin", (m, k), _dev(slim(arrays), device))
        if dtype == GgmlDType.Q8_0:
            codes, scales = repack.repack_q8_0(raw, m, k)
            return cls(
                "qk_nomin",
                (m, k),
                _dev({"codes": codes, "scales": scales,
                      **_gemv_ops("qk_nomin", scales, None, m, k, k,
                                  codes.dtype == np.int8)}, device),
            )
        if dtype == GgmlDType.Q3_K:
            codes, scales = repack.repack_q3_k(raw, m, k)
            arrays = {
                "codes": codes, "scales": scales,
                **_gemv_ops("qk_nomin", scales, None, m, k, k,
                            codes.dtype == np.int8),
            }
            factors = repack.q3k_scale_factors(raw, m, k)
            if factors is not None:
                # same no-min native contract as Q6_K (keys shared so the
                # gemv dispatch and layer-scan prep treat them uniformly)
                from ..ops.pallas.matmul import build_gemv_operands_native_nomin

                sc8, d8 = factors
                arrays.update(
                    build_gemv_operands_native_nomin(sc8, d8, m, k, k)
                )
                arrays.update({"q6s": sc8, "q6d": d8})
            return cls("qk_nomin", (m, k), _dev(slim(arrays), device))
        if dtype == GgmlDType.Q2_K:
            codes, scales, mins = repack.repack_q2_k(raw, m, k)
            arrays = {
                "codes": codes,
                "scales": scales,
                "mins": mins,
                **_gemv_ops("qk_b", scales, mins, m, k, k, False),
            }
            factors = repack.q2k_scale_factors(raw, m, k)
            if factors is not None:
                arrays.update(_native_b_arrays(factors, m, k))
            return cls("qk_b", (m, k), _dev(slim(arrays), device))
        if dtype == GgmlDType.Q4_0:
            if k % 64 == 0:
                # Q4_0 is the Q4_K group form with mn = 8·d: split-halves
                # nibble packing puts it on the full "qk" fast path
                codes, scales, mins = repack.repack_q4_0(raw, m, k)
                return cls(
                    "qk",
                    (m, k),
                    _dev({"codes": codes, "scales": scales, "mins": mins,
                          **_gemv_ops("qk", scales, mins, m, k, k // 2,
                                      False)}, device),
                )
            codes, scales = repack.repack_q4_0_bytes(raw, m, k)
            return cls(
                "qk_nomin",
                (m, k),
                _dev({"codes": codes, "scales": scales,
                      **_gemv_ops("qk_nomin", scales, None, m, k, k,
                                  codes.dtype == np.int8)}, device),
            )
        if dtype == GgmlDType.Q4_1:
            # d·nib + m == the qk form with mn = −m (legacy type the
            # reference cannot load at all, gguf.rs:1714)
            if k % 64 == 0:
                codes, scales, mins = repack.repack_q4_1(raw, m, k)
                return cls(
                    "qk",
                    (m, k),
                    _dev({"codes": codes, "scales": scales, "mins": mins,
                          **_gemv_ops("qk", scales, mins, m, k, k // 2,
                                      False)}, device),
                )
            codes, scales, mins = repack.repack_q4_1_bytes(raw, m, k)
            return cls(
                "qk_b",
                (m, k),
                _dev({"codes": codes, "scales": scales, "mins": mins,
                      **_gemv_ops("qk_b", scales, mins, m, k, k,
                                  False)}, device),
            )
        if dtype in (GgmlDType.Q5_0, GgmlDType.Q5_1):
            # 5-bit byte codes on the Q5_K qk_b path (mn = 16·d / −m);
            # legacy types the reference cannot load (gguf.rs:1714)
            fn = (repack.repack_q5_0 if dtype == GgmlDType.Q5_0
                  else repack.repack_q5_1)
            codes, scales, mins = fn(raw, m, k)
            return cls(
                "qk_b",
                (m, k),
                _dev({"codes": codes, "scales": scales, "mins": mins,
                      **_gemv_ops("qk_b", scales, mins, m, k, k,
                                  False)}, device),
            )
        raise UnsupportedTensorType(f"no direct-quantized repack for {dtype!r}")

    # -- compute -----------------------------------------------------------

    def dims(self) -> tuple[int, int]:
        """Logical (M, K) derived from the array shapes.

        ``self.shape`` records the shape at construction, which is the
        GLOBAL shape — inside a ``shard_map`` the arrays are per-device
        shards, so compute paths must use these derived local dims.
        """
        a = self.arrays
        if self.kind == "dense":
            return tuple(a["w"].shape[-2:])
        m, kc = a["codes"].shape[-2:]
        if self.kind in ("qk", "nf4"):  # nibble-packed: 2 elements/byte
            return (m, kc * 2)
        return (m, kc)

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """Materialize the dense [..., M, K] weight matrix."""
        a = self.arrays
        if self.kind == "dense":
            return a["w"].astype(dtype)
        K = self.dims()[1]
        if self.kind == "int8":
            g = K // a["mn"].shape[-1]
            x = a["codes"].astype(jnp.float32) / 255.0
            mn = jnp.repeat(a["mn"], g, axis=-1)
            mx = jnp.repeat(a["mx"], g, axis=-1)
            return (mn + x * (mx - mn)).astype(dtype)
        if self.kind == "nf4":
            codes = a["codes"]
            lut = a["lut"]
            if lut.ndim > 1:  # layer-stacked matrix: the LUT is identical per layer
                lut = lut[0]
            lo = lut[(codes & 0x0F).astype(jnp.int32)]
            hi = lut[(codes >> 4).astype(jnp.int32)]
            w = jnp.stack([lo, hi], axis=-1).reshape(codes.shape[:-1] + (K,))
            g = K // a["absmax"].shape[-1]
            return (w * jnp.repeat(a["absmax"], g, axis=-1)).astype(dtype)
        if self.kind == "qk":
            # split-halves nibble packing: byte j = el(j) | el(j+K/2)<<4
            codes = a["codes"]  # uint8 [..., M, K/2]
            lo = (codes & 0x0F).astype(jnp.float32)
            hi = (codes >> 4).astype(jnp.float32)
            q = jnp.concatenate([lo, hi], axis=-1)
            sp, mnp = scale_products(self.kind, a)
            g = K // sp.shape[-1]
            s = jnp.repeat(sp, g, axis=-1)
            mn = jnp.repeat(mnp, g, axis=-1)
            return (q * s - mn).astype(dtype)
        if self.kind == "qk_b":
            q = a["codes"].astype(jnp.float32)
            sp, mnp = scale_products(self.kind, a)
            g = K // sp.shape[-1]
            s = jnp.repeat(sp, g, axis=-1)
            mn = jnp.repeat(mnp, g, axis=-1)
            return (q * s - mn).astype(dtype)
        if self.kind == "qk_nomin":
            q = a["codes"].astype(jnp.float32)
            sp, _ = scale_products(self.kind, a)
            g = K // sp.shape[-1]
            s = jnp.repeat(sp, g, axis=-1)
            return (q * s).astype(dtype)
        raise LoaderError(f"unknown matrix kind {self.kind}")

    def matmul(self, x: jax.Array, precision=None) -> jax.Array:
        """``y[..., m] = Σ_k x[..., k] W[m, k]`` with f32 accumulation.

        For layer-stacked matrices (arrays carry a leading L axis) call
        through ``lax.scan`` so each slice is a plain [M, K]. On TPU,
        quantized kinds dispatch to the fused Pallas dequant-matmul.
        """
        def _pow2_divisor(n):
            d = 1
            while n % (d * 2) == 0:
                d *= 2
            return d

        if (
            self.kind in ("qk", "qk_b", "qk_nomin", "int8", "nf4")
            and self.arrays["codes"].ndim == 2
            # Mosaic needs an M-tile of at least 8 sublanes; matrices whose
            # M has no pow2 divisor >= 8 (e.g. odd vocab sizes) take the
            # XLA path
            and _pow2_divisor(self.dims()[0]) >= 8
        ):
            from ..ops.pallas import config as _pcfg

            if _pcfg.use_pallas() and not _pcfg.interpret:
                from ..ops.pallas.matmul import quant_matmul

                m, k = self.dims()
                lead = x.shape[:-1]
                n = 1
                for d in lead:
                    n *= d
                y = quant_matmul(x.reshape(n, x.shape[-1]), self.kind, self.arrays, m, k)
                return y.reshape(lead + (m,))
        if self.kind in ("qk_nomin", "qk_b", "int8") and x.ndim >= 2:
            return self._matmul_grouped(x)
        # dense matrices honor their storage dtype (f32 loads give exact
        # math for parity/QA); quantized paths compute in bf16
        cdtype = (
            self.arrays["w"].dtype if self.kind == "dense" else jnp.bfloat16
        )
        w = self.dequantize(cdtype)
        return jnp.einsum(
            "...k,mk->...m", x.astype(cdtype), w,
            preferred_element_type=jnp.float32,
        )

    def _matmul_grouped(self, x: jax.Array) -> jax.Array:
        """Group-factored quantized matmul: contract integer codes on the
        MXU, then apply per-group scales — avoids materializing the dense
        dequantized matrix.

        y[m] = Σ_g s[m,g]·(Σ_{k∈g} c[m,k]·x[k]) + Σ_g off[m,g]·(Σ_{k∈g} x[k])
        """
        a = self.arrays
        m, k = self.dims()
        if self.kind == "int8":
            # w = mn + (c/255)(mx-mn) → scale = (mx-mn)/255, offset = mn
            scales = (a["mx"].astype(jnp.float32) - a["mn"].astype(jnp.float32)) / 255.0
            offsets = a["mn"].astype(jnp.float32)
        else:
            sp, mnp = scale_products(self.kind, a)
            scales = sp
            offsets = -mnp if mnp is not None else None
        g = scales.shape[-1]
        gsize = k // g
        codes = a["codes"].astype(jnp.bfloat16)
        xg = x.astype(jnp.bfloat16).reshape(x.shape[:-1] + (g, gsize))
        # partial sums per group: [..., g, m]
        p = jnp.einsum(
            "...gk,mgk->...gm",
            xg,
            codes.reshape(m, g, gsize),
            preferred_element_type=jnp.float32,
        )
        y = jnp.einsum("...gm,mg->...m", p, scales)
        if offsets is not None:
            xs = xg.astype(jnp.float32).sum(-1)  # [..., g]
            y = y + jnp.einsum("...g,mg->...m", xs, offsets)
        return y

