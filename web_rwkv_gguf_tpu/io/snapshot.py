"""Prequantized model snapshots: save/load the whole params pytree.

The reference serializes its (possibly quantized) ``Model`` via cbor
blobs and reloads without requantizing (examples/serde.rs,
src/tensor/serialization.rs:49-159). Here the pytree is flattened to
``path/leaf`` keys inside an ``.npz`` with a JSON manifest capturing
pytree structure, Matrix kinds/shapes, and ModelInfo.
"""

from __future__ import annotations

import io
import json
import zipfile
from dataclasses import asdict

import numpy as np

from ..models.info import CustomInfo, ModelInfo, ModelVersion
from ..models.matrix import Matrix

_MANIFEST = "__manifest__.json"


def _flatten(tree, prefix, arrays, manifest):
    if isinstance(tree, Matrix):
        entry = {"type": "matrix", "kind": tree.kind, "shape": list(tree.shape)}
        manifest[prefix] = entry
        for k, v in tree.arrays.items():
            # "st"/"mnt" are derived gemv scale operands whose layout is
            # tied to the kernel's M-tile choice — recomputed on load so a
            # snapshot never pins a stale tiling
            if k in ("st", "mnt"):
                continue
            arr = np.asarray(v)
            if arr.dtype.name == "bfloat16":
                entry.setdefault("bf16", []).append(k)
                arr = arr.view(np.uint16)
            arrays[f"{prefix}/{k}"] = arr
    elif isinstance(tree, dict):
        manifest[prefix] = {"type": "dict", "keys": sorted(tree.keys())}
        for k in sorted(tree.keys()):
            _flatten(tree[k], f"{prefix}/{k}", arrays, manifest)
    else:
        arr = np.asarray(tree)
        entry = {"type": "array", "dtype": str(arr.dtype)}
        if arr.dtype.name == "bfloat16":
            entry["bf16"] = True
            arr = arr.view(np.uint16)
        manifest[prefix] = entry
        arrays[prefix] = arr


def _unflatten(prefix, arrays, manifest, jnp):
    import ml_dtypes

    entry = manifest[prefix]
    if entry["type"] == "matrix":
        host_arrays = {}
        bf16 = set(entry.get("bf16", []))
        pfx = prefix + "/"
        for k in arrays.files:
            if k.startswith(pfx) and "/" not in k[len(pfx):]:
                a = arrays[k]
                if k[len(pfx):] in bf16:
                    a = a.view(ml_dtypes.bfloat16)
                host_arrays[k[len(pfx):]] = a
        if "codes" in host_arrays and "st" not in host_arrays:
            from ..models.matrix import recompute_gemv_arrays

            mk = Matrix(entry["kind"], tuple(entry["shape"]), host_arrays)
            m, k = mk.dims()
            host_arrays.update(
                recompute_gemv_arrays(entry["kind"], host_arrays, m, k)
            )
        mat = Matrix(
            entry["kind"], tuple(entry["shape"]),
            {k2: jnp.asarray(v) for k2, v in host_arrays.items()},
        )
        # numpy mirror for the decode preps / TP placement (same as
        # load_model — without it every prep read refetches the weights
        # from the device; see models/matrix.Matrix.host)
        mat.host = {k2: np.asarray(v) for k2, v in host_arrays.items()}
        return mat
    if entry["type"] == "dict":
        return {k: _unflatten(f"{prefix}/{k}", arrays, manifest, jnp) for k in entry["keys"]}
    a = arrays[prefix]
    if entry.get("bf16"):
        a = a.view(ml_dtypes.bfloat16)
    return jnp.asarray(a)


def save_model(path, info: ModelInfo, params: dict):
    arrays: dict[str, np.ndarray] = {}
    manifest: dict[str, dict] = {}
    _flatten(params, "params", arrays, manifest)
    meta = {
        "version": 1,
        "info": {
            "version": info.version.value,
            "num_layer": info.num_layer,
            "num_emb": info.num_emb,
            "num_hidden": info.num_hidden,
            "num_vocab": info.num_vocab,
            "num_head": info.num_head,
            "custom": asdict(info.custom),
        },
        "manifest": manifest,
    }
    # np.savez + injected JSON manifest member
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    buf.seek(0)
    with open(path, "wb") as f:
        f.write(buf.read())
    with zipfile.ZipFile(path, "a") as z:
        z.writestr(_MANIFEST, json.dumps(meta))


def load_model_snapshot(path):
    import jax.numpy as jnp

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read(_MANIFEST))
    arrays = np.load(path)
    mi = meta["info"]
    info = ModelInfo(
        version=ModelVersion(mi["version"]),
        num_layer=mi["num_layer"],
        num_emb=mi["num_emb"],
        num_hidden=mi["num_hidden"],
        num_vocab=mi["num_vocab"],
        num_head=mi["num_head"],
        custom=CustomInfo(**mi["custom"]),
    )
    params = _unflatten("params", arrays, meta["manifest"], jnp)
    return info, params
