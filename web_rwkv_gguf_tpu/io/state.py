"""Recurrent-state serialization and reference-layout conversion.

The reference stores a batch lane's state as one tensor
``[num_emb, rows, num_layer]`` where rows are, per version (x fastest):
  V4:        [shift_x, aa, bb, pp, ffn_x]                (5 rows, v4.rs:152-184)
  V5/V6/V7:  [shift_x, S row 0..head_size-1, ffn_x]      (head_size+2 rows,
             S[j, c=h·hs+i] = per-head state[k=j, v=i], v7.rs:186-207)

``state_to_reference_layout`` produces that exact ``[L, rows, C]`` array
so states interoperate conceptually with the reference's serialized form.
"""

from __future__ import annotations

import json
import zipfile

import numpy as np

from ..models.info import ModelInfo, ModelVersion


def state_to_reference_layout(info: ModelInfo, snapshot: dict) -> np.ndarray:
    """One lane's state pytree (from ``Engine.back_state``) → [L, rows, C]."""
    L, C, H, hs = info.num_layer, info.num_emb, info.num_head, info.head_size
    if info.version == ModelVersion.V4:
        out = np.zeros((L, 5, C), np.float32)
        out[:, 0] = snapshot["att_shift"]
        out[:, 1] = snapshot["aa"]
        out[:, 2] = snapshot["bb"]
        out[:, 3] = snapshot["pp"]
        out[:, 4] = snapshot["ffn_shift"]
        return out
    out = np.zeros((L, hs + 2, C), np.float32)
    out[:, 0] = snapshot["att_shift"]
    # wkv [L, H, K, V] → rows j=k, channel c = h*hs + i(v)
    wkv = np.asarray(snapshot["wkv"])  # [L, H, hs, hs]
    out[:, 1 : hs + 1] = wkv.transpose(0, 2, 1, 3).reshape(L, hs, C)
    out[:, hs + 1] = snapshot["ffn_shift"]
    return out


def state_from_reference_layout(info: ModelInfo, data: np.ndarray) -> dict:
    """[L, rows, C] → state pytree for ``Engine.load_state``."""
    L, C, H, hs = info.num_layer, info.num_emb, info.num_head, info.head_size
    data = np.asarray(data, np.float32)
    if info.version == ModelVersion.V4:
        assert data.shape == (L, 5, C), data.shape
        return {
            "att_shift": data[:, 0],
            "aa": data[:, 1],
            "bb": data[:, 2],
            "pp": data[:, 3],
            "ffn_shift": data[:, 4],
        }
    assert data.shape == (L, hs + 2, C), data.shape
    wkv = data[:, 1 : hs + 1].reshape(L, hs, H, hs).transpose(0, 2, 1, 3)
    return {
        "att_shift": data[:, 0],
        "wkv": np.ascontiguousarray(wkv),
        "ffn_shift": data[:, hs + 1],
    }


def save_state(path, info: ModelInfo, snapshot: dict):
    """Save one lane's state (e.g. a chat session) to an .npz file."""
    arrays = {k: np.asarray(v) for k, v in snapshot.items()}
    np.savez(path, **arrays)
    with zipfile.ZipFile(path, "a") as z:
        z.writestr(
            "__state_info__.json",
            json.dumps({"version": info.version.value, "num_layer": info.num_layer}),
        )


def load_state(path) -> dict:
    data = np.load(path)
    return {k: data[k] for k in data.files if not k.startswith("__")}
