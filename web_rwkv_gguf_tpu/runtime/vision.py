"""Vision inference: image patches → embedding
(ref: src/runtime/infer/vision.rs).

A picture is a list of N patches shaped ``[X, Y, C, N]``; each patch
flattens to one input embedding of size ``X·Y·C`` (must equal the model's
``num_emb``) and is run through the model as a sequence. The output is
the final residual-stream embedding (no logits head), mirroring the
reference's ``VisionOutput``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import TensorError


@dataclass
class VisionInput:
    """Patch tensor ``[X, Y, C, N]`` (ref: vision.rs:26-59)."""

    patches: np.ndarray

    @property
    def num_patch(self) -> int:
        return self.patches.shape[3]

    @property
    def num_emb(self) -> int:
        x, y, c, _ = self.patches.shape
        return x * y * c


def infer_vision(info, params, input: VisionInput, state=None):
    """Run patches through the model; returns (embedding [num_emb] f32,
    new_state)."""
    import jax.numpy as jnp

    from ..models import forward_chunk, init_state

    if input.num_emb != info.num_emb:
        raise TensorError.size(input.num_emb, info.num_emb)
    n = input.num_patch
    embeds = (
        input.patches.reshape(input.num_emb, n).T[None, :, :].astype(np.float32)
    )  # [1, N, C]
    state = state if state is not None else init_state(info, 1)
    x, state = forward_chunk(
        info, params, state, None, jnp.asarray([n], jnp.int32),
        input_embeds=jnp.asarray(embeds),
    )
    return np.asarray(x[0, n - 1]), state
