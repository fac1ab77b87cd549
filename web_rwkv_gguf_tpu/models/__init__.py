"""Model definitions: per-version parameter pytrees and forward functions.

Ref: src/runtime/{model,v4,v5,v6,v7}.rs. The forwards are pure jitted
functions over dense ``[B, T]`` chunks (the TPU-native replacement for the
reference's token-stacked cursor layout): padding tokens are masked so
recurrent state is untouched, and per-batch ``lengths`` drive the
cross-chunk shift-state update.
"""

from .info import ModelInfo, ModelVersion, detect_info  # noqa: F401
from .matrix import Matrix  # noqa: F401
from .loader import (  # noqa: F401
    load_model,
    load_initial_state,
    prepare_decode,
    unroll_params,
)
from .forward import forward_chunk, init_state, embed_tokens, logits_head  # noqa: F401
