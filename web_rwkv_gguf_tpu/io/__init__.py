"""Model/state serialization.

Ref: src/tensor/serialization.rs + examples/serde.rs (save a prequantized
model and reload it without requantizing) and the State back/load pair
(src/runtime/model.rs:89-100). The TPU equivalents are flat-key npz
snapshots — mmap-friendly, portable, no framework lock-in.
"""

from .snapshot import save_model, load_model_snapshot  # noqa: F401
from .state import (  # noqa: F401
    save_state,
    load_state,
    state_to_reference_layout,
    state_from_reference_layout,
)
from .safetensors import SafetensorsFile  # noqa: F401
