"""Compute ops: XLA reference implementations + Pallas TPU kernels.

Every op has an XLA implementation (the numerical ground truth, mirroring
the reference WGSL kernels' math) and, for the hot ops, a Pallas kernel
selected at trace time via ``use_pallas``.
"""

from .basic import (  # noqa: F401
    layer_norm,
    group_norm,
    l2_normalize,
    rms_norm,
    lerp,
    squared_relu,
    stable_exp,
    token_shift,
)
from .wkv import (  # noqa: F401
    wkv4,
    wkv5,
    wkv6,
    wkv7,
)
