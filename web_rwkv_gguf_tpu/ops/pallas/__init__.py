"""Pallas TPU kernels for the hot ops: fused dequant-matmul and WKV scans.

Selection policy: kernels are used automatically when running on TPU
(``jax.default_backend() == "tpu"``); the XLA reference implementations
in ``ops/`` remain the ground truth and the CPU path. Set
``web_rwkv_gguf_tpu.ops.pallas.config.enabled = False`` to force XLA.
"""

from . import config  # noqa: F401
from .matmul import quant_matmul  # noqa: F401
from .wkv7 import wkv7_pallas  # noqa: F401
