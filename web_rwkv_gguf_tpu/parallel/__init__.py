"""Multi-chip sharding: mesh construction and parameter/state shardings.

New for the TPU build (the reference is strictly single-GPU, see
SURVEY.md §2.6). Design follows the BASELINE north star: quantized
weights tensor-sharded over ICI on a ``model`` axis (Megatron-style
column/row parallel pairs → exactly one psum per attention and one per
FFN, inserted automatically by XLA's SPMD partitioner), per-sequence
recurrent state sharded with the batch on a ``data`` axis, WKV head state
co-sharded with the heads on ``model``.
"""

from .sharding import (  # noqa: F401
    make_mesh,
    shard_params,
    shard_state,
    data_sharding,
    multihost_initialize,
)
from .sequence import make_seq_parallel_prefill  # noqa: F401
from .tensor import make_tp_forward, shard_params_tp  # noqa: F401
from .pipeline import make_pipeline_forward, pipeline_state  # noqa: F401
from .decode_pp import (  # noqa: F401
    PipelinedDecoder,
    greedy_scan_reference,
    make_pp_generator,
    make_pp_params,
    pp_state,
)
