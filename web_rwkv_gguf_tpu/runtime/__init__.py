"""Runtime: chunk scheduling, continuous batching, and the inference engine.

Ref: src/runtime/mod.rs (Runtime trait / TokioRuntime) and
src/runtime/infer/rnn.rs (RnnInput / RnnIter / redirect). The TPU engine
replaces the reference's speculative job pipeline with jit-cache-bucketed
dense chunks: JAX dispatch is already asynchronous, and compiled programs
are cached per (batch, chunk-length) bucket, which plays the same role as
the reference's cached command buffers keyed by ``num_token``.
"""

from .scheduler import (  # noqa: F401
    MIN_TOKEN_CHUNK_SIZE,
    RnnInput,
    RnnInputBatch,
    RnnIter,
    RnnOption,
    plan_chunk,
    redirect,
)
from .engine import Engine, EnginePool, softmax  # noqa: F401
from .vision import VisionInput, infer_vision  # noqa: F401
from .distributed import DistributedEngine  # noqa: F401
