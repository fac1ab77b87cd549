"""TPU-native RWKV inference engine with GGUF weight support.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``web-rwkv-gguf`` reference engine (Rust + WebGPU): GGUF v3 parsing,
weight-only quantization (Q4_K/Q5_K/Q6_K/Q8_0/... + Int8/NF4/SF4),
RWKV V4/V5/V6/V7 recurrent inference with chunked continuous batching,
LoRA merge at load, state checkpointing, and multi-chip sharding over a
``jax.sharding.Mesh``.

Layer map (TPU-first, cf. reference layer map in SURVEY.md §1):
  gguf/      file parsing + name mapping         (ref: src/runtime/gguf.rs)
  quant/     block formats, dequant refs, repack (ref: src/runtime/gguf.rs, src/tensor/matrix.rs)
  ops/       Pallas kernels + XLA ops            (ref: src/shaders/*.wgsl, src/tensor/ops.rs)
  models/    per-version params + forward        (ref: src/runtime/v{4,5,6,7}.rs)
  runtime/   chunk scheduler, engine             (ref: src/runtime/mod.rs, src/runtime/infer/rnn.rs)
  parallel/  mesh + shardings                    (new; absent in reference)
  io/        state/model checkpointing           (ref: src/tensor/serialization.rs)
  utils/     tokenizer, sampling, misc           (ref: src/tokenizer.rs, examples/)
"""

__version__ = "0.1.0"

from .errors import (  # noqa: E402,F401
    EngineError,
    GgufError,
    InputExhausted,
    InvalidVersion,
    LoaderError,
    TensorError,
    TensorNotFound,
    TokenizerError,
    UnsupportedFeature,
    UnsupportedTensorType,
    WebRwkvError,
)
