"""Quantization block formats: CPU (numpy) dequantization references and
TPU-friendly repackers.

The numpy dequantizers are the ground truth used both by the GGUF loader's
dequant-to-f16 path and by the Pallas fused dequant-matmul kernel parity
tests. Semantics follow the GGML block formats as implemented by the
reference engine (ref: src/runtime/gguf.rs:9-423).
"""

from .ggml import (  # noqa: F401
    GGML_BLOCK_SIZES,
    GGML_TYPE_SIZES,
    GgmlDType,
    dequantize,
    dequantize_q2_k,
    dequantize_q3_k,
    dequantize_q4_0,
    dequantize_q4_1,
    dequantize_q4_k,
    dequantize_q5_0,
    dequantize_q5_1,
    dequantize_q5_k,
    dequantize_q6_k,
    dequantize_q8_0,
    quantize_q2_k,
    quantize_q3_k,
    quantize_q4_0,
    quantize_q4_1,
    quantize_q4_k,
    quantize_q5_0,
    quantize_q5_1,
    quantize_q5_k,
    quantize_q6_k,
    quantize_q8_0,
)
from .formats import (  # noqa: F401
    QuantScheme,
    quantize_int8,
    dequantize_int8,
    quantize_nf4,
    dequantize_nf4,
    NF4_QUANTILES,
    sf4_quantiles,
)
