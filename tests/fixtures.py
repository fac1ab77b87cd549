"""Synthetic tiny-model builders for tests (re-exported from the package's
synthetic-model utilities)."""

from web_rwkv_gguf_tpu.utils.synthetic import (  # noqa: F401
    make_v4_gguf,
    make_v5_gguf,
    make_v6_gguf,
    make_v7_gguf,
)
