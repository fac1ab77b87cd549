"""Example applications / CLIs (the reference's examples/*.rs equivalents).

  gen            prompt → text            (ref: examples/gen.rs)
  chat           interactive chat         (ref: examples/chat.rs)
  batch          parallel lanes demo      (ref: examples/batch.rs)
  bench_format   ST vs GGUF comparison    (ref: examples/bench_format.rs)
  bench_kernels  per-kernel micro-bench   (ref: examples/bench_q4k_shaders.rs)
  serde          model → snapshot         (ref: examples/serde.rs)
  inspect        dump GGUF metadata       (ref: debug_gguf.rs)
  convert        pth/st → GGUF            (ref: assets/scripts/convert_hf_to_gguf.py)
  ppl            perplexity eval          (new; needed for quantization QA)

Run as ``python -m web_rwkv_gguf_tpu.apps.<name> --help``.
"""
