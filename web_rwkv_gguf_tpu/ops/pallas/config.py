"""Runtime switches for Pallas kernel selection."""

import jax

enabled: bool = True
interpret: bool = False  # force interpreter mode (debugging / CPU tests)

# wide-batch gemv: True keeps the double-bf16 correction terms (error
# ~2^-16) at ~+35% step time (measured B=4: 607 vs 462 us/step). The
# default False uses plain bf16 dequant rounding (~2^-9) — the same
# precision class as the XLA fallback path and the reference's f16
# shaders. Narrow-batch (B <= wide_batch) decode is exact either way.
wide_precise: bool = False

# smallest batch routed to the `wide` gemv strategy in the layer-scan
# kernel (below/equal: group-expansion). Read at trace time.
wide_batch: int = 2

# T==1 (decode) WKV runs as plain XLA ops fused into the surrounding
# step instead of a Pallas call: the kernel's fixed block-DMA cost
# (~17 us/call) dwarfs the actual state update at decode shapes.
decode_wkv_xla: bool = True


def use_pallas() -> bool:
    return enabled and (interpret or jax.default_backend() == "tpu")
