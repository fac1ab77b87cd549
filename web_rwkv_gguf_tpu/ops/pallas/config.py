"""Runtime switches for Pallas kernel selection."""

import jax

enabled: bool = True
interpret: bool = False  # force interpreter mode (debugging / CPU tests)

# T==1 (decode) WKV runs as plain XLA ops fused into the surrounding
# step instead of a Pallas call: the kernel's fixed block-DMA cost
# (~17 us/call) dwarfs the actual state update at decode shapes.
decode_wkv_xla: bool = True


def use_pallas() -> bool:
    return enabled and (interpret or jax.default_backend() == "tpu")
