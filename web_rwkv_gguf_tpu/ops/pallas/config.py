"""Runtime switches for Pallas kernel selection."""

import jax

enabled: bool = True
interpret: bool = False  # force interpreter mode (debugging / CPU tests)


def use_pallas() -> bool:
    return enabled and (interpret or jax.default_backend() == "tpu")
