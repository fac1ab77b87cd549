"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment pins ``JAX_PLATFORMS=axon`` (the TPU tunnel) and the axon
plugin re-adds itself at import, so plain env vars are not enough — we
must override the config after importing jax. Multi-chip sharding tests
use ``--xla_force_host_platform_device_count`` so no TPU pod is needed
(the driver separately dry-runs the multi-chip path via
``__graft_entry__.dryrun_multichip``).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
