"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests use ``--xla_force_host_platform_device_count``
so no real TPU pod is needed (the driver separately dry-runs the
multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
