"""Test configuration: force an 8-device virtual CPU mesh.

Real TPU access is a single chip; all sharding tests run against
``--xla_force_host_platform_device_count=8`` on CPU, per the project's
multi-chip validation strategy.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
