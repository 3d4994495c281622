"""Test configuration: force a *real* 8-device virtual CPU mesh.

NOTE: this environment's sitecustomize force-sets ``jax_platforms`` to
``axon,cpu`` (tunneled TPU first) regardless of the JAX_PLATFORMS env
var, so env vars alone do NOT select CPU — eager dispatch then goes over
the TPU tunnel at seconds/op. The only reliable switch is
``jax.config.update('jax_platforms', 'cpu')`` after import, before any
backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
