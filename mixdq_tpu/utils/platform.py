"""Platform selection helpers.

This image's sitecustomize force-registers the ``axon`` TPU platform and
sets ``jax_platforms='axon,cpu'`` ignoring the JAX_PLATFORMS env var;
``force_cpu()`` is the reliable way to run on host CPU (dev/test)."""

from __future__ import annotations

import os


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Switch JAX to the host CPU backend. Call before any backend use.
    ``n_virtual_devices`` requires being set before the first device
    query (uses XLA_FLAGS, effective only if backends uninitialized)."""
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def apply_platform_env() -> None:
    """Honor ``MIXDQ_PLATFORM`` (e.g. ``cpu``). The sitecustomize above
    ignores JAX_PLATFORMS, so an env hook is the only way shell drivers
    (run_flow.sh CPU smoke flows) can pick the host CPU for the CLI
    scripts. Called from ``utils.config.load_config`` — every script
    loads its config before first backend use."""
    p = os.environ.get("MIXDQ_PLATFORM")
    if p == "cpu":
        force_cpu()
    elif p:
        import jax

        jax.config.update("jax_platforms", p)


def on_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False
