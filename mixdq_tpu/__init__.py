"""mixdq_tpu — TPU-native mixed-precision PTQ framework for few-step
text-to-image diffusion (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of thu-nics/MixDQ (ECCV 2024)
designed TPU-first: functional quantization transforms over Flax models,
jit-compiled calibration/PTQ, metric-decoupled mixed-precision search, and
int8 Pallas MXU kernels with fused dequant epilogues.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MIXDQ_PLATFORM"):
    # Reliable platform override: some images pin jax_platforms at
    # interpreter startup (sitecustomize), making the JAX_PLATFORMS env
    # var ineffective; this config update is honored as long as no
    # backend has been initialized yet.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MIXDQ_PLATFORM"])
