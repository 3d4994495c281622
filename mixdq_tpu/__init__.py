"""mixdq_tpu — TPU-native mixed-precision PTQ framework for few-step
text-to-image diffusion (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of thu-nics/MixDQ (ECCV 2024)
designed TPU-first: functional quantization transforms over Flax models,
jit-compiled calibration/PTQ, metric-decoupled mixed-precision search, and
int8 Pallas MXU kernels with fused dequant epilogues.
"""

__version__ = "0.1.0"
