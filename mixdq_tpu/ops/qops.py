"""Int8 compute ops with fused dequant epilogues (XLA path).

Functional counterparts of the reference CUDA extension's five entry
points (csrc/main.cpp:9-13):

* ``quantize_per_tensor``   <- quantize_per_tensor_to_int8[_vectorized]
  (csrc/quant_dequant/quantize_kernel*.cu)
* ``qlinear``               <- qlinear_w8_a8_ohalf (csrc/qlinear/qlinear.cc
  + CUTLASS EVT GEMM: D = (Accum - bias0) * (s_w*s_a) + bias)
* ``qconv2d``               <- qconv2d_w8_a8_ohalf (csrc/qconv2d/)

Integer math contract (kernels/mixdq_extension/nn/Linear.py:115-194):
activation codes are asymmetric uint8 shifted to signed int8 by -128
(``zp_s = zp - 128``), weights per-out-channel symmetric int8, and the
zero-point folding term ``bias0 = zp_s * sum_K(W_int)`` is subtracted in
the epilogue.

TPU-first redesign of the padding correction: the reference pads with
zeros, so border pixels see fewer valid taps and need a per-pixel
``bias0[k,p,q]`` computed by a dedicated kernel
(csrc/qconv2d/conv_act_zero_point_propagate.cu:13-83). Here we pad the
*int8 code tensor* with the zero-point code itself — a padded position
then represents exactly ``x = 0``, the zp correction is uniform
(``bias0[k] = zp_s * sum_{r,s,c} W_int``), and the whole mechanism
collapses into one constant per output channel.

These are XLA-level ops: ``dot_general``/``conv_general_dilated`` with
``preferred_element_type=int32`` hit the MXU's native int8 path on
v5e+, and XLA fuses the scale/bias epilogue. A hand-written Pallas
variant lives in ``ops/pallas_qmatmul.py`` for comparison/bench.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def act_clip_range(a_bits: int):
    """(lo, hi) code clip bounds for a ``a_bits``-bit activation
    quantizer living in int8 storage: A8 -> (-128, 127), A4 -> (-8, 7),
    A2 -> (-2, 1). Sub-8-bit acts ride the SAME int8 MXU path — only the
    saturation bounds (and the zp shift) differ, so mixed-act configs
    keep full int8 deploy speed (the reference gates its kernels to A8
    and leaves mixed-act layers FP, nn/Linear.py:28-43)."""
    half = 1 << (a_bits - 1)
    return float(-half), float(half - 1)


def quantize_per_tensor(x: jnp.ndarray, scale_inv: jnp.ndarray,
                        zp_shifted: jnp.ndarray,
                        lo: float = -128.0, hi: float = 127.0) -> jnp.ndarray:
    """fp -> int8 codes: ``clip(round(x * (1/s_a)) + (zp-2^(b-1)), lo, hi)``.

    ``scale_inv``/``zp_shifted`` are 0-d arrays (traced, so one compiled
    program serves any calibration — the role device-scalar args play for
    CUDA-graph safety in quantize_kernel_vectorized.cu:29-94).
    ``lo``/``hi``: act_clip_range(a_bits) saturation bounds."""
    codes = jnp.round(x.astype(jnp.float32) * scale_inv) + zp_shifted
    return jnp.clip(codes, lo, hi).astype(jnp.int8)


def qlinear(
    x_int8: jnp.ndarray,  # [..., K] int8 codes (zp-shifted)
    w_int8: jnp.ndarray,  # [K, N] int8 (per-out-channel symmetric)
    scale: jnp.ndarray,  # [N] = s_w * s_a (pre-multiplied, nn/Linear.py:124)
    bias0: jnp.ndarray,  # [N] = zp_s * sum_K(w_int8)
    bias: Optional[jnp.ndarray] = None,  # [N] fp
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """W8A8 matmul with fused dequant epilogue (int32 accumulation).
    ``w_int8`` may be int4-stored (W4 deploy); upcast on read."""
    if w_int8.dtype != jnp.int8:
        w_int8 = w_int8.astype(jnp.int8)
    acc = lax.dot_general(
        x_int8, w_int8, (((x_int8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = (acc - bias0).astype(jnp.float32) * scale
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


def qconv2d(
    x_int8: jnp.ndarray,  # [B, H, W, C] int8 codes (zp-shifted)
    w_int8: jnp.ndarray,  # [kh, kw, C, K] int8
    scale: jnp.ndarray,  # [K] = s_w * s_a
    bias0: jnp.ndarray,  # [K] = zp_s * sum_{r,s,c}(w_int8)
    zp_shifted: jnp.ndarray,  # 0-d: pad value so padding represents x=0
    bias: Optional[jnp.ndarray] = None,
    strides=(1, 1),
    padding=(1, 1),
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """W8A8 NHWC conv with fused dequant epilogue and zp-code padding."""
    if w_int8.dtype != jnp.int8:
        w_int8 = w_int8.astype(jnp.int8)
    if padding[0] or padding[1]:
        pad_val = zp_shifted.astype(jnp.int8)
        x_int8 = lax.pad(
            x_int8, pad_val,
            ((0, 0, 0), (padding[0], padding[0], 0),
             (padding[1], padding[1], 0), (0, 0, 0)))
    acc = lax.conv_general_dilated(
        x_int8, w_int8, window_strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = (acc - bias0).astype(jnp.float32) * scale
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Deployment parameter precomputation
# ---------------------------------------------------------------------------


def _weight_codes(w, w_delta_b, n_bits, alpha=None):
    """Integer weight codes; with AdaRound ``alpha`` the learned hard
    rounding ``floor(w/delta) + (alpha >= 0)`` replaces nearest rounding
    (folding reconstruction results into deployment — the reference drops
    alphas at convert time, kernels/convert_ckpt.py:17-46)."""
    lo, hi = -(2 ** (n_bits - 1)), 2 ** (n_bits - 1) - 1
    scaled = w.astype(jnp.float32) / w_delta_b
    if alpha is None:
        codes = jnp.round(scaled)
    else:
        codes = jnp.floor(scaled) + (alpha >= 0).astype(jnp.float32)
    return jnp.clip(codes, lo, hi).astype(jnp.int8)


def prepare_qlinear_params(w, w_delta, a_delta, a_zp, bias=None, n_bits=8,
                           alpha=None, a_bits=8):
    """Precompute deploy-side constants for one linear layer
    (QuantizedLinear.from_float, nn/Linear.py:115-132).

    w: [K, N] fp; w_delta: [N]; a_delta, a_zp: scalars (a_zp unshifted,
    as fitted: in [0, 2^a_bits - 1]). Returns dict of arrays."""
    w_int = _weight_codes(w, w_delta[None, :], n_bits, alpha)
    zp_s = (a_zp - float(1 << (a_bits - 1))).astype(jnp.float32)
    w_sum = jnp.sum(w_int.astype(jnp.int32), axis=0)  # [N]
    return {
        "w_int": w_int,
        "scale": (w_delta * a_delta).astype(jnp.float32),  # [N]
        "bias0": (zp_s * w_sum.astype(jnp.float32)),  # [N] fp for epilogue
        "scale_inv": (1.0 / a_delta).astype(jnp.float32),
        "zp_shifted": zp_s,
        "bias": None if bias is None else bias.astype(jnp.float32),
    }


def prepare_qconv_params(w, w_delta, a_delta, a_zp, bias=None, n_bits=8,
                         alpha=None, a_bits=8):
    """Same for conv, w: [kh, kw, C, K] HWIO, w_delta: [K]."""
    w_int = _weight_codes(w, w_delta[None, None, None, :], n_bits, alpha)
    zp_s = (a_zp - float(1 << (a_bits - 1))).astype(jnp.float32)
    w_sum = jnp.sum(w_int.astype(jnp.int32), axis=(0, 1, 2))  # [K]
    return {
        "w_int": w_int,
        "scale": (w_delta * a_delta).astype(jnp.float32),
        "bias0": (zp_s * w_sum.astype(jnp.float32)),
        "scale_inv": (1.0 / a_delta).astype(jnp.float32),
        "zp_shifted": zp_s,
        "bias": None if bias is None else bias.astype(jnp.float32),
    }
