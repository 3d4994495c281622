"""Quality metrics in pure JAX: SQNR, MSE, SSIM, pixel MSE.

TPU-native replacements for the reference's metric helpers:
* SQNR/MSE — mixed_precision_scripts/get_sensitivity/sdxl_turbo/quant_quality.py:27-44
* SSIM — skimage.metrics.structural_similarity as called with
  ``channel_axis=2, win_size=SSIM_WIN_SIZE`` (quant_content.py:319-328).
  skimage is unavailable here, so SSIM is implemented directly (uniform
  filter formulation, matching skimage's default non-Gaussian path).
* pixel MSE election metric — quant_inference_mp.py:343-347.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred.astype(jnp.float32) - tgt.astype(jnp.float32)) ** 2)


def sqnr(signal: jnp.ndarray, noisy: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Signal-to-quantization-noise ratio in dB (quant_quality.py:36-44):
    ``10 log10(||signal||^2 / ||signal - noisy||^2)``."""
    s = signal.astype(jnp.float32)
    n = noisy.astype(jnp.float32)
    p_signal = jnp.sum(s**2)
    p_noise = jnp.sum((s - n) ** 2)
    return 10.0 * jnp.log10(p_signal / (p_noise + eps) + eps)


def _uniform_filter(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean filter over the last two spatial dims via separable cumsum —
    O(N) regardless of window size (the reference uses win_size 511,
    quant_content.py:22, where direct convolution would be hopeless)."""
    # x: [..., H, W]; 'valid' windowing like skimage (crop borders).
    def box1d(a, axis):
        c = jnp.cumsum(a, axis=axis, dtype=jnp.float32)
        pad = [(0, 0)] * a.ndim
        pad[axis] = (1, 0)
        c = jnp.pad(c, pad)
        lead = jax.lax.slice_in_dim(c, win, a.shape[axis] + 1, axis=axis)
        lag = jax.lax.slice_in_dim(c, 0, a.shape[axis] + 1 - win, axis=axis)
        return (lead - lag) / win

    return box1d(box1d(x, -1), -2)


def ssim(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    win_size: int = 7,
    data_range: float = 1.0,
    channel_axis: int | None = -1,
) -> jnp.ndarray:
    """Mean structural similarity, matching skimage's uniform-filter default
    (crop-border 'valid' mean, K1=0.01, K2=0.03, unbiased covariance with
    ``cov_norm = NP/(NP-1)``)."""
    x = img0.astype(jnp.float32)
    y = img1.astype(jnp.float32)
    if channel_axis is not None:
        x = jnp.moveaxis(x, channel_axis, 0)
        y = jnp.moveaxis(y, channel_axis, 0)

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size * win_size
    cov_norm = NP / (NP - 1.0)

    ux = _uniform_filter(x, win_size)
    uy = _uniform_filter(y, win_size)
    uxx = _uniform_filter(x * x, win_size)
    uyy = _uniform_filter(y * y, win_size)
    uxy = _uniform_filter(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    a1 = 2.0 * ux * uy + C1
    a2 = 2.0 * vxy + C2
    b1 = ux * ux + uy * uy + C1
    b2 = vx + vy + C2
    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s)


def pixel_mse(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Per-image-pair mean pixel MSE used for candidate election
    (quant_inference_mp.py:343-347)."""
    return mse(img0, img1)
