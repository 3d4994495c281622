"""Uniform affine quantization core — pure JAX, TPU-first.

This module is the TPU-native counterpart of the reference quantizer
(`/root/reference/quant_utils/qdiff/quantizer/base_quantizer.py:13-343`).
Instead of a stateful ``nn.Module`` with lazy init-on-first-forward, every
operation here is a pure function over arrays, so it composes with
``jax.jit`` / ``vmap`` / ``grad`` and shards trivially under ``pjit``.

Semantics preserved from the reference (with file:line anchors):

* symmetric quant uses ``n_levels = 2**(b-1) - 1`` and clamps the integer
  code to ``[-n_levels - 1, n_levels]`` (base_quantizer.py:119,125) — i.e.
  the full signed range ``[-2^(b-1), 2^(b-1)-1]``.
* asymmetric quant uses ``n_levels = 2**b`` and clamps to
  ``[0, n_levels - 1]`` (base_quantizer.py:119,127).
* activation ranges are clamped so ``x_min <= 0 <= x_max``
  (base_quantizer.py:155-158).
* min-max scale: sym ``delta = absmax / n_levels``; asym
  ``delta = (x_max - x_min) / (n_levels - 1)`` (base_quantizer.py:173-178).
* running-stat EMA with momentum 0.95 (base_quantizer.py:41,160-171).
* ``always_zero`` forces ``zero_point = 0`` (softmax quant,
  base_quantizer.py:184-185).
* grid-search-Lp scale init scans 100 shrink factors of the min/max range
  and picks the one minimizing the L2 reconstruction loss
  (base_quantizer.py:192-212).
* straight-through-estimator rounding (base_quantizer.py:304-308).

Deliberate deviation: the reference *fills the entire delta tensor* with
``eps`` when any channel's range degenerates (``delta.fill_(eps)``,
base_quantizer.py:180-181) — a bug for per-channel weights. We instead
floor element-wise with ``jnp.maximum(delta, eps)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-6

# Candidate bit-widths stacked in every multi-bit qparam tensor; mirrors
# ``mixed_precision: [2, 4, 8]`` (configs/stable-diffusion/sdxl_turbo.yaml:33).
DEFAULT_CANDIDATE_BITS: Tuple[int, ...] = (2, 4, 8)


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of a quantizer (hashable; safe as a jit-static arg).

    Mirrors the config contract consumed by the reference constructor
    (base_quantizer.py:25-43).
    """

    n_bits: int = 8
    sym: bool = False
    channel_wise: bool = False
    scale_method: str = "min_max"  # 'min_max' | 'grid_search_lp'
    round_mode: str = "nearest_ste"  # 'nearest' | 'nearest_ste' | 'stochastic'
    always_zero: bool = False
    running_stat: bool = False
    momentum: float = 0.95
    candidate_bits: Tuple[int, ...] = DEFAULT_CANDIDATE_BITS

    def bit_index(self, n_bits: int) -> int:
        return self.candidate_bits.index(n_bits)


def n_levels_for(n_bits: int, sym: bool) -> int:
    """base_quantizer.py:119,142."""
    return 2 ** (n_bits - 1) - 1 if sym else 2**n_bits


# ---------------------------------------------------------------------------
# Rounding
# ---------------------------------------------------------------------------


@jax.custom_vjp
def round_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Round with straight-through gradient (base_quantizer.py:304-308)."""
    return jnp.round(x)


def _round_ste_fwd(x):
    return jnp.round(x), None


def _round_ste_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_ste_fwd, _round_ste_bwd)


def stochastic_round(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """base_quantizer.py:69-72."""
    x_floor = jnp.floor(x)
    rest = x - x_floor
    return x_floor + jax.random.bernoulli(key, rest).astype(x.dtype)


# ---------------------------------------------------------------------------
# Fake quantization (quantize -> clamp -> dequantize)
# ---------------------------------------------------------------------------


def fake_quant(
    x: jnp.ndarray,
    delta: jnp.ndarray,
    zero_point: jnp.ndarray,
    n_bits,
    sym: bool = False,
    ste: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Uniform affine fake quantization (base_quantizer.py:95-129).

    ``n_bits`` may be a traced int array so bit sweeps do not recompile;
    the clamp bounds are computed with ``jnp`` arithmetic.
    ``delta``/``zero_point`` must broadcast against ``x``.
    """
    n_bits = jnp.asarray(n_bits)
    compute_dtype = x.dtype if x.dtype in (jnp.float32, jnp.float64) else jnp.float32
    xf = x.astype(compute_dtype)
    delta = delta.astype(compute_dtype)
    zero_point = zero_point.astype(compute_dtype)

    scaled = xf / delta
    if rng is not None:
        x_int = stochastic_round(scaled, rng)
    elif ste:
        x_int = round_ste(scaled)
    else:
        x_int = jnp.round(scaled)
    x_int = x_int + zero_point

    if sym:
        n_levels = 2.0 ** (n_bits - 1) - 1.0
        x_quant = jnp.clip(x_int, -n_levels - 1.0, n_levels)
    else:
        n_levels = 2.0**n_bits
        x_quant = jnp.clip(x_int, 0.0, n_levels - 1.0)
    x_dequant = (x_quant - zero_point) * delta
    return x_dequant.astype(x.dtype)


ADAROUND_GAMMA, ADAROUND_ZETA = -0.1, 1.1  # stretch (base_quantizer.py:59)


def adaround_h(alpha: jnp.ndarray) -> jnp.ndarray:
    """Rectified sigmoid h(alpha) in [0, 1] (base_quantizer.py:77)."""
    return jnp.clip(
        jax.nn.sigmoid(alpha) * (ADAROUND_ZETA - ADAROUND_GAMMA)
        + ADAROUND_GAMMA, 0.0, 1.0)


def fake_quant_adaround(
    x: jnp.ndarray,
    delta: jnp.ndarray,
    zero_point: jnp.ndarray,
    n_bits,
    alpha: jnp.ndarray,
    sym: bool = True,
    hard: bool = False,
) -> jnp.ndarray:
    """AdaRound fake quantization (``learned_hard_sigmoid`` rounding,
    base_quantizer.py:74-84): ``code = floor(x/delta) + h(alpha)`` (soft,
    used while optimizing alpha — gradients flow through h) or
    ``floor(x/delta) + (alpha >= 0)`` (hard, the deployed rounding)."""
    n_bits = jnp.asarray(n_bits)
    xf = x.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    zero_point = zero_point.astype(jnp.float32)
    x_floor = jnp.floor(xf / delta)
    r = (alpha >= 0).astype(jnp.float32) if hard else adaround_h(alpha)
    x_int = x_floor + r + zero_point
    if sym:
        n_levels = 2.0 ** (n_bits - 1) - 1.0
        x_quant = jnp.clip(x_int, -n_levels - 1.0, n_levels)
    else:
        x_quant = jnp.clip(x_int, 0.0, 2.0**n_bits - 1.0)
    return ((x_quant - zero_point) * delta).astype(x.dtype)


# ---------------------------------------------------------------------------
# Range statistics
# ---------------------------------------------------------------------------


def tensor_minmax(x: jnp.ndarray, channel_axis: Optional[int] = None):
    """Per-tensor or per-channel min/max with the activation-style clamping
    ``x_min <= 0 <= x_max`` (base_quantizer.py:155-158).

    Returns float32 ``(x_min, x_max)``; shape ``()`` per-tensor or ``(C,)``
    when ``channel_axis`` is given.
    """
    xf = x.astype(jnp.float32)
    if channel_axis is None:
        x_min = jnp.min(xf)
        x_max = jnp.max(xf)
    else:
        axes = tuple(i for i in range(x.ndim) if i != channel_axis % x.ndim)
        x_min = jnp.min(xf, axis=axes)
        x_max = jnp.max(xf, axis=axes)
    return jnp.minimum(x_min, 0.0), jnp.maximum(x_max, 0.0)


def ema_minmax(prev_min, prev_max, cur_min, cur_max, momentum: float = 0.95):
    """Momentum running-stat update (base_quantizer.py:167-171)."""
    return (
        prev_min * momentum + cur_min * (1.0 - momentum),
        prev_max * momentum + cur_max * (1.0 - momentum),
    )


# ---------------------------------------------------------------------------
# Scale / zero-point fitting
# ---------------------------------------------------------------------------


def fit_qparams_minmax(
    x_min: jnp.ndarray,
    x_max: jnp.ndarray,
    n_bits: int,
    sym: bool = False,
    always_zero: bool = False,
):
    """min-max scale init (base_quantizer.py:173-190). Pure: works on
    scalars or per-channel vectors. Returns ``(delta, zero_point)`` float32."""
    n_levels = n_levels_for(n_bits, sym)
    if sym:
        absmax = jnp.maximum(jnp.abs(x_min), jnp.abs(x_max))
        delta = absmax / n_levels
    else:
        delta = (x_max - x_min) / (n_levels - 1)
    delta = jnp.maximum(delta, EPS)  # element-wise floor (see module docstring)
    if sym or always_zero:
        zero_point = jnp.zeros_like(delta)
    else:
        zero_point = jnp.round(-x_min / delta)
    return delta.astype(jnp.float32), zero_point.astype(jnp.float32)


def _quantize_with_range(x, x_max, x_min, n_bits, always_zero):
    """Quantize given explicit max/min — used by the grid search
    (base_quantizer.py:238-262). ``x``: [..., elems]; ranges broadcastable."""
    eps = 1e-4
    n_levels = 2**n_bits
    if always_zero:
        delta = x_max / (n_levels - 1)
        zero_point = jnp.zeros_like(delta)
    else:
        delta = (x_max - x_min) / (n_levels - 1)
        zero_point = jnp.round(-x_min / (delta + eps))
    x_int = jnp.round(x / (delta + eps))
    x_quant = jnp.clip(x_int + zero_point, 0, n_levels - 1)
    return (x_quant - zero_point) * delta


def fit_qparams_grid_search_lp(
    x: jnp.ndarray,
    n_bits: int,
    channel_wise: bool = False,
    always_zero: bool = False,
    num_steps: int = 100,
):
    """Grid-search-Lp scale init (base_quantizer.py:192-212).

    Scans shrink factors ``k/num_steps`` for ``k in [0, num_steps)`` of the
    min/max range and picks the factor minimizing the L2 reconstruction
    loss, *jointly over all channels* as the reference does (a single
    ``argmin`` over the scan axis, base_quantizer.py:204).
    """
    eps = 1e-5
    xf = x.astype(jnp.float32)
    if channel_wise:
        flat = xf.reshape(xf.shape[0], -1)  # [C, elems]
    else:
        flat = xf.reshape(1, -1)
    x_min = jnp.minimum(jnp.min(flat, axis=-1), 0.0)
    x_max = jnp.maximum(jnp.max(flat, axis=-1), 0.0)

    scaling = jnp.arange(num_steps, dtype=jnp.float32) / num_steps  # [S]
    scaled_max = x_max[None, :] * scaling[:, None]  # [S, C]
    scaled_min = x_min[None, :] * scaling[:, None]

    x_q = _quantize_with_range(
        flat[None, :, :], scaled_max[:, :, None], scaled_min[:, :, None], n_bits, always_zero
    )
    # lp_loss with reduction='none' (base_quantizer.py:310-342): sum over
    # elements, mean over channels -> one score per scan step.
    loss = jnp.mean(jnp.sum((flat[None] - x_q) ** 2, axis=-1), axis=-1)  # [S]
    best = jnp.argmin(loss)

    if always_zero:
        delta = scaled_max[best] / (2**n_bits - 1)
        zero_point = jnp.zeros_like(delta)
    else:
        delta = (scaled_max[best] - scaled_min[best]) / (2**n_bits - 1)
        zero_point = jnp.round(-scaled_min[best] / (delta + eps) + eps)
    delta = jnp.maximum(delta, EPS)
    if not channel_wise:
        delta = delta.reshape(())
        zero_point = zero_point.reshape(())
    return delta.astype(jnp.float32), zero_point.astype(jnp.float32)


def fit_qparams_multibit(
    x_min: jnp.ndarray,
    x_max: jnp.ndarray,
    spec: QuantSpec,
):
    """Fit ``(delta_list, zero_point_list)`` stacked over ``candidate_bits``.

    Mirrors the per-bit init loop building ``delta_list``/``zero_point_list``
    (base_quantizer.py:98-109) but as one vectorized pure function.
    Output shape: ``[n_candidate_bits, *x_min.shape]``.
    """
    deltas, zps = [], []
    for b in spec.candidate_bits:
        d, z = fit_qparams_minmax(x_min, x_max, b, sym=spec.sym, always_zero=spec.always_zero)
        deltas.append(d)
        zps.append(z)
    return jnp.stack(deltas, axis=0), jnp.stack(zps, axis=0)


def fit_weight_qparams(
    w: jnp.ndarray,
    spec: QuantSpec,
    channel_axis: int = -1,
):
    """Full multi-bit weight qparam fit from the weight tensor itself.

    ``channel_axis`` is the output-channel axis (last for flax HWIO/IO
    kernels; the reference's dim 0 for torch OIHW, quant semantics equal).
    When ``scale_method == 'grid_search_lp'`` the grid search runs per bit
    width over the (channels, elems) flattening.
    """
    if spec.scale_method == "grid_search_lp":
        # Move channel axis first, flatten rest — the reference's reshape
        # ([n_channel, -1], base_quantizer.py:150-151).
        if spec.channel_wise:
            wc = jnp.moveaxis(w, channel_axis, 0)
        else:
            wc = w
        deltas, zps = [], []
        for b in spec.candidate_bits:
            d, z = fit_qparams_grid_search_lp(
                wc, b, channel_wise=spec.channel_wise, always_zero=spec.always_zero
            )
            deltas.append(d)
            zps.append(z)
        return jnp.stack(deltas), jnp.stack(zps)
    x_min, x_max = tensor_minmax(w, channel_axis if spec.channel_wise else None)
    return fit_qparams_multibit(x_min, x_max, spec)


# ---------------------------------------------------------------------------
# Convenience: fake-quant a weight along its channel axis
# ---------------------------------------------------------------------------


def fake_quant_channelwise(
    w: jnp.ndarray,
    delta: jnp.ndarray,
    zero_point: jnp.ndarray,
    n_bits,
    channel_axis: int = -1,
    sym: bool = True,
    ste: bool = True,
) -> jnp.ndarray:
    """Fake-quant ``w`` with per-channel ``delta``/``zp`` vectors of shape
    ``[C]`` broadcast along ``channel_axis`` (base_quantizer.py:229-236)."""
    if delta.ndim == 0:
        return fake_quant(w, delta, zero_point, n_bits, sym=sym, ste=ste)
    shape = [1] * w.ndim
    shape[channel_axis % w.ndim] = w.shape[channel_axis % w.ndim]
    return fake_quant(
        w, delta.reshape(shape), zero_point.reshape(shape), n_bits, sym=sym, ste=ste
    )


# ---------------------------------------------------------------------------
# Integer (deploy) quantization helpers — used by the Pallas int8 path
# ---------------------------------------------------------------------------


def quantize_weight_int(
    w: jnp.ndarray,
    delta: jnp.ndarray,
    channel_axis: int = -1,
    n_bits: int = 8,
) -> jnp.ndarray:
    """Symmetric integer weight codes for deployment
    (kernels/mixdq_extension/nn/Linear.py:115-123 equivalent).

    Returns int8 codes in ``[-2^(b-1), 2^(b-1)-1]`` (4-bit values are stored
    in int8 as the reference stores quint4x2 but computes in int8,
    kernels/quantize_sdxl.py:46-48).
    """
    if delta.ndim > 0:
        shape = [1] * w.ndim
        shape[channel_axis % w.ndim] = w.shape[channel_axis % w.ndim]
        delta = delta.reshape(shape)
    lo = -(2 ** (n_bits - 1))
    hi = 2 ** (n_bits - 1) - 1
    codes = jnp.clip(jnp.round(w.astype(jnp.float32) / delta), lo, hi)
    return codes.astype(jnp.int8)


def quantize_act_int(
    x: jnp.ndarray, delta: jnp.ndarray, zero_point: jnp.ndarray
) -> jnp.ndarray:
    """Asymmetric per-tensor int8 activation codes, zero-point shifted by
    −128 into signed range as the deploy converter does
    (kernels/mixdq_extension/nn/utils.py:412-458)."""
    codes = jnp.round(x.astype(jnp.float32) / delta) + (zero_point - 128.0)
    return jnp.clip(codes, -128, 127).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def lp_loss(pred: jnp.ndarray, tgt: jnp.ndarray, p: float = 2.0, reduction: str = "none"):
    """L_p reconstruction loss (base_quantizer.py:310-342, non-batched)."""
    diff = jnp.abs(pred - tgt)
    if reduction == "none":
        reduce_dims = tuple(range(1, pred.ndim))
        return jnp.mean(jnp.sum(diff**2, axis=reduce_dims))
    elif reduction == "all":
        return jnp.mean(diff**p)
    raise NotImplementedError(reduction)
