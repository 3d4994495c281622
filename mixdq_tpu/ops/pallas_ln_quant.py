"""Fused LayerNorm + int8-quantize Pallas kernel — producer-side int8
emission for the transformer-block dense chains.

In the int8_sec deploy path every BasicTransformerBlock dense consumer
is fed by a pre-LayerNorm (norm1 -> attn1 qkv projections, norm2 ->
attn2.to_q, norm3 -> ff.net_0.proj). XLA lowers each site as a stat
``reduce`` plus a normalize(+quantize) loop fusion; at SDXL-Turbo B=1
the ~210 sites are op-latency bound (~3.5 us/op at the 16x16 level,
M=256). This kernel emits the downstream layer's int8 codes straight
from the raw block input in ONE pass:

    codes = quantize(layer_norm(x, gamma, beta), s_a, zp)

Unlike GroupNorm (``pallas_gn_quant``), LayerNorm reduces within each
row (token), so no cross-block stat accumulation is needed — each row
block is read once, normalized with an in-register lane reduction, and
stored as int8 (3 bytes/elem HBM traffic vs XLA's >= 5).

This is the dense-side counterpart of the reference's producer-fused
quantization design (csrc/quant_dequant/quantize_kernel_vectorized.cu
keeps quantize separate; we fold the whole normalize-quantize chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_div(total: int, target: int) -> int:
    best = None
    for d in range(1, total + 1):
        if total % d == 0 and d <= target:
            best = d
    return best or total


def _kernel(x_ref, gam_ref, beta_ref, cst_ref, o_ref, *, C, eps):
    xf = x_ref[0].astype(jnp.float32)  # [bs, C]
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * gam_ref[...] + beta_ref[...]
    q = jnp.round(y * cst_ref[0, 0]) + cst_ref[0, 1]
    o_ref[0] = jnp.clip(q, cst_ref[0, 2], cst_ref[0, 3]).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("eps", "interpret",
                                             "block_rows", "clip"))
def ln_quantize(
    x: jnp.ndarray,  # [B, T, C] (or [B, H, W, C]) bf16/f32
    gamma: jnp.ndarray,  # [C]
    beta: jnp.ndarray,  # [C]
    scale_inv: jnp.ndarray,  # 0-d f32 (1 / act scale)
    zp_shifted: jnp.ndarray,  # 0-d f32 (act zero point - 128)
    eps: float = 1e-5,
    interpret: bool = False,
    block_rows: int = 0,
    clip: tuple = (-128.0, 127.0),  # act_clip_range(a_bits)
) -> jnp.ndarray:
    """``quantize(layer_norm(x), scale_inv, zp)`` -> int8 codes, same
    shape as ``x``. Matches ``qops.quantize_per_tensor`` code semantics
    exactly (round-half-even, clip [-128, 127])."""
    shape = x.shape
    B, C = shape[0], shape[-1]
    N = int(np.prod(shape[1:-1]))
    xf = x.reshape(B, N, C)
    # row-block: bound the f32 working set to ~2 MB
    bs = block_rows or _pick_div(N, max(8, (2 * 1024 * 1024 // (4 * C))
                                        // 8 * 8))
    grid = (B, N // bs)
    consts = jnp.stack([scale_inv.astype(jnp.float32).reshape(()),
                        zp_shifted.astype(jnp.float32).reshape(()),
                        jnp.float32(clip[0]), jnp.float32(clip[1])]
                       ).reshape(1, 4)

    out = pl.pallas_call(
        functools.partial(_kernel, C=C, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * N * C,
            bytes_accessed=2 * B * N * C + B * N * C,
            transcendentals=0),
        interpret=interpret,
    )(xf, gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32), consts)
    return out.reshape(shape)
