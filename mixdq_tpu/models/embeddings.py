"""Timestep / added-condition embeddings (diffusers-parity).

Structure mirrors diffusers' ``Timesteps`` + ``TimestepEmbedding`` modules
as used by the SDXL UNet (reference arch dump
``UNet2DConditionModel_SDXL_Turbo.txt:3-12``): sinusoidal projection with
``flip_sin_to_cos=True, downscale_freq_shift=0``, then Linear→SiLU→Linear.
The two linears are quantizable layers in the reference (wrapped by
QuantLayer via quant_model.py:37-55), hence QDense here.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..quant.state import QuantCtx
from .layers import QDense


def timestep_sinusoidal(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers ``get_timestep_embedding``
    semantics. ``timesteps``: [B] (float or int). Returns [B, dim]."""
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        out = jnp.concatenate([cos, sin], axis=-1)
    else:
        out = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """Linear→SiLU→Linear MLP over the sinusoidal embedding."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx()):
        x = QDense(self.embed_dim, dtype=self.dtype, name="linear_1")(x, ctx)
        x = nn.silu(x)
        x = QDense(self.embed_dim, dtype=self.dtype, name="linear_2")(x, ctx)
        return x
