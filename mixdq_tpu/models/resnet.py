"""ResNet / up-down-sampling blocks (diffusers ResnetBlock2D parity,
NHWC). Reference behavior: quant_block.py:59-170 (QuantResnetBlock2D) —
the ``split`` argument is forwarded to ``conv_shortcut`` only, carrying
the pre-concat channel count for two-scale quantization of concat-skip
inputs (quant_block.py:163-166; quant_block_forward_func.py:97-99)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..quant.state import QuantCtx
from .layers import QConv, QDense


class ResnetBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, ctx: QuantCtx = QuantCtx(), split: int = 0):
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)

        t = nn.silu(temb)
        t = QDense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(t, ctx)
        # temb rides the conv epilogue (fused in-kernel on the pallas
        # section path; a plain add elsewhere — same math)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  name="conv1")(h, ctx, extra_bias=t)

        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)

        if self.in_channels != self.out_channels:
            residual = QConv(self.out_channels, (1, 1), padding=0,
                             dtype=self.dtype, name="conv_shortcut")(
                residual, ctx, split=split)
        # the shortcut add is conv2's fused epilogue residual
        return QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                     name="conv2")(h, ctx, residual=residual)


class Downsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx()):
        return QConv(self.channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="conv")(x, ctx)


class Upsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx()):
        B, H, W, C = x.shape
        # nearest 2x via broadcast+reshape — identical to
        # jax.image.resize(method='nearest') but avoids its gather
        # lowering (indexed loads instead of a pure layout op)
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (B, H, 2, W, 2, C)).reshape(B, H * 2, W * 2, C)
        return QConv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                     name="conv")(x, ctx)
