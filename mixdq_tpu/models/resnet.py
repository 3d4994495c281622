"""ResNet / up-down-sampling blocks (diffusers ResnetBlock2D parity,
NHWC). Reference behavior: quant_block.py:59-170 (QuantResnetBlock2D) —
the ``split`` argument is forwarded to ``conv_shortcut`` only, carrying
the pre-concat channel count for two-scale quantization of concat-skip
inputs (quant_block.py:163-166; quant_block_forward_func.py:97-99).

int8_sec producer fusion: when the downstream conv is int8-deployed on
the Pallas section path, the ``GroupNorm -> SiLU -> act-quantize`` chain
collapses into one ``gn_silu_quantize`` kernel that emits the conv's
int8 codes directly (the conv skips its own quantize) — see
ops/pallas_gn_quant.py. The GN params keep their flax names
(``norm{1,2}.scale/bias``) so checkpoints are path-independent.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..quant.state import QuantCtx, canonical_name
from .layers import QConv, QDense


class _GNParams(nn.Module):
    """Parameter-only stand-in for nn.GroupNorm (same param names/shapes)
    used by the fused gn_silu_quantize path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


def fused_gn_entry(ctx: QuantCtx, consumer_name: str, kind: str = "conv"):
    """The deploy entry of ``consumer_name`` if its GN(+SiLU) producer can
    fuse into a gn_silu_quantize kernel (int8_sec Pallas path, plain
    conv/linear entry, on TPU)."""
    if ctx.mode != "int8" or ctx.deploy_compute != "int8_sec":
        return None
    from ..ops import pallas_mode

    if not pallas_mode()[0]:
        return None
    dp = ctx.deploy.get(consumer_name) if ctx.deploy else None
    if dp is None or dp.kind != kind or dp.scale_inv is None or dp.act_off:
        return None
    return dp


class ResnetBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32

    def _norm_act(self, x, idx: int, ctx: QuantCtx):
        """GroupNorm+SiLU producing either bf16 (plain path) or the next
        conv's int8 codes (fused int8_sec path)."""
        name = canonical_name(self.path)
        dp = fused_gn_entry(ctx, f"{name}.conv{idx}")
        if dp is not None:
            from ..ops import pallas_mode
            from ..ops.pallas_gn_quant import gn_silu_quantize

            gamma, beta = _GNParams(x.shape[-1], name=f"norm{idx}")()
            from ..ops.qops import act_clip_range

            return gn_silu_quantize(x, gamma, beta, dp.scale_inv,
                                    dp.zp_shifted, groups=self.groups,
                                    eps=self.eps,
                                    interpret=pallas_mode()[1],
                                    clip=act_clip_range(dp.a_bits))
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name=f"norm{idx}")(x)
        return nn.silu(h)

    @nn.compact
    def __call__(self, x, temb, ctx: QuantCtx = QuantCtx(), split: int = 0):
        residual = x
        h = self._norm_act(x, 1, ctx)

        t = nn.silu(temb)
        t = QDense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(t, ctx)
        # temb rides the conv epilogue (fused in-kernel on the pallas
        # section path; a plain add elsewhere — same math)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  name="conv1")(h, ctx, extra_bias=t)

        h = self._norm_act(h, 2, ctx)

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
        name = canonical_name(self.path)
        dp = fused_gn_entry(ctx, f"{name}.conv")
        if dp is not None:
            # quantize BEFORE the nearest 2x: duplicating pixels commutes
            # with per-tensor quantization, so this emits identical codes
            # while quantizing 4x fewer elements and broadcasting int8
            # (half the HBM traffic of broadcasting bf16)
            from ..ops import qops

            x = qops.quantize_per_tensor(x.astype(self.dtype),
                                         dp.scale_inv, dp.zp_shifted,
                                         *qops.act_clip_range(dp.a_bits))
        # nearest 2x via broadcast+reshape — identical to
        # jax.image.resize(method='nearest') but avoids its gather
        # lowering (indexed loads instead of a pure layout op)
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (B, H, 2, W, 2, C)).reshape(B, H * 2, W * 2, C)
        return QConv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                     name="conv")(x, ctx)
