"""AutoencoderKL (VAE) in Flax, NHWC — decoder for txt2img, encoder for
img2img/calibration completeness. Structure mirrors diffusers
AutoencoderKL (GN eps 1e-6, mid-block single-head attention).

All convs/denses are quant-aware (QConv/QDense): with the default FP ctx
the behavior is identical to plain layers, so FP checkpoints and
converters are unchanged. The reference quantizes only the UNet (the
pipeline runs the VAE in fp16, kernels/quantize_sdxl.py:31-37) — VAE
quantization is TPU surface beyond parity: in few-step pipelines
(SDXL-Turbo 1-step, SD1.5+LCM 4-step) VAE decode dominates end-to-end
latency, so an int8 decoder is the remaining pipeline-level lever (see
``quant.vae_quant.quantize_vae_decoder``)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..quant.state import QuantCtx
from .configs import VAEConfig
from .layers import QConv, QDense


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx()):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  name="conv1")(h, ctx)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  name="conv2")(h, ctx)
        if in_ch != self.out_channels:
            x = QConv(self.out_channels, (1, 1), use_bias=True,
                      dtype=self.dtype, name="conv_shortcut")(x, ctx)
        return x + h


class VAEAttention(nn.Module):
    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx()):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = QDense(C, dtype=self.dtype, name="to_q")(h, ctx)
        k = QDense(C, dtype=self.dtype, name="to_k")(h, ctx)
        v = QDense(C, dtype=self.dtype, name="to_v")(h, ctx)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) * C**-0.5
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        o = jnp.einsum("bqk,bkc->bqc", probs, v)
        o = QDense(C, dtype=self.dtype, name="to_out_0")(o, ctx)
        return x + o.reshape(B, H, W, C)


class VAEMidBlock(nn.Module):
    channels: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx()):
        x = VAEResnetBlock(self.channels, self.groups, dtype=self.dtype,
                           name="resnets_0")(x, ctx)
        x = VAEAttention(self.channels, self.groups, dtype=self.dtype,
                         name="attentions_0")(x, ctx)
        x = VAEResnetBlock(self.channels, self.groups, dtype=self.dtype,
                           name="resnets_1")(x, ctx)
        return x


class VAEDecoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, ctx: QuantCtx = QuantCtx()):
        cfg = self.cfg
        ch = list(reversed(cfg.block_out_channels))  # e.g. (512,512,256,128)
        h = QConv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                  name="conv_in")(z, ctx)
        h = VAEMidBlock(ch[0], cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_block")(h, ctx)
        n = len(ch)
        for i in range(n):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(ch[i], cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"up_blocks_{i}_resnets_{j}")(h, ctx)
            if i != n - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = QConv(C, (3, 3), padding=1, dtype=self.dtype,
                          name=f"up_blocks_{i}_upsampler")(h, ctx)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return QConv(cfg.sample_channels, (3, 3), padding=1,
                     dtype=self.dtype, name="conv_out")(h, ctx)


class VAEEncoder(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: QuantCtx = QuantCtx()):
        cfg = self.cfg
        ch = cfg.block_out_channels
        h = QConv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                  name="conv_in")(x, ctx)
        for i in range(len(ch)):
            for j in range(cfg.layers_per_block):
                h = VAEResnetBlock(ch[i], cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"down_blocks_{i}_resnets_{j}")(h, ctx)
            if i != len(ch) - 1:
                h = QConv(ch[i], (3, 3), strides=(2, 2), padding=1,
                          dtype=self.dtype,
                          name=f"down_blocks_{i}_downsampler")(h, ctx)
        h = VAEMidBlock(ch[-1], cfg.norm_num_groups, dtype=self.dtype,
                        name="mid_block")(h, ctx)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return QConv(cfg.latent_channels * 2, (3, 3), padding=1,
                     dtype=self.dtype, name="conv_out")(h, ctx)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(self.cfg, dtype=self.dtype)
        self.decoder = VAEDecoder(self.cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(self.cfg.latent_channels * 2, (1, 1),
                                  dtype=self.dtype, param_dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.dtype, param_dtype=self.dtype)

    def encode(self, x, rng=None, ctx: QuantCtx = QuantCtx()):
        """Returns latent sample (mode if rng is None) pre-scaled by
        ``scaling_factor``."""
        moments = self.quant_conv(self.encoder(x, ctx))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.cfg.scaling_factor

    def decode(self, z, ctx: QuantCtx = QuantCtx()):
        """z: scaled latents -> image in [-1, 1]."""
        z = z / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z), ctx)

    def __call__(self, x, rng=None, ctx: QuantCtx = QuantCtx()):
        return self.decode(self.encode(x, rng, ctx), ctx)
