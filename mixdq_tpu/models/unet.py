"""UNet2DConditionModel in Flax — diffusers-parity structure, TPU-native
execution (NHWC, bf16-friendly, fully jittable).

Module names replicate the diffusers qualified-name space (reference arch
dump ``UNet2DConditionModel_SDXL_Turbo.txt``) so the reference's per-layer
bit-width YAMLs, act-protect lists, and quant checkpoints address our
layers 1:1 (see ``mixdq_tpu.quant.state.canonical_name``).

Forward contract matches the reference QuantModel's delegate signature
(quant_model.py:220-237): ``(sample, timesteps, encoder_hidden_states,
added_cond_kwargs) -> noise prediction``, with ``added_cond_kwargs``
carrying SDXL's ``text_embeds``/``time_ids`` micro-conditioning.

The channel-split mechanism for up-block concat-skip resnets is built-in:
the up blocks pass ``split=`` (the upstream hidden channel count) into each
resnet's conv_shortcut, reproducing ``convert_model_split``'s monkey-patch
(quant_block_forward_func.py:84-266) structurally.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..quant.state import QuantCtx
from .attention import Transformer2DModel
from .configs import UNetConfig


from .embeddings import TimestepEmbedding, timestep_sinusoidal
from .layers import QConv
from .resnet import Downsample2D, ResnetBlock2D, Upsample2D


def _transformer_cls(remat: bool):
    """Optionally remat the transformer stacks — the TPU counterpart of
    the reference's gradient-checkpointing toggle (set_grad_ckpt,
    quant_model.py:239-246; enabled for reconstruction memory,
    scripts/ptq.py:95-97). Transformers hold most UNet activations."""
    if remat:
        return nn.remat(Transformer2DModel)
    return Transformer2DModel


class DownBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int
    add_downsample: bool
    groups: int
    dtype: Any
    remat: bool = False

    @nn.compact
    def __call__(self, x, temb, ctx):
        skips = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlock2D(in_ch, self.out_channels, self.temb_channels,
                              groups=self.groups, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb, ctx)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x, ctx)
            skips.append(x)
        return x, skips


class CrossAttnDownBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int
    transformer_layers: int
    heads: int
    head_dim: int
    cross_attention_dim: int
    use_linear_projection: bool
    add_downsample: bool
    groups: int
    dtype: Any
    remat: bool = False

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states, ctx):
        skips = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlock2D(in_ch, self.out_channels, self.temb_channels,
                              groups=self.groups, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb, ctx)
            x = _transformer_cls(self.remat)(
                self.out_channels, self.heads, self.head_dim,
                self.transformer_layers, self.cross_attention_dim,
                use_linear_projection=self.use_linear_projection,
                norm_num_groups=self.groups, dtype=self.dtype,
                name=f"attentions_{i}")(x, encoder_hidden_states, ctx)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x, ctx)
            skips.append(x)
        return x, skips


class UNetMidBlock2DCrossAttn(nn.Module):
    channels: int
    temb_channels: int
    transformer_layers: int
    heads: int
    head_dim: int
    cross_attention_dim: int
    use_linear_projection: bool
    groups: int
    dtype: Any
    remat: bool = False

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states, ctx):
        x = ResnetBlock2D(self.channels, self.channels, self.temb_channels,
                          groups=self.groups, dtype=self.dtype,
                          name="resnets_0")(x, temb, ctx)
        x = _transformer_cls(self.remat)(
            self.channels, self.heads, self.head_dim, self.transformer_layers,
            self.cross_attention_dim,
            use_linear_projection=self.use_linear_projection,
            norm_num_groups=self.groups, dtype=self.dtype,
            name="attentions_0")(x, encoder_hidden_states, ctx)
        x = ResnetBlock2D(self.channels, self.channels, self.temb_channels,
                          groups=self.groups, dtype=self.dtype,
                          name="resnets_1")(x, temb, ctx)
        return x


class UpBlock2D(nn.Module):
    in_channels: int       # channels of the deepest incoming skip group
    prev_output_channel: int
    out_channels: int
    temb_channels: int
    num_layers: int
    add_upsample: bool
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x, skips, temb, ctx):
        for i in range(self.num_layers):
            skip = skips.pop()
            # split = upstream hidden channel count, pre-concat
            # (quant_block_forward_func.py:97-99)
            split = x.shape[-1]
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(x.shape[-1], self.out_channels,
                              self.temb_channels, groups=self.groups,
                              dtype=self.dtype, name=f"resnets_{i}")(
                x, temb, ctx, split=split)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x, ctx)
        return x


class CrossAttnUpBlock2D(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    temb_channels: int
    num_layers: int
    transformer_layers: int
    heads: int
    head_dim: int
    cross_attention_dim: int
    use_linear_projection: bool
    add_upsample: bool
    groups: int
    dtype: Any
    remat: bool = False

    @nn.compact
    def __call__(self, x, skips, temb, encoder_hidden_states, ctx):
        for i in range(self.num_layers):
            skip = skips.pop()
            split = x.shape[-1]
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(x.shape[-1], self.out_channels,
                              self.temb_channels, groups=self.groups,
                              dtype=self.dtype, name=f"resnets_{i}")(
                x, temb, ctx, split=split)
            x = _transformer_cls(self.remat)(
                self.out_channels, self.heads, self.head_dim,
                self.transformer_layers, self.cross_attention_dim,
                use_linear_projection=self.use_linear_projection,
                norm_num_groups=self.groups, dtype=self.dtype,
                name=f"attentions_{i}")(x, encoder_hidden_states, ctx)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x, ctx)
        return x


def conv_shortcut_splits(cfg: UNetConfig) -> Dict[str, int]:
    """Channel-split table for up-block concat-shortcut convs: layer name ->
    upstream hidden channel count. The TPU-native equivalent of the
    hard-coded ``_SPLIT`` table (kernels/quantize.py:61-64); here derived
    from the architecture (for SDXL it reproduces
    ``[1280,1280,1280,1280,640,640,640,320,320]``)."""
    rev = list(reversed(cfg.block_out_channels))
    out: Dict[str, int] = {}
    n_layers = cfg.layers_per_block + 1
    for i in range(len(cfg.up_block_types)):
        for j in range(n_layers):
            if j == 0:
                split = rev[0] if i == 0 else rev[i - 1]
            else:
                split = rev[i]
            out[f"up_blocks.{i}.resnets.{j}.conv_shortcut"] = split
    return out


class UNet2DConditionModel(nn.Module):
    config: UNetConfig
    dtype: Any = jnp.float32
    remat: bool = False  # checkpoint transformer stacks (training memory)

    def _heads_and_dim(self, block_idx: int) -> Tuple[int, int]:
        cfg = self.config
        heads = cfg.num_attention_heads[block_idx]
        if cfg.attention_head_dim:
            head_dim = cfg.attention_head_dim
        else:  # SD1.5 style: head_dim derived from channels
            head_dim = cfg.block_out_channels[block_idx] // heads
        return heads, head_dim

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C] latent (NHWC)
        timesteps: jnp.ndarray,  # [] or [B]
        encoder_hidden_states: jnp.ndarray,  # [B, T, D]
        added_cond_kwargs: Optional[Dict[str, jnp.ndarray]] = None,
        ctx: QuantCtx = QuantCtx(),
    ) -> jnp.ndarray:
        cfg = self.config
        B = sample.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))

        # 1. time embedding
        t_emb = timestep_sinusoidal(timesteps, cfg.block_out_channels[0])
        t_emb = t_emb.astype(self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb, ctx)

        # 2. SDXL micro-conditioning (text_embeds + time_ids)
        if cfg.addition_embed_type == "text_time":
            assert added_cond_kwargs is not None, (
                "SDXL UNet requires added_cond_kwargs{text_embeds,time_ids}")
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            t_ids = timestep_sinusoidal(
                time_ids.reshape(-1), cfg.addition_time_embed_dim)
            t_ids = t_ids.reshape(B, -1)
            add_emb = jnp.concatenate(
                [text_embeds.astype(t_ids.dtype), t_ids], axis=-1)
            assert add_emb.shape[-1] == cfg.projection_class_embeddings_input_dim
            aug = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                    name="add_embedding")(
                add_emb.astype(self.dtype), ctx)
            emb = emb + aug

        # 3. input conv
        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)
        if ctx.mode == "int8" and ctx.deploy is not None:
            from ..quant.deploy import (precompute_cross_kv,
                                        precompute_linear_bank)

            if ctx.fuse_qkv:
                bank = precompute_cross_kv(encoder_hidden_states, ctx,
                                           self.dtype)
                if bank:
                    ctx = ctx.replace(cross_kv=bank)
            # time_emb_proj bank: every resnet's projection consumes the
            # same silu(emb) (the per-resnet nn.silu(temb) CSEs with this)
            tb = precompute_linear_bank(nn.silu(emb), ctx, self.dtype,
                                        ".time_emb_proj")
            if tb:
                ctx = ctx.replace(linear_bank=tb)
        h = QConv(cfg.block_out_channels[0], (3, 3), padding=1,
                  dtype=self.dtype, name="conv_in")(sample, ctx)

        skips = [h]

        # 4. down blocks
        n_blocks = len(cfg.block_out_channels)
        out_ch = cfg.block_out_channels[0]
        for i, btype in enumerate(cfg.down_block_types):
            in_ch = out_ch
            out_ch = cfg.block_out_channels[i]
            is_final = i == n_blocks - 1
            if btype == "CrossAttnDownBlock2D":
                heads, head_dim = self._heads_and_dim(i)
                h, s = CrossAttnDownBlock2D(
                    in_ch, out_ch, cfg.time_embed_dim, cfg.layers_per_block,
                    cfg.transformer_layers_per_block[i], heads, head_dim,
                    cfg.cross_attention_dim, cfg.use_linear_projection,
                    add_downsample=not is_final, groups=cfg.norm_num_groups,
                    dtype=self.dtype, remat=self.remat,
                    name=f"down_blocks_{i}",
                )(h, emb, encoder_hidden_states, ctx)
            elif btype == "DownBlock2D":
                h, s = DownBlock2D(
                    in_ch, out_ch, cfg.time_embed_dim, cfg.layers_per_block,
                    add_downsample=not is_final, groups=cfg.norm_num_groups,
                    dtype=self.dtype, name=f"down_blocks_{i}",
                )(h, emb, ctx)
            else:
                raise ValueError(f"unknown down block {btype}")
            skips.extend(s)

        # 5. mid
        heads, head_dim = self._heads_and_dim(n_blocks - 1)
        h = UNetMidBlock2DCrossAttn(
            cfg.block_out_channels[-1], cfg.time_embed_dim,
            cfg.transformer_layers_per_block[-1], heads, head_dim,
            cfg.cross_attention_dim, cfg.use_linear_projection,
            groups=cfg.norm_num_groups, dtype=self.dtype, remat=self.remat,
            name="mid_block",
        )(h, emb, encoder_hidden_states, ctx)

        # 6. up blocks (reversed channel order)
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_block_types):
            prev_ch = rev_channels[max(i - 1, 0)]
            out_ch_up = rev_channels[i]
            is_final = i == n_blocks - 1
            n_layers = cfg.layers_per_block + 1
            block_skips = skips[-n_layers:]
            del skips[-n_layers:]
            tf_idx = n_blocks - 1 - i
            if btype == "CrossAttnUpBlock2D":
                heads, head_dim = self._heads_and_dim(tf_idx)
                h = CrossAttnUpBlock2D(
                    rev_channels[min(i + 1, n_blocks - 1)], prev_ch, out_ch_up,
                    cfg.time_embed_dim, n_layers,
                    cfg.transformer_layers_per_block[tf_idx], heads, head_dim,
                    cfg.cross_attention_dim, cfg.use_linear_projection,
                    add_upsample=not is_final, groups=cfg.norm_num_groups,
                    dtype=self.dtype, remat=self.remat,
                    name=f"up_blocks_{i}",
                )(h, block_skips, emb, encoder_hidden_states, ctx)
            elif btype == "UpBlock2D":
                h = UpBlock2D(
                    rev_channels[min(i + 1, n_blocks - 1)], prev_ch, out_ch_up,
                    cfg.time_embed_dim, n_layers,
                    add_upsample=not is_final, groups=cfg.norm_num_groups,
                    dtype=self.dtype, name=f"up_blocks_{i}",
                )(h, block_skips, emb, ctx)
            else:
                raise ValueError(f"unknown up block {btype}")

        # 7. output head (GN+SiLU fuses into conv_out's act quantize on
        # the int8_sec pallas path — ops/pallas_gn_quant.py)
        from .resnet import _GNParams, fused_gn_entry

        dp_out = fused_gn_entry(ctx, "conv_out")
        if dp_out is not None:
            from ..ops import pallas_mode
            from ..ops.pallas_gn_quant import gn_silu_quantize

            from ..ops.qops import act_clip_range

            gamma, beta = _GNParams(h.shape[-1], name="conv_norm_out")()
            h = gn_silu_quantize(h, gamma, beta, dp_out.scale_inv,
                                 dp_out.zp_shifted,
                                 groups=cfg.norm_num_groups, eps=1e-5,
                                 interpret=pallas_mode()[1],
                                 clip=act_clip_range(dp_out.a_bits))
        else:
            h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                             dtype=self.dtype, name="conv_norm_out")(h)
            h = nn.silu(h)
        h = QConv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                  name="conv_out")(h, ctx)
        return h
