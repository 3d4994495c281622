"""Model-family configurations.

Mirrors the HF config contracts of the models the reference targets
(README.md:96-118: SDXL-Turbo 1-step, SDXL 30-step, SD1.5+LCM-LoRA
4-step), plus scaled-down ``tiny-*`` variants used for CPU tests and
compile-checks. SDXL-Turbo shares the SDXL UNet architecture.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D")
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 2, 10)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20)
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    use_linear_projection: bool = True
    addition_embed_type: Optional[str] = "text_time"  # SDXL micro-conds
    addition_time_embed_dim: int = 256
    # text_embeds dim + 6 * addition_time_embed_dim (SDXL: 1280 + 1536)
    projection_class_embeddings_input_dim: int = 2816
    norm_num_groups: int = 32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    intermediate_size: int = 3072
    projection_dim: Optional[int] = None  # set => pooled projection head
    hidden_act: str = "quick_gelu"


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT image tower (HF ``vision_model.*`` space). Defaults:
    ViT-L/14 (openai/clip-vit-large-patch14 — the standard CLIP-score
    backbone)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: Optional[int] = 768
    hidden_act: str = "quick_gelu"


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025  # SDXL; SD1.5 uses 0.18215
    sample_channels: int = 3


@dataclasses.dataclass(frozen=True)
class ModelFamilyConfig:
    name: str
    unet: UNetConfig
    vae: VAEConfig
    text_encoder: CLIPTextConfig
    text_encoder_2: Optional[CLIPTextConfig] = None  # SDXL dual-encoder
    is_sdxl: bool = True
    default_steps: int = 1
    guidance_scale: float = 0.0
    # measured-best int8 deploy compute strategy on TPU v5e (bench.py):
    # 'int8_sec' (whole-section Pallas int8 convs + XLA int8 dense) wins
    # on both families — 1.25x on transformer-heavy SDXL-Turbo, 1.38x on
    # conv-heavy SD1.5 (where plain 'int8' LOSES at 0.76x: XLA s8 convs
    # upconvert to the bf16 MXU pipeline, so the 64x64 spatial
    # act-quantize passes dominate; the Pallas implicit-GEMM conv path
    # runs native int8 and keeps its epilogues in-kernel)
    default_deploy_compute: str = "int8_sec"


# --- SDXL / SDXL-Turbo (same UNet arch; Turbo = 1-step distilled) --------

SDXL_UNET = UNetConfig(sample_size=128)
SDXL_TURBO_UNET = UNetConfig(sample_size=64)

_CLIP_L = CLIPTextConfig()  # CLIP ViT-L/14 text tower
_CLIP_BIGG = CLIPTextConfig(
    hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
    projection_dim=1280, hidden_act="gelu",
)

SDXL_VAE = VAEConfig()
SD15_VAE = VAEConfig(scaling_factor=0.18215)

# --- SD1.5 (LCM-LoRA family) ---------------------------------------------

SD15_UNET = UNetConfig(
    sample_size=64,
    block_out_channels=(320, 640, 1280, 1280),
    down_block_types=(
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=(
        "UpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
    transformer_layers_per_block=(1, 1, 1, 1),
    num_attention_heads=(8, 8, 8, 8),
    attention_head_dim=0,  # derived: channels // heads
    cross_attention_dim=768,
    use_linear_projection=False,
    addition_embed_type=None,
)

# --- Tiny variants for CPU tests / compile-checks ------------------------

TINY_SDXL_UNET = UNetConfig(
    sample_size=16,
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    layers_per_block=2,
    transformer_layers_per_block=(1, 2),
    num_attention_heads=(2, 2),
    attention_head_dim=16,
    # dual tiny encoders concat: 64 + 64 (SDXL: 768 + 1280 = 2048)
    cross_attention_dim=128,
    addition_time_embed_dim=32,
    projection_class_embeddings_input_dim=32 * 6 + 64,  # 6 time_ids + pooled(64)
    norm_num_groups=16,
)

TINY_SD15_UNET = UNetConfig(
    sample_size=16,
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 2),
    attention_head_dim=0,
    cross_attention_dim=64,
    use_linear_projection=False,
    addition_embed_type=None,
    norm_num_groups=16,
)

TINY_CLIP = CLIPTextConfig(
    vocab_size=1000, hidden_size=64, num_layers=2, num_heads=2,
    intermediate_size=128, max_position_embeddings=77,
)
TINY_CLIP_2 = CLIPTextConfig(
    vocab_size=1000, hidden_size=64, num_layers=2, num_heads=2,
    intermediate_size=128, max_position_embeddings=77, projection_dim=64,
)
# 4 blocks => the standard 8x spatial factor between pixels and latents
TINY_VAE = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                     norm_num_groups=8)


FAMILIES = {
    "sdxl-turbo": ModelFamilyConfig(
        name="sdxl-turbo", unet=SDXL_TURBO_UNET, vae=SDXL_VAE,
        text_encoder=_CLIP_L, text_encoder_2=_CLIP_BIGG,
        is_sdxl=True, default_steps=1, guidance_scale=0.0),
    "sdxl": ModelFamilyConfig(
        name="sdxl", unet=SDXL_UNET, vae=SDXL_VAE,
        text_encoder=_CLIP_L, text_encoder_2=_CLIP_BIGG,
        is_sdxl=True, default_steps=30, guidance_scale=7.5),
    "sd15": ModelFamilyConfig(
        name="sd15", unet=SD15_UNET, vae=SD15_VAE,
        text_encoder=_CLIP_L, is_sdxl=False,
        default_steps=4, guidance_scale=1.0),
    "tiny-sdxl": ModelFamilyConfig(
        name="tiny-sdxl", unet=TINY_SDXL_UNET, vae=TINY_VAE,
        text_encoder=TINY_CLIP, text_encoder_2=TINY_CLIP_2,
        is_sdxl=True, default_steps=1, guidance_scale=0.0),
    "tiny-sd15": ModelFamilyConfig(
        name="tiny-sd15", unet=TINY_SD15_UNET, vae=TINY_VAE,
        text_encoder=TINY_CLIP, is_sdxl=False,
        default_steps=4, guidance_scale=1.0),
}


def get_family(name: str) -> ModelFamilyConfig:
    if name not in FAMILIES:
        raise KeyError(f"unknown model family {name!r}; have {sorted(FAMILIES)}")
    return FAMILIES[name]
