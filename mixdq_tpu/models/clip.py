"""CLIP text encoders in Flax (SD1.5: ViT-L/14 tower; SDXL adds OpenCLIP
bigG with projection). transformers' Flax classes are deprecated and HF
hub access is unavailable, so this is a from-scratch implementation of the
standard CLIP text tower; param naming follows the HF ``text_model.*``
space for checkpoint conversion.

The reference treats text encoders as frozen FP components outside the
quantization scope (only the UNet is wrapped, quant_model.py:15-34), so
these use plain Dense layers.

SDXL prompt-embedding contract (customized_pipeline/
pipeline_stable_diffusion_xl.py encode path): per-encoder *penultimate*
hidden state (clip-skip), concatenated to 2048 channels; pooled output =
projected EOS-token embedding of encoder 2.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .configs import CLIPTextConfig, CLIPVisionConfig


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=self.dtype, name="v_proj")(x)
        B, T, _ = x.shape
        q = q.reshape(B, T, c.num_heads, head_dim)
        k = k.reshape(B, T, c.num_heads, head_dim)
        v = v.reshape(B, T, c.num_heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * head_dim**-0.5
        logits = logits + causal_mask[None, None, :, :]
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        # HF 'gelu' is the exact erf gelu (flax nn.gelu defaults to the
        # tanh approximation — a real numerics divergence on the SDXL
        # bigG tower, caught by tests/test_torch_parity.py)
        act = (quick_gelu if c.hidden_act == "quick_gelu"
               else lambda x: nn.gelu(x, approximate=False))
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(c, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, param_dtype=self.dtype, name="fc1")(h)
        h = act(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, param_dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state, penultimate_hidden_state, pooled).

    ``pooled`` is the final-LN hidden at each sequence's EOS position
    (CLIP convention: argmax of input ids), passed through
    ``text_projection`` when ``cfg.projection_dim`` is set."""

    cfg: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        c = self.cfg
        B, T = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, param_dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (c.max_position_embeddings, c.hidden_size))
        x = tok + pos[None, :T, :].astype(self.dtype)

        causal = jnp.triu(jnp.full((T, T), -jnp.inf, dtype=jnp.float32), k=1)
        penultimate = x
        for i in range(c.num_layers):
            penultimate = x
            x = CLIPEncoderLayer(c, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        # penultimate = hidden state *entering* the last layer's output, i.e.
        # output of layer L-1 (HF hidden_states[-2])
        penultimate = x if c.num_layers == 0 else penultimate
        # recompute properly: run final LN only on the last output
        last = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="final_layer_norm")(x)

        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = last[jnp.arange(B), eos_idx]
        if c.projection_dim is not None:
            pooled = nn.Dense(c.projection_dim, use_bias=False,
                              dtype=self.dtype, param_dtype=self.dtype, name="text_projection")(pooled)
        return last, penultimate, pooled


# CLIP-normalization constants (HF CLIPImageProcessor defaults)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_images(images: jnp.ndarray,
                      image_size: int = 224) -> jnp.ndarray:
    """[B, H, W, 3] images in [0, 1] -> CLIP-normalized [B, S, S, 3]."""
    import jax

    B, H, W, _ = images.shape
    if (H, W) != (image_size, image_size):
        images = jax.image.resize(
            images, (B, image_size, image_size, 3), method="bilinear")
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (images - mean) / std


class CLIPVisionModel(nn.Module):
    """CLIP ViT image tower (HF ``vision_model.*`` naming) — the feature
    extractor for CLIP-score and CLIP-FID (the reference lists both
    metrics as TODO, README.md:169-171; this implements them TPU-native).

    Returns ``(last_hidden_state, pooled)`` where ``pooled`` is the
    post-LN CLS embedding passed through ``visual_projection`` when
    ``cfg.projection_dim`` is set (the CLIP image embedding space)."""

    cfg: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        """pixel_values: [B, S, S, 3] CLIP-normalized (NHWC)."""
        c = self.cfg
        B = pixel_values.shape[0]
        n_patches = (c.image_size // c.patch_size) ** 2

        patches = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            dtype=self.dtype, param_dtype=self.dtype,
            name="patch_embedding")(pixel_values)
        patches = patches.reshape(B, n_patches, c.hidden_size)

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        cls = jnp.broadcast_to(cls.astype(self.dtype),
                               (B, 1, c.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (n_patches + 1, c.hidden_size))
        x = x + pos[None].astype(self.dtype)

        # HF misspells this module 'pre_layrnorm'; keep the name so
        # converted checkpoints map 1:1
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="pre_layrnorm")(x)
        zero_mask = jnp.zeros((x.shape[1], x.shape[1]), jnp.float32)
        text_like = CLIPTextConfig(
            hidden_size=c.hidden_size, num_heads=c.num_heads,
            intermediate_size=c.intermediate_size, hidden_act=c.hidden_act)
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(text_like, dtype=self.dtype,
                                 name=f"layers_{i}")(x, zero_mask)

        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="post_layernorm")(x[:, 0])
        if c.projection_dim is not None:
            pooled = nn.Dense(c.projection_dim, use_bias=False,
                              dtype=self.dtype, param_dtype=self.dtype,
                              name="visual_projection")(pooled)
        return x, pooled
