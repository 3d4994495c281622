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

from .configs import CLIPTextConfig


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
        act = quick_gelu if c.hidden_act == "quick_gelu" else nn.gelu
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
