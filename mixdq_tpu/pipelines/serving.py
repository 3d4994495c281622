"""Batch serving: AOT-compiled, mesh-sharded generation.

New TPU-native surface (the reference is single-GPU with CUDA-graph
capture as its only serving optimization, kernels/quantize_sdxl.py:
184-286; under jit+AOT that role is free). Provides:

* ``ServingEngine`` — compiles the full denoise loop (text-embeds ->
  latents) once per (batch, steps) shape with donated latent buffers,
  over an optional dp mesh for batch parallelism.
* CFG batch doubling handled inside the compiled program.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..quant.state import QuantCtx
from . import samplers
from .txt2img import Text2ImgPipeline

logger = logging.getLogger(__name__)


class ServingEngine:
    """Ahead-of-time compiled txt2img serving.

    Usage:
        eng = ServingEngine(pipe, params, ctx, batch_size=8, steps=1)
        images = eng.generate(prompts, seed)
    """

    def __init__(
        self,
        pipe: Text2ImgPipeline,
        params: Dict[str, Any],
        ctx: QuantCtx = QuantCtx(),
        batch_size: int = 1,
        steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        mesh=None,
        vae_ctx: QuantCtx = QuantCtx(),
    ):
        f = pipe.family
        self.pipe = pipe
        self.B = batch_size
        self.steps = steps or f.default_steps
        self.g = f.guidance_scale if guidance_scale is None else guidance_scale
        self.height = height or f.unet.sample_size * 8
        self.width = width or f.unet.sample_size * 8
        self.mesh = mesh
        self.ctx = ctx
        self.vae_ctx = vae_ctx

        if mesh is not None:
            from ..parallel.mesh import make_param_shardings

            params = jax.device_put(params, make_param_shardings(mesh, params))
            if ctx.deploy:
                # tp-shard the int8 deploy pytree the same way as params:
                # w_int [K, N] / conv [kh, kw, C, K] and the per-out-channel
                # scale/bias0 vectors all shard their last axis over 'tp'
                # (param_spec's rule); act-quant scalars replicate. Without
                # this, deployed weights ride into the compiled program
                # replicated on every chip.
                self.ctx = ctx = ctx.replace(deploy=jax.device_put(
                    ctx.deploy, make_param_shardings(mesh, ctx.deploy)))
            if vae_ctx.deploy:
                self.vae_ctx = vae_ctx = vae_ctx.replace(
                    deploy=jax.device_put(
                        vae_ctx.deploy,
                        make_param_shardings(mesh, vae_ctx.deploy)))
        self.params = params

        if f.is_sdxl:
            self.schedule = samplers.make_euler_schedule(self.steps)
        else:
            self.schedule = samplers.make_lcm_schedule(self.steps)

        self._generate = self._build()

    def _build(self):
        pipe, f = self.pipe, self.pipe.family

        def run(params, ctx, vae_ctx, tokens, ntokens, key):
            embeds, pooled = pipe.encode_prompt(params, tokens)
            added = None
            if f.unet.addition_embed_type == "text_time":
                added = {"text_embeds": pooled,
                         "time_ids": pipe.default_time_ids(
                             self.B, self.height, self.width)}
            neg_embeds, neg_added = None, None
            if self.g > 1.0:
                neg_embeds, neg_pooled = pipe.encode_prompt(params, ntokens)
                if added is not None:
                    neg_added = {"text_embeds": neg_pooled,
                                 "time_ids": pipe.default_time_ids(
                                     self.B, self.height, self.width)}
            k_noise, k_lcm = jax.random.split(key)
            latents = jax.random.normal(
                k_noise,
                (self.B, self.height // 8, self.width // 8,
                 f.unet.in_channels), pipe.dtype)
            if isinstance(self.schedule, samplers.EulerSchedule):
                latents = latents * self.schedule.init_noise_sigma
            latents, _ = pipe.sample_latents(
                params, embeds, added, latents, self.schedule, self.g,
                neg_embeds, neg_added, ctx, False, k_lcm)
            img = pipe.vae.apply({"params": params["vae"]}, latents,
                                 vae_ctx, method="decode")
            return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

        jit_kwargs = {}
        if self.mesh is not None:
            tok_sharding = NamedSharding(self.mesh, P("dp", None))
            jit_kwargs = dict(
                in_shardings=(None, None, None, tok_sharding, tok_sharding,
                              None))
        fn = jax.jit(run, **jit_kwargs)
        return fn

    def compile(self):
        """Force AOT compilation with dummy inputs (warm the cache)."""
        tokens = jnp.zeros((self.B, 77), jnp.int32)
        key = jax.random.PRNGKey(0)
        out = self._generate(self.params, self.ctx, self.vae_ctx, tokens,
                             tokens, key)
        jax.block_until_ready(out)
        return self

    def generate(self, prompts: Sequence[str], seed: int = 0,
                 negative_prompts: Optional[Sequence[str]] = None) -> np.ndarray:
        assert len(prompts) == self.B, (
            f"engine compiled for batch {self.B}, got {len(prompts)}")
        tokens = jnp.asarray(self.pipe.tokenizer(list(prompts)))
        neg = negative_prompts or [""] * self.B
        ntokens = jnp.asarray(self.pipe.tokenizer(list(neg)))
        out = self._generate(self.params, self.ctx, self.vae_ctx, tokens,
                             ntokens, jax.random.PRNGKey(seed))
        return np.asarray(out)
