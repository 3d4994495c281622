"""Text-to-image pipeline: SDXL(-Turbo) and SD1.5(+LCM) families.

TPU-native counterpart of the reference's customized diffusers pipelines
(qdiff/models/customized_pipeline/pipeline_stable_diffusion_xl.py:79-558).
The whole denoise loop is a single ``lax.scan`` inside one jit program —
per-step trajectory capture (the reference's ``return_args=['trajectory',
'text_emb','output','added_conds','latents']`` recording,
pipeline_stable_diffusion_xl.py:451-472) falls out of scan's stacked
outputs for free instead of Python-side list mutation.

Classifier-free guidance runs as a doubled batch (uncond first, diffusers
convention), so CFG serving maps onto the MXU as one big batch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPTextModel
from ..models.configs import ModelFamilyConfig, get_family
from ..models.unet import UNet2DConditionModel, conv_shortcut_splits
from ..models.vae import AutoencoderKL
from ..quant.state import QuantCtx
from ..utils.tokenizer import load_tokenizer
from . import samplers


@dataclasses.dataclass
class PipelineOutput:
    images: np.ndarray  # [B, H, W, 3] float in [0, 1]
    latents: Optional[jnp.ndarray] = None
    # trajectory capture (calib data), shapes [S, B, ...]:
    trajectory: Optional[jnp.ndarray] = None  # scaled UNet input latents
    timesteps: Optional[jnp.ndarray] = None  # [S]
    unet_outputs: Optional[jnp.ndarray] = None
    text_emb: Optional[jnp.ndarray] = None  # [B, 77, D]
    added_conds: Optional[Dict[str, jnp.ndarray]] = None


class Text2ImgPipeline:
    """Holds module definitions + tokenizer; all state lives in the params
    dict so every method is jit-friendly."""

    def __init__(self, family, dtype=jnp.float32, tokenizer_path: Optional[str] = None):
        self.family: ModelFamilyConfig = (
            get_family(family) if isinstance(family, str) else family)
        f = self.family
        self.dtype = dtype
        self.unet = UNet2DConditionModel(f.unet, dtype=dtype)
        self.vae = AutoencoderKL(f.vae, dtype=dtype)
        self.text_encoder = CLIPTextModel(f.text_encoder, dtype=dtype)
        self.text_encoder_2 = (
            CLIPTextModel(f.text_encoder_2, dtype=dtype)
            if f.text_encoder_2 is not None else None)
        self.tokenizer = load_tokenizer(tokenizer_path, f.text_encoder.vocab_size)
        self.splits = conv_shortcut_splits(f.unet)
        # jit-cached per-stage programs: without these, text encode and
        # VAE decode dispatch op-by-op — harmless on host CPU, but on the
        # axon-tunneled TPU every eager op costs ~ms, which made repeated
        # pipeline calls (calib gen, SSIM sensitivity sweeps, election)
        # minutes-per-image instead of seconds
        self._encode_jit = jax.jit(self.encode_prompt)
        self._decode_jit = jax.jit(lambda params, lat, vctx=QuantCtx(): jnp.clip(
            self.vae.apply({"params": params["vae"]}, lat, vctx,
                           method="decode") / 2 + 0.5, 0.0, 1.0))
        self._sampler_cache: Dict[Any, Any] = {}

    def _sampler_program(self, steps: int, g: float, capture: bool):
        """jit-cached denoise-loop program. Without this, ``__call__``
        re-traces the full UNet scan body every invocation (~tens of
        seconds of host work per call for SDXL) — fatal for sweep-style
        callers (sensitivity, election). The schedule is rebuilt inside
        the traced function (host numpy at trace time -> constants)."""
        key = (steps, g, capture)
        if key not in self._sampler_cache:
            def fn(params, embeds, added, latents, neg_e, neg_a, ctx, k):
                if self.family.is_sdxl:
                    schedule = samplers.make_euler_schedule(steps)
                else:
                    schedule = samplers.make_lcm_schedule(steps)
                return self.sample_latents(
                    params, embeds, added, latents, schedule, g,
                    neg_e, neg_a, ctx, capture, k)

            self._sampler_cache[key] = jax.jit(fn)
        return self._sampler_cache[key]

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        f = self.family
        ks = jax.random.split(rng, 4)
        H = f.unet.sample_size
        B = 1
        sample = jnp.zeros((B, H, H, f.unet.in_channels), self.dtype)
        t = jnp.zeros((B,))
        ehs = jnp.zeros((B, 77, f.unet.cross_attention_dim), self.dtype)
        added = self._dummy_added_cond(B)
        params = {
            "unet": jax.jit(self.unet.init)(ks[0], sample, t, ehs, added)["params"],
            # full __call__ init (encode+decode) so the encoder is usable too
            "vae": jax.jit(self.vae.init)(
                ks[1], jnp.zeros((B, H * 8, H * 8, f.vae.sample_channels),
                                 self.dtype))["params"],
            "text_encoder": jax.jit(self.text_encoder.init)(
                ks[2], jnp.zeros((B, 77), jnp.int32))["params"],
        }
        if self.text_encoder_2 is not None:
            params["text_encoder_2"] = jax.jit(self.text_encoder_2.init)(
                ks[3], jnp.zeros((B, 77), jnp.int32))["params"]
        return params

    def _dummy_added_cond(self, B):
        f = self.family
        if f.unet.addition_embed_type != "text_time":
            return None
        pooled_dim = (f.text_encoder_2.projection_dim
                      if f.text_encoder_2 is not None else
                      f.unet.projection_class_embeddings_input_dim
                      - 6 * f.unet.addition_time_embed_dim)
        return {"text_embeds": jnp.zeros((B, pooled_dim), self.dtype),
                "time_ids": jnp.zeros((B, 6), self.dtype)}

    # ------------------------------------------------------------------
    # Prompt encoding
    # ------------------------------------------------------------------

    def encode_prompt(self, params, token_ids, token_ids_2=None):
        """Returns (prompt_embeds [B,77,D], pooled [B,P] or None).

        SDXL: concat of both encoders' penultimate states; pooled from
        encoder 2's projection. SD1.5: encoder's final hidden state."""
        if self.family.is_sdxl:
            _, pen1, _ = self.text_encoder.apply(
                {"params": params["text_encoder"]}, token_ids)
            if token_ids_2 is None:
                token_ids_2 = token_ids
            _, pen2, pooled = self.text_encoder_2.apply(
                {"params": params["text_encoder_2"]}, token_ids_2)
            return jnp.concatenate([pen1, pen2], axis=-1), pooled
        last, _, _ = self.text_encoder.apply(
            {"params": params["text_encoder"]}, token_ids)
        return last, None

    def default_time_ids(self, B, height, width):
        # [orig_h, orig_w, crop_top, crop_left, target_h, target_w]
        return jnp.tile(
            jnp.asarray([height, width, 0, 0, height, width], self.dtype)[None],
            (B, 1))

    # ------------------------------------------------------------------
    # Sampling core (jittable)
    # ------------------------------------------------------------------

    def sample_latents(
        self,
        params,
        prompt_embeds,
        added_conds,
        latents,  # [B, h, w, 4] pre-scaled noise
        schedule,
        guidance_scale: float = 0.0,
        neg_prompt_embeds=None,
        neg_added_conds=None,
        ctx: QuantCtx = QuantCtx(),
        capture: bool = False,
        lcm_noise_key: Optional[jax.Array] = None,
    ):
        """Run the denoise loop. Returns (latents, trajectory dict or None).

        ``schedule``: EulerSchedule or LCMSchedule. CFG doubles the batch
        when ``guidance_scale > 1``.
        """
        do_cfg = guidance_scale > 1.0 and neg_prompt_embeds is not None
        if do_cfg:
            embeds = jnp.concatenate([neg_prompt_embeds, prompt_embeds], axis=0)
            if added_conds is not None:
                added = {k: jnp.concatenate([neg_added_conds[k], added_conds[k]],
                                            axis=0)
                         for k in added_conds}
            else:
                added = None
        else:
            embeds, added = prompt_embeds, added_conds

        unet_apply = partial(self.unet.apply, {"params": params["unet"]})

        if isinstance(schedule, samplers.EulerSchedule):
            ts = schedule.timesteps_array()
            sig = schedule.sigmas_array()
            xs = (ts, sig[:-1], sig[1:])

            def step(lat, x):
                t, sigma, sigma_next = x
                lat_in = samplers.euler_scale_model_input(lat, sigma)
                model_in = (jnp.concatenate([lat_in, lat_in], axis=0)
                            if do_cfg else lat_in)
                eps = unet_apply(model_in, t, embeds, added, ctx)
                if do_cfg:
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + guidance_scale * (eps_c - eps_u)
                # sigma arithmetic is f32; keep the scan carry dtype stable
                new_lat = samplers.euler_step(lat, eps, sigma,
                                              sigma_next).astype(lat.dtype)
                out = (lat_in, eps) if capture else None
                return new_lat, out

            latents, traj = jax.lax.scan(step, latents, xs)
            traj_dict = None
            if capture:
                traj_dict = {"trajectory": traj[0], "unet_outputs": traj[1],
                             "timesteps": ts}
            return latents, traj_dict

        elif isinstance(schedule, samplers.LCMSchedule):
            S = schedule.num_steps
            ts = schedule.timesteps_array()
            acp_t = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
            acp_p = jnp.asarray(schedule.alphas_cumprod_prev, jnp.float32)
            if lcm_noise_key is None:
                lcm_noise_key = jax.random.PRNGKey(0)
            noise = jax.random.normal(
                lcm_noise_key, (S,) + latents.shape, latents.dtype)
            idx = jnp.arange(S)
            xs = (ts, acp_t, acp_p, noise, idx)

            def step(lat, x):
                t, a_t, a_p, nz, i = x
                model_in = (jnp.concatenate([lat, lat], axis=0)
                            if do_cfg else lat)
                eps = unet_apply(model_in, t, embeds, added, ctx)
                if do_cfg:
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    eps = eps_u + guidance_scale * (eps_c - eps_u)
                nxt, denoised = samplers.lcm_step(
                    lat, eps, a_t, a_p, t, nz,
                    timestep_scaling=schedule.timestep_scaling,
                    sigma_data=schedule.sigma_data)
                new_lat = jnp.where(i == S - 1, denoised,
                                    nxt).astype(lat.dtype)
                out = (lat, eps) if capture else None
                return new_lat, out

            latents, traj = jax.lax.scan(step, latents, xs)
            traj_dict = None
            if capture:
                traj_dict = {"trajectory": traj[0], "unet_outputs": traj[1],
                             "timesteps": ts}
            return latents, traj_dict
        raise TypeError(f"unknown schedule {type(schedule)}")

    # ------------------------------------------------------------------
    # Full pipeline
    # ------------------------------------------------------------------

    def __call__(
        self,
        params,
        prompts: Sequence[str],
        key: jax.Array,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        ctx: QuantCtx = QuantCtx(),
        capture_trajectory: bool = False,
        negative_prompts: Optional[Sequence[str]] = None,
        decode: bool = True,
        vae_ctx: QuantCtx = QuantCtx(),
    ) -> PipelineOutput:
        f = self.family
        steps = num_inference_steps or f.default_steps
        g = f.guidance_scale if guidance_scale is None else guidance_scale
        B = len(prompts)
        latent_size = f.unet.sample_size
        height = height or latent_size * 8
        width = width or latent_size * 8

        tokens = jnp.asarray(self.tokenizer(list(prompts)))
        embeds, pooled = self._encode_jit(params, tokens)
        added = None
        if f.unet.addition_embed_type == "text_time":
            added = {"text_embeds": pooled,
                     "time_ids": self.default_time_ids(B, height, width)}

        neg_embeds, neg_added = None, None
        if g > 1.0:
            neg = negative_prompts or [""] * B
            ntokens = jnp.asarray(self.tokenizer(list(neg)))
            neg_embeds, neg_pooled = self._encode_jit(params, ntokens)
            if added is not None:
                neg_added = {"text_embeds": neg_pooled,
                             "time_ids": self.default_time_ids(B, height, width)}

        # SD1.5 family = the LCM-LoRA 4-step flow (lcm_lora.yaml); SDXL
        # families use Euler discrete (diffusers default for SDXL/Turbo)
        if f.is_sdxl:
            schedule = samplers.make_euler_schedule(steps)
        else:
            schedule = samplers.make_lcm_schedule(steps)

        k_noise, k_lcm = jax.random.split(key)
        latents = jax.random.normal(
            k_noise, (B, height // 8, width // 8, f.unet.in_channels),
            self.dtype)
        if isinstance(schedule, samplers.EulerSchedule):
            latents = latents * schedule.init_noise_sigma

        latents, traj = self._sampler_program(
            steps, float(g), capture_trajectory)(
            params, embeds, added, latents, neg_embeds, neg_added,
            ctx, k_lcm)

        images = None
        if decode:
            images = np.asarray(self._decode_jit(params, latents, vae_ctx),
                                dtype=np.float32)

        return PipelineOutput(
            images=images,
            latents=latents,
            trajectory=None if traj is None else traj["trajectory"],
            timesteps=None if traj is None else traj["timesteps"],
            unet_outputs=None if traj is None else traj["unet_outputs"],
            text_emb=embeds,
            added_conds=added,
        )
