"""Pipeline tests: samplers math, tiny end-to-end generation (SDXL 1-step
Euler + SD1.5 4-step LCM), trajectory capture, CFG batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixdq_tpu.pipelines import samplers
from mixdq_tpu.pipelines.txt2img import Text2ImgPipeline


def test_euler_schedule_turbo_one_step():
    """SDXL-Turbo 1-step trailing spacing -> t=999, final sigma 0."""
    s = samplers.make_euler_schedule(1)
    assert s.timesteps == (999.0,)
    assert s.sigmas[-1] == 0.0
    assert s.init_noise_sigma == pytest.approx(
        float(np.sqrt(s.sigmas[0] ** 2 + 1)))


def test_euler_schedule_descending():
    s = samplers.make_euler_schedule(30)
    ts = np.asarray(s.timesteps)
    assert (np.diff(ts) < 0).all()
    assert len(s.sigmas) == 31


def test_euler_step_converges_on_perfect_eps():
    """With model_output == true noise, one full-sigma step recovers x0."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    sigma = 14.6
    sample = x0 + sigma * noise
    out = samplers.euler_step(sample, noise, sigma, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_lcm_schedule():
    s = samplers.make_lcm_schedule(4)
    assert len(s.timesteps) == 4
    assert all(t1 > t2 for t1, t2 in zip(s.timesteps, s.timesteps[1:]))
    assert s.alphas_cumprod_prev[-1] == 1.0


@pytest.mark.parametrize("family,steps", [("tiny-sdxl", 1), ("tiny-sd15", 4)])
@pytest.mark.slow
def test_tiny_end_to_end(family, steps):
    pipe = Text2ImgPipeline(family)
    params = pipe.init_params(jax.random.PRNGKey(0))
    out = pipe(params, ["a photo of a cat"], jax.random.PRNGKey(1),
               num_inference_steps=steps)
    assert out.images.shape == (1, 128, 128, 3)
    assert np.isfinite(out.images).all()
    assert out.images.min() >= 0.0 and out.images.max() <= 1.0


@pytest.mark.slow
def test_trajectory_capture_shapes():
    pipe = Text2ImgPipeline("tiny-sdxl")
    params = pipe.init_params(jax.random.PRNGKey(0))
    out = pipe(params, ["a", "b"], jax.random.PRNGKey(1),
               num_inference_steps=2, capture_trajectory=True, decode=False)
    assert out.trajectory.shape == (2, 2, 16, 16, 4)  # [S, B, h, w, c]
    assert out.unet_outputs.shape == (2, 2, 16, 16, 4)
    assert out.timesteps.shape == (2,)
    assert out.text_emb.shape[0] == 2


@pytest.mark.slow
def test_cfg_guidance_runs():
    pipe = Text2ImgPipeline("tiny-sdxl")
    params = pipe.init_params(jax.random.PRNGKey(0))
    out = pipe(params, ["a cat"], jax.random.PRNGKey(1),
               num_inference_steps=1, guidance_scale=5.0, decode=False)
    assert out.latents.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out.latents)).all()


@pytest.mark.slow
def test_tiny_end_to_end_bf16():
    """bf16 pipeline (production dtype) — guards scan-carry dtype
    stability and bf16 numerics through the whole stack."""
    import jax.numpy as jnp

    pipe = Text2ImgPipeline("tiny-sdxl", dtype=jnp.bfloat16)
    params = pipe.init_params(jax.random.PRNGKey(0))
    out = pipe(params, ["a photo"], jax.random.PRNGKey(1),
               num_inference_steps=2)
    assert out.images.shape == (1, 128, 128, 3)
    assert np.isfinite(out.images).all()
