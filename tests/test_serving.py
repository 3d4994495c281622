"""Serving engine tests: AOT compile + generate, dp-mesh sharded batch."""

import jax
import numpy as np

from mixdq_tpu.parallel.mesh import make_mesh
from mixdq_tpu.pipelines.txt2img import Text2ImgPipeline
from mixdq_tpu.pipelines.serving import ServingEngine
import pytest  # noqa: E402

pytestmark = pytest.mark.slow  # builds models / runs e2e (minutes on CPU)


def test_serving_engine_single():
    pipe = Text2ImgPipeline("tiny-sdxl")
    params = pipe.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(pipe, params, batch_size=2, steps=1).compile()
    imgs = eng.generate(["a cat", "a dog"], seed=1)
    assert imgs.shape == (2, 128, 128, 3)
    assert np.isfinite(imgs).all()


def test_serving_engine_mesh():
    mesh = make_mesh(8, tp=2)
    pipe = Text2ImgPipeline("tiny-sdxl")
    params = pipe.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(pipe, params, batch_size=4, steps=1,
                        mesh=mesh).compile()
    imgs = eng.generate(["a", "b", "c", "d"], seed=1)
    assert imgs.shape == (4, 128, 128, 3)
    assert np.isfinite(imgs).all()


def test_serving_engine_cfg_int8():
    """CFG (batch-doubled) serving through the int8 deploy path."""
    import jax.numpy as jnp
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

    pipe = Text2ImgPipeline("tiny-sdxl")
    params = pipe.init_params(jax.random.PRNGKey(0))
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    B = 2
    b0 = (jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(2), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    qparams = cal.calibrate(pipe.unet, {"params": params["unet"]}, [b0],
                            WQ, AQ, splits=pipe.splits)
    names = quantizable_layers(params["unet"])
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
    ctx = deploy_unet_ctx(pipe.unet, {"params": params["unet"]}, qparams,
                          ctrl, WQ, AQ, splits=pipe.splits)
    q_params = {**params, "unet": deployed_params(
        {"params": params["unet"]}, ctx)["params"]}

    eng = ServingEngine(pipe, q_params, ctx, batch_size=2, steps=2,
                        guidance_scale=5.0).compile()
    imgs = eng.generate(["a cat", "a dog"], seed=3)
    assert imgs.shape == (2, 128, 128, 3)
    assert np.isfinite(imgs).all()


def test_serving_engine_quantized_vae_mesh():
    """dp-mesh serving with BOTH the UNet and the VAE decoder int8:
    the vae_ctx deploy pytree shards over the mesh like the UNet's."""
    import jax.numpy as jnp
    from mixdq_tpu.quant.vae_quant import quantize_vae_decoder

    mesh = make_mesh(8, tp=2)
    pipe = Text2ImgPipeline("tiny-sdxl")
    params = pipe.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 4)) * 0.2
    pruned_vae, vctx = quantize_vae_decoder(
        pipe.vae, {"params": params["vae"]}, [z], deploy_compute="int8")
    q_params = {**params, "vae": pruned_vae["params"]}
    eng = ServingEngine(pipe, q_params, batch_size=4, steps=1,
                        mesh=mesh, vae_ctx=vctx).compile()
    imgs = eng.generate(["a", "b", "c", "d"], seed=1)
    assert imgs.shape == (4, 128, 128, 3)
    assert np.isfinite(imgs).all()
