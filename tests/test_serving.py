"""Serving engine tests: AOT compile + generate, dp-mesh sharded batch."""

import jax
import numpy as np

from mixdq_tpu.parallel.mesh import make_mesh
from mixdq_tpu.pipelines.txt2img import Text2ImgPipeline
from mixdq_tpu.pipelines.serving import ServingEngine


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
