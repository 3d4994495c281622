"""Analysis tool tests: unet-output error at layer/block granularity,
weight stats, act error capture."""

import jax
import jax.numpy as jnp
import pytest

from mixdq_tpu.analysis import quant_error
from mixdq_tpu.models.configs import TINY_SDXL_UNET
from mixdq_tpu.models.unet import UNet2DConditionModel
from mixdq_tpu.quant import calibrate as cal
from mixdq_tpu.quant.core import QuantSpec
from mixdq_tpu.quant.state import quantizable_layers

pytestmark = pytest.mark.slow  # builds models / runs e2e (minutes on CPU)

WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
AQ = QuantSpec(running_stat=True)


@pytest.fixture(scope="module")
def setup():
    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 1
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)
    return model, variables, qparams, b0


def test_unet_output_error_layer_and_block(setup):
    model, variables, qparams, b0 = setup
    names = sorted(quantizable_layers(variables["params"]))
    fp_out = jax.jit(model.apply)(variables, *b0)
    # one layer + one block prefix
    targets = [names[0], "down_blocks.0"]
    res = quant_error.unet_output_error(
        model, variables, qparams, targets, names, b0, fp_out, WQ, AQ,
        bits=(4, 8))
    assert set(res) == set(targets)
    for t in targets:
        s4, s8 = res[t]["sqnr"]
        assert s8 >= s4  # more bits, less error
    # block-level quantization (many layers) hurts more than one layer
    assert res["down_blocks.0"]["sqnr"][0] <= res[names[0]]["sqnr"][0] + 1.0


def test_weight_error_and_stats(setup):
    model, variables, qparams, b0 = setup
    names = sorted(quantizable_layers(variables["params"]))[:3]
    we = quant_error.weight_error(variables["params"], qparams, names, WQ)
    for n in names:
        s2, s4, s8 = we[n]["sqnr"]
        assert s2 < s4 < s8
    stats = quant_error.weight_stats(variables["params"], names)
    for n in names:
        assert stats[n]["std"] > 0
        assert "kurtosis" in stats[n]


def test_act_error_capture(setup):
    model, variables, qparams, b0 = setup
    names = sorted(quantizable_layers(variables["params"]))[:3]
    res = quant_error.act_error(model, variables, qparams, names, b0, AQ,
                                bits=(4, 8))
    assert set(res) == set(names)
    for n in names:
        s4, s8 = res[n]["sqnr"]
        assert s8 >= s4
