"""End-to-end calibration + fake-quant tests on the tiny SDXL UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixdq_tpu.models.configs import TINY_SDXL_UNET
from mixdq_tpu.models.unet import UNet2DConditionModel, conv_shortcut_splits
from mixdq_tpu.quant import calibrate as cal
from mixdq_tpu.quant.core import QuantSpec
from mixdq_tpu.quant.state import (QuantCtx, apply_bitwidth_config,
                                   quantizable_layers, uniform_ctrl)
from mixdq_tpu.utils.metrics import sqnr

pytestmark = pytest.mark.slow  # builds models / runs e2e (minutes on CPU)

WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
AQ = QuantSpec(sym=False, channel_wise=False, round_mode="nearest_ste",
               running_stat=True)


@pytest.fixture(scope="module")
def setup():
    model = UNet2DConditionModel(TINY_SDXL_UNET)
    cfg = TINY_SDXL_UNET
    rng = jax.random.PRNGKey(0)

    def batch(key):
        ks = jax.random.split(key, 4)
        B = 2
        return (
            jax.random.normal(ks[0], (B, cfg.sample_size, cfg.sample_size, 4)),
            jnp.full((B,), 999.0),
            jax.random.normal(ks[1], (B, 77, cfg.cross_attention_dim)),
            {"text_embeds": jax.random.normal(ks[2], (B, 64)),
             "time_ids": jnp.tile(jnp.arange(6.0)[None], (B, 1))},
        )

    b0 = batch(jax.random.PRNGKey(1))
    variables = jax.jit(model.init)(rng, *b0)
    splits = conv_shortcut_splits(cfg)
    # restrict split table to layers that exist (tiny model has 2 up blocks)
    names = set(quantizable_layers(variables["params"]))
    splits = {k: v for k, v in splits.items() if k in names}
    batches = [batch(jax.random.PRNGKey(i)) for i in range(1, 4)]
    qparams = cal.calibrate(model, variables, batches, WQ, AQ, splits=splits)
    return model, variables, qparams, names, splits, b0


def test_qparam_shapes(setup):
    model, variables, qparams, names, splits, b0 = setup
    assert set(qparams) == names
    for name, qp in qparams.items():
        assert qp.w_delta is not None and qp.w_delta.shape[0] == 3
        assert qp.a_delta is not None and qp.a_delta.shape == (3,)
    for name in splits:
        assert qparams[name].w0_delta is not None, name
        assert qparams[name].a0_delta is not None, name


def test_fake_quant_w8a8_close_to_fp(setup):
    model, variables, qparams, names, splits, b0 = setup
    fp_out = jax.jit(model.apply)(variables, *b0)

    fwd = jax.jit(lambda v, qp, ct, *args: model.apply(
        v, *args, QuantCtx(qparams=qp, ctrl=ct, mode="fake", wq=WQ, aq=AQ)))

    ctrl8 = uniform_ctrl(names, w_bits=8, a_bits=8)
    out8 = fwd(variables, qparams, ctrl8, *b0)
    s8 = float(sqnr(fp_out, out8))
    assert s8 > 15.0, f"W8A8 SQNR too low: {s8}"

    # same compiled fn, different ctrl arrays -> W2 must be much worse
    ctrl2 = uniform_ctrl(names, w_bits=2, a_bits=2)
    out2 = fwd(variables, qparams, ctrl2, *b0)
    s2 = float(sqnr(fp_out, out2))
    assert s2 < s8 - 3.0, f"W2A2 ({s2}) should be well below W8A8 ({s8})"


def test_quant_disabled_matches_fp_exactly(setup):
    model, variables, qparams, names, splits, b0 = setup
    fp_out = jax.jit(model.apply)(variables, *b0)
    ctrl_off = uniform_ctrl(names, w_on=False, a_on=False)
    out = jax.jit(lambda v, qp, ct, *args: model.apply(
        v, *args, QuantCtx(qparams=qp, ctrl=ct, mode="fake", wq=WQ, aq=AQ))
    )(variables, qparams, ctrl_off, *b0)
    # not bit-exact across separately-jitted programs: the CI VM can migrate
    # hosts mid-run, changing XLA:CPU algorithm selection
    np.testing.assert_allclose(np.asarray(out), np.asarray(fp_out),
                               rtol=1e-4, atol=1e-4)


def test_bitwidth_config_and_protect(setup):
    model, variables, qparams, names, splits, b0 = setup
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
    some = sorted(names)[:3]
    cfg = {some[0]: 4, some[1]: 2, some[2]: 0}
    ctrl2 = apply_bitwidth_config(ctrl, cfg, "weight")
    assert int(ctrl2[some[0]].w_idx) == 1
    assert int(ctrl2[some[1]].w_idx) == 0
    assert not bool(ctrl2[some[2]].w_on)
    with pytest.raises(KeyError):
        apply_bitwidth_config(ctrl, {"nonexistent.layer": 8}, "weight")
