"""q/k/v/softmax activation quantizer path (quant_block.py:213-233)."""

import jax
import jax.numpy as jnp

from mixdq_tpu.models.configs import TINY_SDXL_UNET
from mixdq_tpu.models.unet import UNet2DConditionModel
from mixdq_tpu.quant import calibrate as cal
from mixdq_tpu.quant.core import QuantSpec
from mixdq_tpu.quant.state import QuantCtx, uniform_ctrl
from mixdq_tpu.utils.metrics import sqnr
import pytest  # noqa: E402

pytestmark = pytest.mark.slow  # builds models / runs e2e (minutes on CPU)

WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
AQ = QuantSpec(running_stat=True)
SOFTMAX_AQ = QuantSpec(running_stat=True, always_zero=True)


def test_qkv_softmax_quantizers_calibrate_and_apply():
    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 1
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)

    qparams = cal.calibrate(model, variables, [b0], WQ, AQ,
                            softmax_aq=SOFTMAX_AQ)
    qact_names = [n for n in qparams if "act_quantizer" in n]
    assert any(n.endswith("act_quantizer_q") for n in qact_names)
    assert any(n.endswith("act_quantizer_softmax") for n in qact_names)
    # softmax quantizer: always_zero -> zp == 0 at every bit
    sm = next(n for n in qact_names if n.endswith("act_quantizer_softmax"))
    assert float(jnp.max(jnp.abs(qparams[sm].a_zp))) == 0.0

    # ctrl over ALL calibrated entries (incl. bare act quantizers)
    ctrl = uniform_ctrl(sorted(qparams), w_bits=8, a_bits=8)
    ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake", wq=WQ, aq=AQ,
                   softmax_aq=SOFTMAX_AQ, qkv_quant=True)
    fp_out = jax.jit(lambda v, *a: model.apply(v, *a, QuantCtx(
        qkv_quant=True, softmax_aq=SOFTMAX_AQ)))(variables, *b0)
    q_out = jax.jit(lambda v, qp, ct, *a: model.apply(
        v, *a, ctx.replace(qparams=qp, ctrl=ct)))(variables, qparams, ctrl, *b0)
    s = float(sqnr(fp_out, q_out))
    assert s > 10.0, f"qkv-quant output SQNR too low: {s}"

    # disabling only the qkv quantizers recovers plain W8A8 behavior
    ctrl_no_qact = dict(ctrl)
    for n in qact_names:
        ctrl_no_qact[n] = ctrl[n].replace(a_on=jnp.asarray(False))
    q2 = jax.jit(lambda v, qp, ct, *a: model.apply(
        v, *a, ctx.replace(qparams=qp, ctrl=ct)))(variables, qparams,
                                                  ctrl_no_qact, *b0)
    s2 = float(sqnr(fp_out, q2))
    assert s2 >= s - 1.0
