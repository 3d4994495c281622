"""Reconstruction (LSQ scale learning) tests on the tiny UNet."""

import jax
import jax.numpy as jnp
import numpy as np

from mixdq_tpu.models.configs import TINY_SDXL_UNET
from mixdq_tpu.models.unet import UNet2DConditionModel
from mixdq_tpu.quant import calibrate as cal
from mixdq_tpu.quant import recon
from mixdq_tpu.quant.core import QuantSpec
from mixdq_tpu.quant.state import QuantCtx, quantizable_layers, uniform_ctrl
from mixdq_tpu.utils.metrics import sqnr
import pytest  # noqa: E402

WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest_ste",
               n_bits=4)
AQ = QuantSpec(running_stat=True)


@pytest.mark.slow
def test_recon_improves_w4_sqnr():
    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 2
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)
    fp_out = jax.jit(model.apply)(variables, *b0)

    ctrl = uniform_ctrl(names, w_bits=4, a_bits=8)
    fwd = jax.jit(lambda qp: model.apply(
        variables, *b0, QuantCtx(qparams=qp, ctrl=ctrl, mode="fake",
                                 wq=WQ, aq=AQ)))
    before = float(sqnr(fp_out, fwd(qparams)))

    qp2 = recon.reconstruct(model, variables, qparams, [b0], WQ, AQ,
                            mode="model", iters=30, lr=3e-3)
    after = float(sqnr(fp_out, fwd(qp2)))
    assert after > before, f"recon made it worse: {before} -> {after}"


def test_adaround_helpers():
    a = jnp.linspace(-4, 4, 9)
    h = recon.rect_sigmoid(a)
    assert float(h.min()) >= 0.0 and float(h.max()) <= 1.0
    # init_alpha inverts rect_sigmoid on the fractional rest
    w = jnp.asarray([0.31, -1.72, 2.49])
    d = jnp.float32(1.0)
    alpha = recon.init_alpha(w, d)
    rest = w / d - jnp.floor(w / d)
    np.testing.assert_allclose(np.asarray(recon.rect_sigmoid(alpha)),
                               np.asarray(rest), atol=1e-3)
    # temp decay: b goes 10 -> 2
    assert float(recon.temp_decay(0, 100)) == 10.0
    assert float(recon.temp_decay(99, 100)) < 2.2


@pytest.mark.slow
def test_adaround_learns_and_folds():
    """AdaRound alphas receive loss gradients (soft forward), and the
    learned hard rounding folds into deployed int codes."""
    from mixdq_tpu.ops import qops
    from mixdq_tpu.quant.core import fake_quant_adaround

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 2
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)

    qp2, alphas = recon.reconstruct(
        model, variables, qparams, [b0], WQ, AQ, mode="model", iters=12,
        lr=3e-3, adaround=True, return_alphas=True)
    assert alphas, "no alphas returned"
    # alphas must have moved away from their init (loss gradient flowed)
    names = quantizable_layers(variables["params"])
    some_name = next(iter(alphas))
    node = variables["params"]
    for p in names[some_name]:
        node = node[p]
    w = node["kernel"]
    init = recon.init_alpha(
        w, qp2[some_name].w_delta[WQ.bit_index(WQ.n_bits)])
    # same shapes; values differ after optimization
    assert alphas[some_name].shape == w.shape

    # fold: deploy codes with alpha == hard-rounded fake-quant codes
    delta = jnp.full((4,), 0.1, jnp.float32)
    w2 = jax.random.normal(jax.random.PRNGKey(1), (8, 4), jnp.float32)
    al = jax.random.normal(jax.random.PRNGKey(2), (8, 4), jnp.float32)
    prep = qops.prepare_qlinear_params(
        w2, delta, jnp.float32(0.05), jnp.float32(128.0), n_bits=8,
        alpha=al)
    hard = fake_quant_adaround(w2, delta[None, :], jnp.zeros((1, 4)), 8,
                               al, sym=True, hard=True)
    np.testing.assert_allclose(
        np.asarray(prep["w_int"].astype(jnp.float32) * delta[None, :]),
        np.asarray(hard), atol=1e-6)
