"""Int8 op tests against pure integer-math oracles (the reference's
self-test strategy, kernels/mixdq_extension/op/qlinear.py:66-108 and
op/qconv2d.py:25-123, rebuilt as numpy oracles) plus end-to-end int8
deploy parity vs the fake-quant simulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixdq_tpu.ops import qops
from mixdq_tpu.utils.metrics import sqnr


def np_qlinear_oracle(x_int, w_int, scale, bias0, bias=None):
    acc = x_int.astype(np.int64) @ w_int.astype(np.int64)
    out = (acc - bias0).astype(np.float64) * scale
    if bias is not None:
        out = out + bias
    return out


def test_quantize_per_tensor():
    x = jnp.asarray([[0.0, 0.1, -0.1, 12.7, -12.9, 100.0]])
    codes = qops.quantize_per_tensor(x, jnp.float32(10.0), jnp.float32(-1.0))
    np.testing.assert_array_equal(
        np.asarray(codes), [[-1, 0, -2, 126, -128, 127]])


@pytest.mark.parametrize("M,K,N", [(8, 16, 32), (5, 12, 20)])
def test_qlinear_matches_int_oracle(M, K, N):
    rng = np.random.RandomState(0)
    x_int = rng.randint(-128, 128, (M, K)).astype(np.int8)
    w_int = rng.randint(-128, 128, (K, N)).astype(np.int8)
    scale = rng.rand(N).astype(np.float32) * 0.01
    zp_s = np.float32(-3.0)
    bias0 = zp_s * w_int.astype(np.int64).sum(0).astype(np.float32)
    bias = rng.randn(N).astype(np.float32)
    got = qops.qlinear(jnp.asarray(x_int), jnp.asarray(w_int),
                       jnp.asarray(scale), jnp.asarray(bias0),
                       jnp.asarray(bias), out_dtype=jnp.float32)
    want = np_qlinear_oracle(x_int, w_int, scale, bias0, bias)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("pad,stride", [(0, 1), (1, 1), (1, 2)])
def test_qconv2d_matches_dequant_reference(pad, stride):
    """int8 conv with zp-code padding == FP conv of the dequantized codes
    with zero padding (the property the reference needs a per-pixel
    bias0 kernel for, conv_act_zero_point_propagate.cu)."""
    rng = np.random.RandomState(1)
    B, H, W, C, K = 2, 8, 8, 4, 6
    a_delta, a_zp = np.float32(0.05), np.float32(117.0)
    zp_s = a_zp - 128.0
    x = rng.randn(B, H, W, C).astype(np.float32)
    codes = np.clip(np.round(x / a_delta) + zp_s, -128, 127).astype(np.int8)
    w_delta = (rng.rand(K).astype(np.float32) + 0.5) * 0.02
    w = rng.randn(3, 3, C, K).astype(np.float32)
    w_int = np.clip(np.round(w / w_delta), -128, 127).astype(np.int8)
    bias0 = zp_s * w_int.astype(np.int64).sum((0, 1, 2)).astype(np.float32)
    scale = w_delta * a_delta

    got = qops.qconv2d(
        jnp.asarray(codes), jnp.asarray(w_int), jnp.asarray(scale),
        jnp.asarray(bias0), jnp.asarray(zp_s), strides=(stride, stride),
        padding=(pad, pad), out_dtype=jnp.float32)

    # reference: FP conv of dequantized tensors with standard zero padding
    x_dq = (codes.astype(np.float32) - zp_s) * a_delta
    w_dq = w_int.astype(np.float32) * w_delta
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x_dq), jnp.asarray(w_dq), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_int8_deploy_end_to_end_matches_fake_quant():
    """Tiny UNet: int8 deploy path ~= fake-quant W8A8 simulation, and the
    deployed params tree has no fp kernels for quantized layers."""
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel, conv_shortcut_splits
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import QuantCtx, quantizable_layers, uniform_ctrl

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 2
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    splits = {k: v for k, v in conv_shortcut_splits(TINY_SDXL_UNET).items()
              if k in names}
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ, splits=splits)
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)

    fake_out = jax.jit(lambda v, qp, ct, *a: model.apply(
        v, *a, QuantCtx(qparams=qp, ctrl=ct, mode="fake", wq=WQ, aq=AQ))
    )(variables, qparams, ctrl, *b0)

    ctx = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                          splits=splits, bos_aware=False)
    pruned = deployed_params(variables, ctx)
    # every deployed layer's fp kernel is gone
    remaining = quantizable_layers(pruned["params"])
    assert len(remaining) == 0, f"kernels left: {list(remaining)[:5]}"

    int8_out = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, ctx, *b0)
    s = float(sqnr(fake_out, int8_out))
    assert s > 25.0, f"int8 deploy vs fake-quant SQNR too low: {s}"


@pytest.mark.slow
def test_int8_deploy_split_conv_present():
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel, conv_shortcut_splits
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import build_deploy_params, uniform_layer_bits
    from mixdq_tpu.quant.state import quantizable_layers

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 1
    b0 = (jnp.zeros((B, 16, 16, 4)), jnp.zeros((B,)),
          jnp.zeros((B, 77, 128)),
          {"text_embeds": jnp.zeros((B, 64)), "time_ids": jnp.zeros((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    splits = {k: v for k, v in conv_shortcut_splits(TINY_SDXL_UNET).items()
              if k in names}
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ, splits=splits)
    deploy = build_deploy_params(variables["params"], qparams,
                                 uniform_layer_bits(variables["params"]),
                                 splits=splits)
    for name in splits:
        assert deploy[name].kind == "conv_split"
        assert deploy[name].part0.w_int.shape[2] == splits[name]


@pytest.mark.slow
def test_dequant_mode_matches_weight_only_fake_quant():
    """'dequant' deploy compute == fake-quant with acts disabled."""
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel, conv_shortcut_splits
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import QuantCtx, quantizable_layers, uniform_ctrl

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 1
    b0 = (jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(4), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    splits = {k: v for k, v in conv_shortcut_splits(TINY_SDXL_UNET).items()
              if k in names}
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ, splits=splits)
    ctrl_w_only = uniform_ctrl(names, w_bits=8, a_bits=8, a_on=False)
    fake_out = jax.jit(lambda v, qp, ct, *a: model.apply(
        v, *a, QuantCtx(qparams=qp, ctrl=ct, mode="fake", wq=WQ, aq=AQ))
    )(variables, qparams, ctrl_w_only, *b0)

    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
    ctx = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                          splits=splits, bos_aware=False)
    ctx = ctx.replace(deploy_compute="dequant")
    pruned = deployed_params(variables, ctx)
    deq_out = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(pruned, ctx, *b0)
    s = float(sqnr(fake_out, deq_out))
    assert s > 35.0, f"dequant vs weight-only fake SQNR too low: {s}"


def test_w4_deploy_uses_int4_storage():
    from mixdq_tpu.ops import qops as _q
    import jax.numpy as jnp
    from mixdq_tpu.quant.deploy import build_deploy_params
    from mixdq_tpu.quant.state import LayerQParams

    w = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    params = {"lin": {"kernel": w}}
    qp = {"lin": LayerQParams(
        w_delta=jnp.ones((3, 8)) * 0.1, w_zp=jnp.zeros((3, 8)),
        a_delta=jnp.ones(3), a_zp=jnp.full((3,), 128.0))}
    deploy = build_deploy_params(params, qp, {"lin": (4, 8)}, use_int4_storage=True)
    assert str(deploy["lin"].w_int.dtype) == "int4"
    # int8-math path upcasts transparently
    out = _q.qlinear(jnp.zeros((2, 16), jnp.int8), deploy["lin"].w_int,
                     deploy["lin"].scale, deploy["lin"].bias0,
                     out_dtype=jnp.float32)
    assert out.shape == (2, 8)


@pytest.mark.slow
def test_w4_packed_deploy_end_to_end():
    """W4A8 with halves-packed weights matches W4 weight-only fake quant."""
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import QuantCtx, quantizable_layers, uniform_ctrl

    # bf16 model so the fake baseline and the (bf16 MXU) packed kernel
    # compute in the same precision
    model = UNet2DConditionModel(TINY_SDXL_UNET, dtype=jnp.bfloat16)
    B = 1
    b0 = (jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(4), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest", n_bits=4)
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)

    ctrl_w_only = uniform_ctrl(names, w_bits=4, a_bits=8, a_on=False)
    fake_out = jax.jit(lambda v, qp, ct, *a: model.apply(
        v, *a, QuantCtx(qparams=qp, ctrl=ct, mode="fake", wq=WQ, aq=AQ))
    )(variables, qparams, ctrl_w_only, *b0)

    ctrl = uniform_ctrl(names, w_bits=4, a_bits=8)
    ctx = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                          bos_aware=False, pack_w4=True)
    ctx = ctx.replace(deploy_compute="dequant")
    # packed entries present for even-K dense layers
    assert any(e.w_packed is not None for e in ctx.deploy.values())
    pruned = deployed_params(variables, ctx)
    out = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(pruned, ctx, *b0)
    s = float(sqnr(fake_out, out))
    # per-layer parity is exact (see pack roundtrip tests); the residual
    # is bf16 rounding-order differences accumulating over 183 layers
    assert s > 12.0, f"W4-packed vs W4 fake SQNR too low: {s}"


@pytest.mark.slow
def test_bos_precompute_matches_fp_first_token():
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import (deploy_unet_ctx, deployed_params,
                                        precompute_bos_outputs)
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 2
    ehs = jax.random.normal(jax.random.PRNGKey(4), (B, 77, 128))
    b0 = (jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 4)),
          jnp.full((B,), 999.0), ehs,
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)

    ctx = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                          bos_aware=True)
    # precomputed-BoS variant: bos embedding shared across the batch
    bos_emb = ehs[0, 0]
    ctx_pre = ctx.replace(deploy=precompute_bos_outputs(
        ctx.deploy, variables["params"], bos_emb))
    # make all rows share the same BoS embedding (as in real CLIP output)
    ehs2 = ehs.at[:, 0, :].set(bos_emb)
    b1 = (b0[0], b0[1], ehs2, b0[3])
    pruned = deployed_params(variables, ctx)
    out_fallback = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, ctx, *b1)
    out_pre = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, ctx_pre, *b1)
    from mixdq_tpu.utils.metrics import sqnr
    s = float(sqnr(out_fallback, out_pre))
    # differ by the W8 weight-quant error on the BoS row: the fallback
    # dequantizes int8 weights, the precompute uses true FP weights (the
    # reference's semantics, nn/Linear.py:178-194)
    assert s > 20.0, f"BoS precompute vs fallback SQNR: {s}"


@pytest.mark.slow
def test_fused_qkv_deploy_matches_unfused():
    """fuse_qkv int8 deploy == per-layer int8 deploy (the act scales of
    to_q/to_k/to_v come from the same tensor's statistics, so the shared-
    scale fused GEMM is numerically faithful)."""
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 2
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)

    ctx0 = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                           bos_aware=False)
    out0 = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(
        deployed_params(variables, ctx0), ctx0, *b0)

    ctx1 = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                           bos_aware=False, fuse_qkv=True)
    fused = [n for n in ctx1.deploy
             if n.endswith(".to_qkv") or n.endswith(".to_kv")]
    assert fused, "no fused attention entries built"
    away = [n for n, e in ctx1.deploy.items() if e.kind == "fused_away"]
    assert len(away) >= len(fused)  # members folded, kernels stay pruned
    pruned = deployed_params(variables, ctx1)
    assert len(quantizable_layers(pruned["params"])) == 0
    out1 = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(pruned, ctx1, *b0)

    s = float(sqnr(out0, out1))
    assert s > 40.0, f"fused vs unfused int8 SQNR too low: {s}"


@pytest.mark.slow
def test_fused_qkv_bos_aware_cross_attention():
    """BoS protection survives the fused KV path (precompute + fallback)."""
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import (deploy_unet_ctx, deployed_params,
                                        precompute_bos_outputs)
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 2
    ehs = jax.random.normal(jax.random.PRNGKey(4), (B, 77, 128))
    bos_emb = ehs[0, 0]
    ehs = ehs.at[:, 0, :].set(bos_emb)
    b0 = (jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 4)),
          jnp.full((B,), 999.0), ehs,
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)

    ctx = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                          bos_aware=True, fuse_qkv=True)
    assert any(n.endswith(".attn2.to_kv") for n in ctx.deploy)
    ctx_pre = ctx.replace(deploy=precompute_bos_outputs(
        ctx.deploy, variables["params"], bos_emb))
    kv = [e for n, e in ctx_pre.deploy.items() if n.endswith(".attn2.to_kv")]
    assert all(e.bos_out is not None for e in kv)
    pruned = deployed_params(variables, ctx)
    out_fb = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(pruned, ctx, *b0)
    out_pre = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, ctx_pre, *b0)
    s = float(sqnr(out_fb, out_pre))
    assert s > 20.0, f"fused-KV BoS precompute vs fallback SQNR: {s}"


def test_gelu_exact_vs_tanh_ctx():
    """QuantCtx.gelu switches GEGLU between tanh-approx (default) and the
    diffusers-parity exact erf gelu."""
    from mixdq_tpu.models.attention import GEGLU
    from mixdq_tpu.quant.state import QuantCtx

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    m = GEGLU(16)
    v = m.init(jax.random.PRNGKey(1), x)
    y_tanh = m.apply(v, x, QuantCtx())
    y_exact = m.apply(v, x, QuantCtx(gelu="exact"))
    # close but not identical
    assert float(jnp.max(jnp.abs(y_tanh - y_exact))) < 1e-2
    assert not jnp.allclose(y_tanh, y_exact)


@pytest.mark.slow
def test_w4_packed_int8_compute_matches_unpacked():
    """Packed-W4 entries under int8 compute unpack in-graph and match the
    unpacked W4 int8 deploy exactly (reference's quint4x2-storage /
    int8-math design, quantize_sdxl.py:46-48)."""
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 1
    b0 = (jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(4), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest", n_bits=4)
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)
    ctrl = uniform_ctrl(names, w_bits=4, a_bits=8)
    run = jax.jit(lambda v, c, *a: model.apply(v, *a, c))

    ctx_u = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                            bos_aware=False, fuse_qkv=True)
    out_u = run(deployed_params(variables, ctx_u), ctx_u, *b0)

    ctx_p = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                            bos_aware=False, fuse_qkv=True, pack_w4=True)
    assert any(e.w_packed is not None for e in ctx_p.deploy.values())
    fused_packed = [n for n, e in ctx_p.deploy.items()
                    if n.endswith((".to_qkv", ".to_kv"))
                    and e.w_packed is not None]
    assert fused_packed, "fused entries should pack under W4"
    out_p = run(deployed_params(variables, ctx_p), ctx_p, *b0)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_p),
                               atol=2e-4)


def test_unpack_packed_entries_roundtrip():
    from mixdq_tpu.ops.pallas_wq_matmul import pack_w4_halves
    from mixdq_tpu.quant.deploy import DeployEntry, unpack_packed_entries

    rng = np.random.RandomState(0)
    w = rng.randint(-8, 8, (16, 8)).astype(np.int8)
    e = DeployEntry(kind="linear", w_packed=pack_w4_halves(jnp.asarray(w)),
                    scale=jnp.ones(8), bias0=jnp.zeros(8),
                    scale_inv=jnp.float32(1.0), zp_shifted=jnp.float32(0.0))
    out = unpack_packed_entries({"a": e, "b": DeployEntry(kind="fused_away")})
    np.testing.assert_array_equal(np.asarray(out["a"].w_int), w)
    assert out["a"].w_packed is None
    assert out["b"].kind == "fused_away"


@pytest.mark.slow
def test_dequant_small_m_hybrid():
    """Small-M hybrid (QuantCtx.dequant_small_m): dense/1x1 layers under
    the M threshold run weight-only — output stays close to full int8
    (the act-quantize error disappears for those layers) but differs
    (they no longer round activations)."""
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 1
    b0 = (jax.random.normal(jax.random.PRNGKey(5), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(6), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = quantizable_layers(variables["params"])
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
    ctx = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                          bos_aware=True, fuse_qkv=True)
    pruned = deployed_params(variables, ctx)
    run = jax.jit(lambda v, c, *a: model.apply(v, *a, c))
    out_int8 = run(pruned, ctx, *b0)
    hyb = ctx.replace(deploy_compute="int8_sec", dequant_small_m=512)
    out_h = run(pruned, hyb, *b0)
    s = float(sqnr(out_int8, out_h))
    assert s > 18.0, f"hybrid vs int8 SQNR too low: {s}"
    assert not jnp.allclose(out_int8, out_h)


@pytest.mark.slow
def test_mixed_act_bits_deploy_matches_fake_quant():
    """A4/A2 act layers ride the int8 deploy path with tighter code
    saturation (qops.act_clip_range) — numerics match the fake-quant
    simulation at the same per-layer act bits. Act-protected layers
    become weight-only (act_off) entries matching the fake path with
    acts off. The reference gates its kernels to A8 and leaves both
    classes FP (nn/Linear.py:28-43)."""
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import (QuantCtx, apply_bitwidth_config,
                                       protect_layers, quantizable_layers,
                                       uniform_ctrl)

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 1
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = sorted(quantizable_layers(variables["params"]))
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)

    dense = [n for n in names if "to_q" in n or "ff.net" in n]
    a4 = {n: 4 for n in dense[:4]}
    a2 = {n: 2 for n in dense[4:6]}
    protected = dense[6:8]
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
    ctrl = apply_bitwidth_config(ctrl, {**a4, **a2}, "act", WQ.candidate_bits)
    ctrl = protect_layers(ctrl, protected, "act")

    fake_out = jax.jit(lambda v, qp, ct, *a: model.apply(
        v, *a, QuantCtx(qparams=qp, ctrl=ct, mode="fake", wq=WQ, aq=AQ))
    )(variables, qparams, ctrl, *b0)

    ctx = deploy_unet_ctx(model, variables, qparams, ctrl, WQ, AQ,
                          bos_aware=False)
    # every mixed-act layer deploys (no FP fallback), at its elected bits
    for n, b in {**a4, **a2}.items():
        assert ctx.deploy[n].a_bits == b, (n, ctx.deploy[n].a_bits)
    for n in protected:
        assert ctx.deploy[n].act_off, n
    pruned = deployed_params(variables, ctx)
    assert len(quantizable_layers(pruned["params"])) == 0

    int8_out = jax.jit(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, ctx, *b0)
    s = float(sqnr(fake_out, int8_out))
    assert s > 25.0, f"mixed-act int8 deploy vs fake-quant SQNR: {s}"
