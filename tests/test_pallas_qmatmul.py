"""Pallas int8 matmul kernel vs integer-math oracle (interpret mode on
CPU; the compiled path is exercised by bench.py on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mixdq_tpu.ops.pallas_qmatmul import qmatmul


@pytest.mark.parametrize("M,K,N", [(64, 128, 128), (100, 300, 260)])
def test_qmatmul_interpret_matches_oracle(M, K, N):
    rng = np.random.RandomState(0)
    x = rng.randint(-128, 128, (M, K)).astype(np.int8)
    w = rng.randint(-128, 128, (K, N)).astype(np.int8)
    scale = (rng.rand(N).astype(np.float32) + 0.1) * 0.01
    zp_s = np.float32(-5.0)
    bias0 = zp_s * w.astype(np.int64).sum(0).astype(np.float32)
    bias = rng.randn(N).astype(np.float32)

    got = qmatmul(jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
                  jnp.asarray(bias0), jnp.asarray(bias),
                  bm=32, bn=128, bk=128, out_dtype=jnp.float32,
                  interpret=True)
    want = (x.astype(np.int64) @ w.astype(np.int64) - bias0).astype(
        np.float64) * scale + bias
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-2)


def test_qmatmul_no_bias():
    rng = np.random.RandomState(1)
    M, K, N = 32, 128, 128
    x = rng.randint(-128, 128, (M, K)).astype(np.int8)
    w = rng.randint(-128, 128, (K, N)).astype(np.int8)
    scale = np.full(N, 0.01, np.float32)
    bias0 = np.zeros(N, np.float32)
    got = qmatmul(jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
                  jnp.asarray(bias0), None, bm=32, bn=128, bk=128,
                  out_dtype=jnp.float32, interpret=True)
    want = (x.astype(np.int64) @ w.astype(np.int64)).astype(np.float64) * scale
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-2)


def test_wq_matmul_interpret_matches_dequant_reference():
    from mixdq_tpu.ops.pallas_wq_matmul import wq_matmul

    rng = np.random.RandomState(0)
    M, K, N = 64, 256, 384
    x = rng.randn(M, K).astype(np.float32)
    w_int = rng.randint(-128, 128, (K, N)).astype(np.int8)
    scale = (rng.rand(N).astype(np.float32) + 0.1) * 0.01
    bias = rng.randn(N).astype(np.float32)

    got = wq_matmul(jnp.asarray(x), jnp.asarray(w_int), jnp.asarray(scale),
                    jnp.asarray(bias), bm=32, bn=128, bk=128,
                    out_dtype=jnp.float32, interpret=True)
    want = x.astype(np.float32) @ (
        w_int.astype(np.float32) * scale[None, :]) + bias
    # bf16 MXU feed: tolerance accounts for bf16 rounding of x and w
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.5)


def test_wq_matmul_unaligned_shapes():
    from mixdq_tpu.ops.pallas_wq_matmul import wq_matmul

    rng = np.random.RandomState(1)
    M, K, N = 77, 300, 130
    x = rng.randn(M, K).astype(np.float32)
    w_int = rng.randint(-8, 8, (K, N)).astype(np.int8)
    scale = np.full(N, 0.1, np.float32)
    got = wq_matmul(jnp.asarray(x), jnp.asarray(w_int), jnp.asarray(scale),
                    None, bm=32, bn=128, bk=128, out_dtype=jnp.float32,
                    interpret=True)
    want = x @ (w_int.astype(np.float32) * 0.1)
    assert got.shape == (M, N)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.5)


def test_wq4_matmul_interpret_matches_reference():
    from mixdq_tpu.ops.pallas_wq_matmul import pack_w4_halves, wq4_matmul

    rng = np.random.RandomState(2)
    M, K, N = 32, 256, 128
    x = rng.randn(M, K).astype(np.float32)
    w_int = rng.randint(-8, 8, (K, N)).astype(np.int8)
    scale = (rng.rand(N).astype(np.float32) + 0.1) * 0.05
    packed = pack_w4_halves(jnp.asarray(w_int))
    assert packed.shape == (K // 2, N) and packed.dtype == jnp.uint8

    got = wq4_matmul(jnp.asarray(x), packed, jnp.asarray(scale),
                     bm=32, bn=128, bk=128, out_dtype=jnp.float32,
                     interpret=True)
    want = x @ (w_int.astype(np.float32) * scale[None, :])
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.5)


def test_wq4_matmul_unaligned():
    from mixdq_tpu.ops.pallas_wq_matmul import pack_w4_halves, wq4_matmul

    rng = np.random.RandomState(3)
    M, K, N = 17, 300, 130  # K even but K/2=150 unaligned
    x = rng.randn(M, K).astype(np.float32)
    w_int = rng.randint(-8, 8, (K, N)).astype(np.int8)
    scale = np.full(N, 0.1, np.float32)
    got = wq4_matmul(jnp.asarray(x), pack_w4_halves(jnp.asarray(w_int)),
                     jnp.asarray(scale), bm=32, bn=128, bk=128,
                     out_dtype=jnp.float32, interpret=True)
    want = x @ (w_int.astype(np.float32) * 0.1)
    assert got.shape == (M, N)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.5)


def test_qmatmul_fused_act_quantize():
    from mixdq_tpu.ops.pallas_qmatmul import qmatmul_fused
    from mixdq_tpu.ops import qops

    rng = np.random.RandomState(4)
    M, K, N = 48, 300, 130
    x = rng.randn(M, K).astype(np.float32)
    w_int = rng.randint(-128, 128, (K, N)).astype(np.int8)
    scale_inv = np.float32(9.7)
    zp_s = np.float32(-4.0)
    w_scale = (rng.rand(N).astype(np.float32) + 0.1) * 0.01
    scale = w_scale * (1.0 / scale_inv)
    bias0 = zp_s * w_int.astype(np.int64).sum(0).astype(np.float32)

    got = qmatmul_fused(jnp.asarray(x), jnp.asarray(w_int),
                        jnp.asarray(scale_inv), jnp.asarray(zp_s),
                        jnp.asarray(scale), jnp.asarray(bias0),
                        bm=32, bn=128, bk=128, out_dtype=jnp.float32,
                        interpret=True)
    # reference: separate quantize + qlinear
    codes = qops.quantize_per_tensor(jnp.asarray(x), jnp.asarray(scale_inv),
                                     jnp.asarray(zp_s))
    want = qops.qlinear(codes, jnp.asarray(w_int), jnp.asarray(scale),
                        jnp.asarray(bias0), out_dtype=jnp.float32)
    # in-kernel quantize uses bf16 x; tolerate bf16 rounding of x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=1.0)


def test_qmatmul_fused2_act_quantize():
    """v2 fused kernel (quantize once per M-tile into VMEM scratch) matches
    the separate quantize + qlinear reference."""
    from mixdq_tpu.ops.pallas_qmatmul import qmatmul_fused2
    from mixdq_tpu.ops import qops

    rng = np.random.RandomState(5)
    for (M, K, N) in [(48, 300, 130), (100, 128, 257)]:
        x = rng.randn(M, K).astype(np.float32)
        w_int = rng.randint(-128, 128, (K, N)).astype(np.int8)
        scale_inv = np.float32(9.7)
        zp_s = np.float32(-4.0)
        w_scale = (rng.rand(N).astype(np.float32) + 0.1) * 0.01
        scale = w_scale * (1.0 / scale_inv)
        bias0 = zp_s * w_int.astype(np.int64).sum(0).astype(np.float32)

        got = qmatmul_fused2(jnp.asarray(x), jnp.asarray(w_int),
                             jnp.asarray(scale_inv), jnp.asarray(zp_s),
                             jnp.asarray(scale), jnp.asarray(bias0),
                             bm=32, bn=128, out_dtype=jnp.float32,
                             interpret=True)
        codes = qops.quantize_per_tensor(jnp.asarray(x),
                                         jnp.asarray(scale_inv),
                                         jnp.asarray(zp_s))
        want = qops.qlinear(codes, jnp.asarray(w_int), jnp.asarray(scale),
                            jnp.asarray(bias0), out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0.05, atol=1.0)


@pytest.mark.parametrize("M,K,H,bias", [(64, 128, 256, True),
                                        (100, 320, 640, False)])
def test_geglu_qmatmul_matches_unfused(M, K, H, bias):
    """Fused GEGLU kernel == qlinear + split + gelu + quantize chain."""
    import jax

    from mixdq_tpu.ops.pallas_qmatmul import geglu_qmatmul
    from mixdq_tpu.ops.qops import qlinear, quantize_per_tensor

    rng = np.random.RandomState(2)
    x = rng.randint(-128, 128, (M, K)).astype(np.int8)
    w = rng.randint(-128, 128, (K, 2 * H)).astype(np.int8)
    scale = (rng.rand(2 * H).astype(np.float32) + 0.1) * 1e-4
    zp_s = np.float32(-7.0)
    bias0 = zp_s * w.astype(np.int64).sum(0).astype(np.float32)
    b = rng.randn(2 * H).astype(np.float32) * 0.01 if bias else None
    out_si = jnp.float32(37.0)
    out_zp = jnp.float32(3.0)

    got = geglu_qmatmul(jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
                        jnp.asarray(bias0), out_si, out_zp,
                        bias=None if b is None else jnp.asarray(b),
                        bm=32, bn=128, gelu_tanh=True, interpret=True)

    y = qlinear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
                jnp.asarray(bias0),
                bias=None if b is None else jnp.asarray(b),
                out_dtype=jnp.float32)
    v, g = jnp.split(y, 2, axis=-1)
    ref = v * jax.nn.gelu(g, approximate=True)
    want = quantize_per_tensor(ref, out_si, out_zp)
    # f32-exact epilogues; allow off-by-one codes at round boundaries
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert (diff <= 1).all() and (diff == 0).mean() > 0.99, diff.max()


@pytest.mark.parametrize("M,K,H,C,bias", [(64, 128, 256, 128, True),
                                          (100, 320, 640, 256, False),
                                          (256, 256, 1024, 256, True)])
def test_geglu_out_qmatmul_matches_chain(M, K, H, C, bias):
    """Whole-FF kernel == geglu kernel -> qlinear(ff.net.2) + bias +
    residual chain (identical codes feed the same integer epilogue)."""
    import jax

    from mixdq_tpu.ops.pallas_qmatmul import (geglu_out_ok,
                                              geglu_out_qmatmul,
                                              geglu_qmatmul)
    from mixdq_tpu.ops.qops import qlinear

    rng = np.random.RandomState(4)
    x = rng.randint(-128, 128, (M, K)).astype(np.int8)
    w = rng.randint(-128, 128, (K, 2 * H)).astype(np.int8)
    scale = (rng.rand(2 * H).astype(np.float32) + 0.1) * 1e-4
    zp_s = np.float32(-7.0)
    bias0 = zp_s * w.astype(np.int64).sum(0).astype(np.float32)
    b = rng.randn(2 * H).astype(np.float32) * 0.01 if bias else None
    w2 = rng.randint(-128, 128, (H, C)).astype(np.int8)
    s2 = (rng.rand(C).astype(np.float32) + 0.1) * 1e-4
    zp2 = np.float32(5.0)
    b02 = zp2 * w2.astype(np.int64).sum(0).astype(np.float32)
    b2 = rng.randn(C).astype(np.float32) * 0.01
    res = rng.randn(M, C).astype(np.float32)
    out_si = jnp.float32(37.0)
    out_zp = jnp.float32(zp2 - 128.0)

    assert geglu_out_ok(M, K, H, C)
    got = geglu_out_qmatmul(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
        jnp.asarray(bias0), out_si, out_zp, jnp.asarray(w2),
        jnp.asarray(s2), jnp.asarray(b02),
        bias=None if b is None else jnp.asarray(b),
        out_bias=jnp.asarray(b2), residual=jnp.asarray(res),
        gelu_tanh=True, out_dtype=jnp.float32, interpret=True)

    codes = geglu_qmatmul(jnp.asarray(x), jnp.asarray(w),
                          jnp.asarray(scale), jnp.asarray(bias0), out_si,
                          out_zp, bias=None if b is None else jnp.asarray(b),
                          gelu_tanh=True, interpret=True)
    want = (qlinear(codes, jnp.asarray(w2), jnp.asarray(s2),
                    jnp.asarray(b02), bias=jnp.asarray(b2),
                    out_dtype=jnp.float32) + jnp.asarray(res))
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    # the two kernels may pick different block tilings, so the codes can
    # differ by 1 at round boundaries; bound the relative output error
    assert got.shape == (M, C)
    denom = np.abs(want) + 1e-2
    assert (np.abs(got - want) / denom).max() < 0.05


def test_geglu_out_in_model(monkeypatch):
    """Transformer2DModel: the whole-FF kernel must be in the traced
    int8_sec graph and the output must match the plain int8 path."""
    import jax

    from mixdq_tpu.models.attention import Transformer2DModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

    model = Transformer2DModel(in_channels=128, heads=2, head_dim=64,
                               num_layers=1, cross_attention_dim=64,
                               norm_num_groups=16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 128))
    ehs = jax.random.normal(jax.random.PRNGKey(4), (1, 77, 64))
    variables = model.init(jax.random.PRNGKey(0), x, ehs)
    names = quantizable_layers(variables["params"])
    wq = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    aq = QuantSpec(running_stat=True)
    qparams = cal.calibrate(model, variables, [(x, ehs)], wq, aq)
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
    ctx = deploy_unet_ctx(model, variables, qparams, ctrl, wq, aq,
                          bos_aware=False, fuse_qkv=True)
    pruned = deployed_params(variables, ctx)
    run = jax.jit(lambda v, c, *a: model.apply(v, *a, c))
    out_int8 = np.asarray(run(pruned, ctx, x, ehs))

    monkeypatch.setenv("MIXDQ_PALLAS_INTERPRET", "1")
    # whole-FF site on (shipped default is attn2-only — measured-best,
    # bench_logs/r4_secab.txt; this test covers the kernel itself)
    monkeypatch.setenv("MIXDQ_SEC_OUTFUSE", "ff")
    sctx = ctx.replace(deploy_compute="int8_sec", attn_impl="auto")
    jaxpr = repr(jax.make_jaxpr(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, sctx, x, ehs))
    assert "geglu_lnout_qmatmul" in jaxpr
    out_sec = np.asarray(run(pruned, sctx, x, ehs))
    assert np.isfinite(out_sec).all()
    assert np.max(np.abs(out_sec - out_int8)) < 0.3


def test_geglu_fusable_gating():
    from mixdq_tpu.models.layers import geglu_fusable
    from mixdq_tpu.quant.deploy import DeployEntry
    from mixdq_tpu.quant.state import QuantCtx

    dp = DeployEntry(kind="linear", w_int=jnp.zeros((4, 4), jnp.int8),
                     scale_inv=jnp.float32(1.0))
    ctx = QuantCtx(mode="int8", deploy={"x": dp})
    ctx = ctx.replace(deploy_compute="int8_sec")
    import os
    os.environ["MIXDQ_PALLAS_INTERPRET"] = "1"
    try:
        assert geglu_fusable(ctx, dp, dp)
        assert not geglu_fusable(ctx, dp, dp.replace(act_off=True))
        assert not geglu_fusable(ctx, None, dp)
        assert not geglu_fusable(ctx.replace(deploy_compute="int8"), dp, dp)
    finally:
        del os.environ["MIXDQ_PALLAS_INTERPRET"]
