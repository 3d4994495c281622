"""sec_attention (fused whole-attention + to_out quantize) vs the XLA
einsum-chain reference, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixdq_tpu.ops.pallas_sec_attention import sec_attention, sec_attention_ok


def einsum_ref(q, k, v, scale, scale_inv, zp):
    """The Attention einsum chain + quantize_per_tensor, heads layout
    [B, T, h*d]."""
    B, Tq, hd = q.shape
    Tk = k.shape[1]
    d = 64
    h = hd // d
    qh = q.reshape(B, Tq, h, d).transpose(0, 2, 1, 3).astype(jnp.float32)
    kh = k.reshape(B, Tk, h, d).transpose(0, 2, 1, 3).astype(jnp.float32)
    vh = v.reshape(B, Tk, h, d).transpose(0, 2, 1, 3).astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Tq, hd)
    codes = jnp.round(out * scale_inv) + zp
    return jnp.clip(codes, -128.0, 127.0).astype(jnp.int8)


@pytest.mark.parametrize("Tq,Tk", [(64, 64), (256, 77)])
def test_sec_attention_matches_einsum(Tq, Tk):
    h, d = 4, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, Tq, h * d), jnp.float32)
    k = jax.random.normal(kk, (2, Tk, h * d), jnp.float32)
    v = jax.random.normal(kv, (2, Tk, h * d), jnp.float32)
    scale = d ** -0.5
    si = jnp.asarray(37.0)
    zp = jnp.asarray(-3.0)

    got = sec_attention(q, k, v, si, zp, heads=h, head_dim=d, scale=scale,
                        interpret=True)
    want = einsum_ref(q, k, v, scale, si, zp)
    # f32 in-kernel softmax vs XLA chain: codes within 1 step
    assert got.shape == want.shape == (2, Tq, h * d)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_sec_attention_lane_offsets():
    """q/k/v packed in one fused-projection output tensor, read via
    lane offsets — must match the unpacked call."""
    h, d = 2, 64
    inner = h * d
    Tq = 32
    key = jax.random.PRNGKey(1)
    y = jax.random.normal(key, (1, Tq, 3 * inner), jnp.float32)
    si = jnp.asarray(21.0)
    zp = jnp.asarray(5.0)
    scale = d ** -0.5

    fused = sec_attention(y, y, y, si, zp, heads=h, head_dim=d, scale=scale,
                          q_off=0, k_off=inner, v_off=2 * inner,
                          interpret=True)
    q, k, v = jnp.split(y, 3, axis=-1)
    plain = sec_attention(q, k, v, si, zp, heads=h, head_dim=d, scale=scale,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(plain))


def test_sec_attention_in_model_int8_sec(monkeypatch):
    """Transformer2DModel e2e: int8_sec (interpret pallas, fused
    whole-attention + producer LN fusion) vs the plain int8 path."""
    from mixdq_tpu.models.attention import Transformer2DModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.deploy import deploy_unet_ctx, deployed_params
    from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

    model = Transformer2DModel(in_channels=64, heads=2, head_dim=64,
                               num_layers=1, cross_attention_dim=64,
                               norm_num_groups=16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 64))
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
    sctx = ctx.replace(deploy_compute="int8_sec", attn_impl="auto")
    # the sec-attention kernel must actually be in the traced graph
    # (head_dim=64, heads=2 passes the lane-pack gate)
    jaxpr = jax.make_jaxpr(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, sctx, x, ehs)
    assert "sec_attention" in repr(jaxpr)
    out_sec = np.asarray(run(pruned, sctx, x, ehs))
    # f32 in-kernel softmax vs the XLA einsum chain: act codes move by
    # <= 1 step; downstream effect stays within a few quant steps
    assert np.isfinite(out_sec).all()
    assert np.max(np.abs(out_sec - out_int8)) < 0.3


def test_sec_attention_gate():
    assert sec_attention_ok(10, 64, 1024, 1024)
    assert sec_attention_ok(20, 64, 256, 77, 1280, 2560)
    assert not sec_attention_ok(5, 64, 256, 256)        # odd head pairing
    assert not sec_attention_ok(8, 40, 256, 256)        # 128 % d != 0
    assert not sec_attention_ok(8, 64, 4096, 4096)      # logits > VMEM
    assert not sec_attention_ok(8, 64, 256, 256, 320)   # unaligned offset


def test_sec_attention_qkv_matches_unfused():
    """QKV-fused kernel == int8 qlinear -> bf16 -> sec_attention chain
    (same epilogue math, so codes should be bit-identical)."""
    from mixdq_tpu.ops.pallas_sec_attention import (sec_attention_qkv,
                                                    sec_attention_qkv_ok)
    from mixdq_tpu.ops.qops import qlinear

    rng = np.random.RandomState(0)
    for (T, C, heads) in [(256, 1280, 20), (64, 640, 10)]:
        d = C // heads
        x = jnp.asarray(rng.randint(-127, 128, (1, T, C)), jnp.int8)
        w = jnp.asarray(rng.randint(-127, 128, (C, 3 * C)), jnp.int8)
        sc = jnp.asarray(rng.rand(3 * C) * 1e-3 + 1e-4, jnp.float32)
        b0 = jnp.asarray(rng.randn(3 * C) * 5, jnp.float32)
        osi = jnp.float32(37.0)
        ozp = jnp.float32(3.0)
        assert sec_attention_qkv_ok(heads, d, T, C)
        fused = sec_attention_qkv(x, w, sc, b0, osi, ozp, heads=heads,
                                  head_dim=d, scale=float(d**-0.5),
                                  interpret=True)
        y = qlinear(x, w, sc, b0).astype(jnp.bfloat16)
        ref = sec_attention(y, y, y, osi, ozp, heads=heads, head_dim=d,
                            scale=float(d**-0.5), q_off=0, k_off=C,
                            v_off=2 * C, interpret=True)
        diff = np.abs(np.asarray(fused, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3


def test_sec_attention_qkv_gate():
    from mixdq_tpu.ops.pallas_sec_attention import sec_attention_qkv_ok

    assert sec_attention_qkv_ok(20, 64, 256, 1280)
    assert sec_attention_qkv_ok(10, 64, 1024, 640)
    assert not sec_attention_qkv_ok(2, 64, 64, 64)      # inner != C
    assert not sec_attention_qkv_ok(8, 40, 256, 320)    # 128 % d != 0
    assert not sec_attention_qkv_ok(20, 64, 4096, 1280)  # logits > VMEM


def test_sec_attention_q_matches_unfused():
    """Q-fused cross-attention kernel == int8 qlinear -> sec_attention
    over the k/v panels (same epilogue math: codes bit-identical up to
    the 1-step f32-softmax tie)."""
    from mixdq_tpu.ops.pallas_sec_attention import (sec_attention_q,
                                                    sec_attention_q_ok)
    from mixdq_tpu.ops.qops import qlinear

    rng = np.random.RandomState(1)
    for (Tq, Tk, C_in, heads) in [(256, 77, 1280, 20), (64, 77, 640, 10)]:
        d = C_in // heads
        C = heads * d
        x = jnp.asarray(rng.randint(-127, 128, (1, Tq, C_in)), jnp.int8)
        w = jnp.asarray(rng.randint(-127, 128, (C_in, C)), jnp.int8)
        sc = jnp.asarray(rng.rand(C) * 1e-3 + 1e-4, jnp.float32)
        b0 = jnp.asarray(rng.randn(C) * 5, jnp.float32)
        kv = jnp.asarray(rng.randn(1, Tk, 2 * C), jnp.float32)
        osi = jnp.float32(29.0)
        ozp = jnp.float32(-5.0)
        assert sec_attention_q_ok(heads, d, Tq, Tk, C_in, 0, C)
        fused = sec_attention_q(x, w, sc, b0, kv, kv, osi, ozp, heads=heads,
                                head_dim=d, scale=float(d**-0.5),
                                k_off=0, v_off=C, interpret=True)
        # the kernel keeps q at the k/v dtype (f32 here; bf16 in-model)
        q = qlinear(x, w, sc, b0, out_dtype=jnp.float32)
        ref = sec_attention(q, kv, kv, osi, ozp, heads=heads, head_dim=d,
                            scale=float(d**-0.5), q_off=0, k_off=0,
                            v_off=C, interpret=True)
        diff = np.abs(np.asarray(fused, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3


def test_sec_attention_q_gate():
    from mixdq_tpu.ops.pallas_sec_attention import sec_attention_q_ok

    assert sec_attention_q_ok(20, 64, 256, 77, 1280, 0, 1280)
    assert sec_attention_q_ok(10, 64, 1024, 77, 640, 0, 640)
    assert not sec_attention_q_ok(8, 40, 256, 77, 320)    # 128 % d != 0
    assert not sec_attention_q_ok(10, 64, 250, 77, 640)   # Tq % 8
    assert not sec_attention_q_ok(20, 64, 4096, 512, 1280)  # logits > VMEM
    assert not sec_attention_q_ok(10, 64, 1024, 77, 640, 0, 320)  # offset


def test_sec_attention_q_in_model(monkeypatch):
    """Transformer2DModel: the q-fused cross-attention kernel must be in
    the traced int8_sec graph and match the plain int8 path."""
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
                          bos_aware=True, fuse_qkv=True)
    pruned = deployed_params(variables, ctx)
    run = jax.jit(lambda v, c, *a: model.apply(v, *a, c))
    out_int8 = np.asarray(run(pruned, ctx, x, ehs))

    monkeypatch.setenv("MIXDQ_PALLAS_INTERPRET", "1")
    sctx = ctx.replace(deploy_compute="int8_sec", attn_impl="auto")
    jaxpr = jax.make_jaxpr(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, sctx, x, ehs)
    assert "sec_attention_q" in repr(jaxpr).replace("sec_attention_qkv", "")
    out_sec = np.asarray(run(pruned, sctx, x, ehs))
    assert np.isfinite(out_sec).all()
    assert np.max(np.abs(out_sec - out_int8)) < 0.3


def test_sec_attention_qkv_out_matches_chain():
    """Whole-block self-attn kernel == qkv kernel -> qlinear(to_out) +
    bias + residual chain (identical integer/f32 epilogue math)."""
    from mixdq_tpu.ops.pallas_sec_attention import (
        sec_attention_qkv, sec_attention_qkv_out, sec_attention_qkv_out_ok)
    from mixdq_tpu.ops.qops import qlinear

    rng = np.random.RandomState(2)
    for (T, C, heads, hpp) in [(256, 1280, 20, 0), (64, 640, 10, 0),
                               (64, 640, 10, 1)]:  # hpp=1: multi-panel acc
        d = C // heads
        x = jnp.asarray(rng.randint(-127, 128, (1, T, C)), jnp.int8)
        w = jnp.asarray(rng.randint(-127, 128, (C, 3 * C)), jnp.int8)
        sc = jnp.asarray(rng.rand(3 * C) * 1e-3 + 1e-4, jnp.float32)
        b0 = jnp.asarray(rng.randn(3 * C) * 5, jnp.float32)
        wout = jnp.asarray(rng.randint(-127, 128, (C, C)), jnp.int8)
        so = jnp.asarray(rng.rand(C) * 1e-3 + 1e-4, jnp.float32)
        b0o = jnp.asarray(rng.randn(C) * 5, jnp.float32)
        bo = jnp.asarray(rng.randn(C), jnp.float32)
        res = jnp.asarray(rng.randn(1, T, C), jnp.bfloat16)
        osi = jnp.float32(37.0)
        ozp = jnp.float32(3.0)
        assert sec_attention_qkv_out_ok(heads, d, T, C)
        fused = sec_attention_qkv_out(
            x, w, sc, b0, osi, ozp, wout, so, b0o, bo, res,
            heads=heads, head_dim=d, scale=float(d**-0.5),
            interpret=True, hpp_override=hpp)
        codes = sec_attention_qkv(x, w, sc, b0, osi, ozp, heads=heads,
                                  head_dim=d, scale=float(d**-0.5),
                                  interpret=True)
        ref = (qlinear(codes, wout, so, b0o, bias=bo,
                       out_dtype=jnp.float32)
               + res.astype(jnp.float32)).astype(jnp.bfloat16)
        diff = np.abs(np.asarray(fused, np.float32)
                      - np.asarray(ref, np.float32))
        # the attention codes are identical (shared tail); only the <=1
        # bf16 ulp of the f32->bf16 store may differ
        scale_mag = np.abs(np.asarray(ref, np.float32)) + 1.0
        assert (diff / scale_mag).max() < 1e-2


def test_sec_attention_q_out_matches_chain():
    """Whole-block cross-attn kernel == q kernel -> qlinear(to_out) +
    bias + residual chain."""
    from mixdq_tpu.ops.pallas_sec_attention import (
        sec_attention_q, sec_attention_q_out, sec_attention_q_out_ok)
    from mixdq_tpu.ops.qops import qlinear

    rng = np.random.RandomState(3)
    for (Tq, Tk, C_in, heads, hpp) in [(256, 77, 1280, 20, 0),
                                       (64, 77, 640, 10, 1)]:
        d = C_in // heads
        C = heads * d
        x = jnp.asarray(rng.randint(-127, 128, (1, Tq, C_in)), jnp.int8)
        w = jnp.asarray(rng.randint(-127, 128, (C_in, C)), jnp.int8)
        sc = jnp.asarray(rng.rand(C) * 1e-3 + 1e-4, jnp.float32)
        b0 = jnp.asarray(rng.randn(C) * 5, jnp.float32)
        kv = jnp.asarray(rng.randn(1, Tk, 2 * C), jnp.float32)
        wout = jnp.asarray(rng.randint(-127, 128, (C, C_in)), jnp.int8)
        so = jnp.asarray(rng.rand(C_in) * 1e-3 + 1e-4, jnp.float32)
        b0o = jnp.asarray(rng.randn(C_in) * 5, jnp.float32)
        bo = jnp.asarray(rng.randn(C_in), jnp.float32)
        res = jnp.asarray(rng.randn(1, Tq, C_in), jnp.bfloat16)
        osi = jnp.float32(29.0)
        ozp = jnp.float32(-5.0)
        assert sec_attention_q_out_ok(heads, d, Tq, Tk, C_in, 0, C)
        fused = sec_attention_q_out(
            x, w, sc, b0, kv, kv, osi, ozp, wout, so, b0o, bo, res,
            heads=heads, head_dim=d, scale=float(d**-0.5),
            k_off=0, v_off=C, interpret=True, hpp_override=hpp)
        codes = sec_attention_q(x, w, sc, b0, kv, kv, osi, ozp,
                                heads=heads, head_dim=d,
                                scale=float(d**-0.5), k_off=0, v_off=C,
                                interpret=True)
        ref = (qlinear(codes, wout, so, b0o, bias=bo,
                       out_dtype=jnp.float32)
               + res.astype(jnp.float32)).astype(jnp.bfloat16)
        diff = np.abs(np.asarray(fused, np.float32)
                      - np.asarray(ref, np.float32))
        scale_mag = np.abs(np.asarray(ref, np.float32)) + 1.0
        assert (diff / scale_mag).max() < 1e-2


def test_sec_attention_lnout_matches_chain():
    """LN-folded whole-block kernels == ln_quantize -> whole-block chain
    (identical LN math, so codes — and everything downstream — match)."""
    from mixdq_tpu.ops.pallas_ln_quant import ln_quantize
    from mixdq_tpu.ops.pallas_sec_attention import (sec_attention_q_out,
                                                    sec_attention_qkv_out)

    rng = np.random.RandomState(5)
    T, C, heads = 64, 640, 10
    d = C // heads
    h = jnp.asarray(rng.randn(1, T, C), jnp.float32)
    gamma = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    x_si, x_zp = jnp.float32(17.0), jnp.float32(2.0)
    w = jnp.asarray(rng.randint(-127, 128, (C, 3 * C)), jnp.int8)
    sc = jnp.asarray(rng.rand(3 * C) * 1e-3 + 1e-4, jnp.float32)
    b0 = jnp.asarray(rng.randn(3 * C) * 5, jnp.float32)
    wout = jnp.asarray(rng.randint(-127, 128, (C, C)), jnp.int8)
    so = jnp.asarray(rng.rand(C) * 1e-3 + 1e-4, jnp.float32)
    b0o = jnp.asarray(rng.randn(C) * 5, jnp.float32)
    bo = jnp.asarray(rng.randn(C), jnp.float32)
    osi, ozp = jnp.float32(37.0), jnp.float32(3.0)
    kw = dict(heads=heads, head_dim=d, scale=float(d**-0.5), interpret=True)

    ln_args = (gamma, beta, x_si, x_zp, (-128.0, 127.0), 1e-5)
    fused = sec_attention_qkv_out(h, w, sc, b0, osi, ozp, wout, so, b0o,
                                  bo, None, ln_args=ln_args, **kw)
    codes = ln_quantize(h, gamma, beta, x_si, x_zp, interpret=True)
    ref = sec_attention_qkv_out(codes, w, sc, b0, osi, ozp, wout, so, b0o,
                                bo, h, **kw)
    diff = np.abs(np.asarray(fused, np.float32) - np.asarray(ref, np.float32))
    denom = np.abs(np.asarray(ref, np.float32)) + 1.0
    assert (diff / denom).max() < 1e-2

    # cross-attn variant
    kv = jnp.asarray(rng.randn(1, 77, 2 * C), jnp.float32)
    wq = jnp.asarray(rng.randint(-127, 128, (C, C)), jnp.int8)
    scq = jnp.asarray(rng.rand(C) * 1e-3 + 1e-4, jnp.float32)
    b0q = jnp.asarray(rng.randn(C) * 5, jnp.float32)
    fused = sec_attention_q_out(h, wq, scq, b0q, kv, kv, osi, ozp, wout,
                                so, b0o, bo, None, k_off=0, v_off=C,
                                ln_args=ln_args, **kw)
    ref = sec_attention_q_out(codes, wq, scq, b0q, kv, kv, osi, ozp, wout,
                              so, b0o, bo, h,
                              k_off=0, v_off=C, **kw)
    diff = np.abs(np.asarray(fused, np.float32) - np.asarray(ref, np.float32))
    denom = np.abs(np.asarray(ref, np.float32)) + 1.0
    assert (diff / denom).max() < 1e-2


def test_sec_default_outfuse_graph(monkeypatch):
    """The SHIPPED default (MIXDQ_SEC_OUTFUSE unset = attn2-only,
    bench_logs/r4_secab.txt) puts the cross-attn whole-block kernel in
    the graph while attn1 keeps the split qkv kernel + ln_quantize."""
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
                          bos_aware=True, fuse_qkv=True)
    pruned = deployed_params(variables, ctx)
    monkeypatch.setenv("MIXDQ_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("MIXDQ_SEC_OUTFUSE", raising=False)
    sctx = ctx.replace(deploy_compute="int8_sec", attn_impl="auto")
    jaxpr = repr(jax.make_jaxpr(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, sctx, x, ehs))
    assert "sec_attention_q_lnout" in jaxpr        # attn2 whole-block
    assert "sec_attention_qkv_lnout" not in jaxpr  # attn1 split
    assert "sec_attention_qkv" in jaxpr
    assert "geglu_lnout" not in jaxpr              # ff split
    assert "ln_quantize" in jaxpr                  # standalone producers
    run = jax.jit(lambda v, c, *a: model.apply(v, *a, c))
    out_int8 = np.asarray(run(pruned, ctx, x, ehs))
    out_sec = np.asarray(run(pruned, sctx, x, ehs))
    assert np.isfinite(out_sec).all()
    assert np.max(np.abs(out_sec - out_int8)) < 0.3


def test_sec_attention_whole_block_in_model(monkeypatch):
    """Transformer2DModel e2e: the whole-block kernels (qkv_out self-attn
    + q_out cross-attn, residual add inside) must be in the traced
    int8_sec graph and match the plain int8 path."""
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
                          bos_aware=True, fuse_qkv=True)
    pruned = deployed_params(variables, ctx)
    run = jax.jit(lambda v, c, *a: model.apply(v, *a, c))
    out_int8 = np.asarray(run(pruned, ctx, x, ehs))

    monkeypatch.setenv("MIXDQ_PALLAS_INTERPRET", "1")
    # all whole-block sites on (the shipped default is attn2-only — the
    # measured-best config, bench_logs/r4_secab.txt; this test covers
    # the kernels themselves)
    monkeypatch.setenv("MIXDQ_SEC_OUTFUSE", "1")
    sctx = ctx.replace(deploy_compute="int8_sec", attn_impl="auto")
    jaxpr = repr(jax.make_jaxpr(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, sctx, x, ehs))
    # the block defers its pre-LayerNorms, so the LN-folded whole-block
    # variants are what lands in the graph
    assert "sec_attention_qkv_lnout" in jaxpr
    assert "sec_attention_q_lnout" in jaxpr
    out_sec = np.asarray(run(pruned, sctx, x, ehs))
    assert np.isfinite(out_sec).all()
    assert np.max(np.abs(out_sec - out_int8)) < 0.3


def test_sec_attention_qkv_in_model(monkeypatch):
    """Transformer2DModel with dim == heads*head_dim: the qkv-fused
    whole-attention kernel must be in the traced int8_sec graph and
    match the plain int8 path."""
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
    sctx = ctx.replace(deploy_compute="int8_sec", attn_impl="auto")
    jaxpr = jax.make_jaxpr(lambda v, c, *a: model.apply(v, *a, c))(
        pruned, sctx, x, ehs)
    assert "sec_attention_qkv" in repr(jaxpr)
    out_sec = np.asarray(run(pruned, sctx, x, ehs))
    assert np.isfinite(out_sec).all()
    assert np.max(np.abs(out_sec - out_int8)) < 0.3
