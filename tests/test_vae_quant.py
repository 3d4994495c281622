"""Int8 VAE decoder quantization (quant.vae_quant) — beyond-parity TPU
surface: the reference keeps the VAE fp16 (quantize_sdxl.py:31-37)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixdq_tpu.models.configs import TINY_VAE
from mixdq_tpu.models.vae import AutoencoderKL
from mixdq_tpu.quant.state import QuantCtx
from mixdq_tpu.quant.vae_quant import quantize_vae_decoder
from mixdq_tpu.utils.metrics import sqnr


@pytest.fixture(scope="module")
def vae_setup():
    vae = AutoencoderKL(TINY_VAE)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4)) * 0.2
    variables = jax.jit(lambda k, x: vae.init(k, x))(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    return vae, variables, z


def test_vae_fp_unchanged_by_quant_layers(vae_setup):
    """QConv/QDense with the default FP ctx behave as plain layers: the
    decode output is deterministic and finite; param tree keeps the
    nn.Conv-compatible names."""
    vae, variables, z = vae_setup
    img = jax.jit(lambda v, z: vae.apply(v, z, method="decode"))(variables, z)
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    dec = variables["params"]["decoder"]
    assert "kernel" in dec["conv_in"] and "bias" in dec["conv_in"]
    assert "kernel" in dec["mid_block"]["attentions_0"]["to_q"]


def test_quantize_vae_decoder_int8(vae_setup):
    vae, variables, z = vae_setup
    fp = np.asarray(jax.jit(
        lambda v, z: vae.apply(v, z, method="decode"))(variables, z),
        np.float32)

    pruned, ctx = quantize_vae_decoder(vae, variables, [z],
                                       deploy_compute="int8")
    # decoder conv kernels pruned from the deployed tree (static memory)
    assert "kernel" not in pruned["params"]["decoder"]["conv_in"]
    q = np.asarray(jax.jit(
        lambda v, c, z: vae.apply(v, z, c, method="decode"))(
        pruned, ctx, z), np.float32)
    assert np.isfinite(q).all()
    s = float(sqnr(jnp.asarray(fp), jnp.asarray(q)))
    assert s > 15.0, f"int8 VAE decode SQNR {s:.1f} dB too low"


def test_vae_int8_sec_matches_int8(vae_setup, monkeypatch):
    """int8_sec (pallas interpret) == int8 within quant-step drift."""
    vae, variables, z = vae_setup
    pruned, ctx = quantize_vae_decoder(vae, variables, [z],
                                       deploy_compute="int8")
    run = jax.jit(lambda v, c, z: vae.apply(v, z, c, method="decode"))
    out_int8 = np.asarray(run(pruned, ctx, z), np.float32)
    monkeypatch.setenv("MIXDQ_PALLAS_INTERPRET", "1")
    out_sec = np.asarray(run(pruned, ctx.replace(deploy_compute="int8_sec"),
                             z), np.float32)
    np.testing.assert_allclose(out_sec, out_int8, atol=0.05)


@pytest.mark.slow
def test_pipeline_decode_takes_vae_ctx(vae_setup):
    """Text2ImgPipeline decode accepts a quantized-VAE ctx."""
    from mixdq_tpu.pipelines.txt2img import Text2ImgPipeline

    pipe = Text2ImgPipeline("tiny-sdxl")
    params = pipe.init_params(jax.random.PRNGKey(0))
    vae_vars = {"params": params["vae"]}
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 4)) * 0.2
    pruned, vctx = quantize_vae_decoder(pipe.vae, vae_vars, [z],
                                        deploy_compute="int8")
    params_q = dict(params, vae=pruned["params"])
    img_fp = pipe._decode_jit(params, z)
    img_q = pipe._decode_jit(params_q, z, vctx)
    assert img_q.shape == img_fp.shape
    assert np.isfinite(np.asarray(img_q)).all()


def test_conv_fits_vmem_gate():
    from mixdq_tpu.ops.pallas_qconv import conv_fits_vmem

    assert conv_fits_vmem(64, 64, 1280, 1280)    # SDXL levels all fit
    assert conv_fits_vmem(128, 128, 512, 512)    # VAE 128x128 (bc ladder)
    # VAE 512x512 levels fit via the strip plan (r5; they were XLA
    # fallbacks before — 10 TOP/s integer convs, DESIGN_NOTES r5)
    assert conv_fits_vmem(512, 512, 128, 128)
    assert conv_fits_vmem(512, 512, 256, 128)
    # un-plannable: min-height strips of a very wide image with a C that
    # has no lane-aligned divisor still blow the budget
    assert not conv_fits_vmem(512, 2048, 936, 128)


def test_fit_config_bounds_block_set():
    """Every config the search returns must fit the soft budget — the
    r4 silent bp=8 fallback shipped a scoped-VMEM OOM at VAE decode
    shapes (bench_logs/r4_serve_sd15_qvae.err: 17.27M > 16M at
    [4,128,128,512]x512). Sweep UNet + VAE shapes at both resolutions."""
    from mixdq_tpu.ops.pallas_qconv import (_VMEM_BUDGET, _TUNED,
                                            _block_vmem, _fit_config,
                                            _round_up)

    shapes = [
        # (H, W, C, K): SDXL 512px + 1024px levels, SD1.5, VAE decode
        (64, 64, 320, 320), (32, 32, 640, 640), (16, 16, 1280, 1280),
        (16, 16, 2560, 1280), (32, 32, 1920, 640), (64, 64, 960, 320),
        (128, 128, 320, 320), (64, 64, 640, 640), (32, 32, 1280, 1280),
        (128, 128, 960, 320), (64, 64, 1920, 640),
        (64, 64, 512, 512), (128, 128, 512, 512),   # VAE decode
        (256, 256, 512, 512), (256, 256, 256, 256),
        (512, 512, 256, 128), (512, 512, 128, 128),
    ]
    for H, W, C, K in shapes:
        Hp, Wpad = H + 2, W + 2
        Wp = _round_up(Wpad, 8)
        P = Q = H
        cfg = _fit_config(3, 3, H, P, Q, Wp, Hp * Wp, C, K, True)
        if cfg is None:
            continue  # caller falls back to XLA s8 conv — safe
        bp, bk, bc = cfg
        if (3, 3, H, C, K) in _TUNED:
            continue  # measured-in-model entries bypass the estimate
        assert _block_vmem(bp, bk, bc, Q, Wp, Hp * Wp, 3, 3, C // bc,
                           True) <= _VMEM_BUDGET, (H, W, C, K, cfg)


def test_oversized_conv_raises_without_gate():
    """qconv2d_pallas refuses un-fittable shapes loudly instead of
    emitting a kernel that overflows the Mosaic VMEM stack."""
    import jax.numpy as jnp
    import pytest

    from mixdq_tpu.ops.pallas_qconv import qconv2d_pallas

    x = jnp.zeros((1, 512, 2048, 936), jnp.int8)
    w = jnp.zeros((3, 3, 936, 128), jnp.int8)
    s = jnp.ones((128,), jnp.float32)
    b0 = jnp.zeros((128,), jnp.float32)
    with pytest.raises(ValueError, match="conv_fits_vmem"):
        qconv2d_pallas(x, w, s, b0, jnp.asarray(0, jnp.int8),
                       interpret=True)


def test_small_k_conv_plans_under_padded_budget():
    """Mosaic lane-pads blocks to 128 lanes: a K=3 conv's int32
    acc + dot-transient stack is 42x its logical size. The r5 VAE
    serving OOM (bench_logs/r5_serve_sd15_qvae.err: 16.38M > 16M at
    decoder/conv_out, 512x512x128->3, B=4) came from budgeting logical
    bytes. The planner must now model tile padding and land on a
    compiling config for every small-K decoder/encoder conv."""
    from mixdq_tpu.ops import pallas_qconv as pq

    for (H, W, C, K) in [(512, 512, 128, 3),   # VAE decoder conv_out
                         (512, 512, 3, 128),   # VAE encoder conv_in
                         (64, 64, 320, 4),     # UNet conv_out
                         (64, 64, 4, 320)]:    # UNet conv_in
        Hc, Wc, Cc, kh, kw, ph, pw = pq._conv_geometry(H, W, C, 3, 3)
        Hp = Hc + 2 * ph
        Wp = pq._round_up(Wc + 2 * pw, 8)
        P, Q = Hc + 2 * ph - kh + 1, Wc + 2 * pw - kw + 1
        plan = pq._plan_conv(kh, kw, Hc, P, Q, Wp, Hp, Cc, K, False)
        assert plan is not None, (H, W, C, K)
        ns, (bp, bk, bc) = plan
        Pe = P // ns
        Hpe = Pe + kh - 1 if ns > 1 else Hp
        v = pq._block_vmem(bp, bk, bc, Q, Wp, Hpe * Wp, kh, kw,
                           Cc // bc, False)
        assert v <= pq._VMEM_BUDGET, (H, W, C, K, plan, v)
