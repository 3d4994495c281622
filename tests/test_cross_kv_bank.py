"""Hoisted cross-attn k/v bank (deploy.precompute_cross_kv) parity.

The bank collapses every ``*.attn2.to_kv`` fused projection into
level-batched int8 einsums at the UNet top. These tests assert the bank
path is numerically identical to the per-layer ``deploy_linear`` + BoS
path it replaces (same codes, same int32 accumulation, same epilogue,
same first-token protection — models/attention.py vs
quant/deploy.py:precompute_cross_kv)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixdq_tpu.models.configs import TINY_SDXL_UNET
from mixdq_tpu.models.unet import UNet2DConditionModel, conv_shortcut_splits
from mixdq_tpu.quant import calibrate as cal
from mixdq_tpu.quant.core import QuantSpec
from mixdq_tpu.quant.deploy import (deploy_unet_ctx, deployed_params,
                                    precompute_cross_kv)
from mixdq_tpu.quant.state import quantizable_layers, uniform_ctrl

pytestmark = pytest.mark.slow  # builds + calibrates a tiny UNet (~1 min CPU)


def _deploy_setup(bos_aware, pack_w4=False, w_bits=8):
    cfg = TINY_SDXL_UNET
    unet = UNet2DConditionModel(cfg)
    B = 1
    k = jax.random.PRNGKey(0)
    sample = jax.random.normal(k, (B, cfg.sample_size, cfg.sample_size, 4))
    t = jnp.array(999.0)
    ehs = jax.random.normal(jax.random.PRNGKey(1),
                            (B, 77, cfg.cross_attention_dim))
    added = {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))}
    variables = jax.jit(unet.init)(k, sample, t, ehs, added)
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    splits = conv_shortcut_splits(cfg)
    qparams = cal.calibrate(unet, variables, [(sample, t, ehs, added)],
                            WQ, AQ, splits=splits)
    names = quantizable_layers(variables["params"])
    ctrl = uniform_ctrl(names, w_bits=w_bits, a_bits=8)
    ctx = deploy_unet_ctx(unet, variables, qparams, ctrl, WQ, AQ,
                          splits=splits, bos_aware=bos_aware,
                          fuse_qkv=True, pack_w4=pack_w4)
    ctx = ctx.replace(deploy_compute="int8")
    qp = deployed_params(variables, ctx)
    return unet, qp, ctx, (sample, t, ehs, added)


def _forward_both(unet, qp, ctx, inputs):
    """One forward with the bank enabled and one with it disabled."""
    fwd = jax.jit(lambda c: unet.apply(qp, *inputs, ctx=c))
    old = os.environ.get("MIXDQ_CROSS_KV")
    try:
        os.environ["MIXDQ_CROSS_KV"] = "1"
        y_bank = np.asarray(jax.jit(
            lambda c: unet.apply(qp, *inputs, ctx=c))(ctx))
        os.environ["MIXDQ_CROSS_KV"] = "0"
        y_ref = np.asarray(fwd(ctx))
    finally:
        if old is None:
            os.environ.pop("MIXDQ_CROSS_KV", None)
        else:
            os.environ["MIXDQ_CROSS_KV"] = old
    return y_bank, y_ref


@pytest.mark.parametrize("bos_aware", [False, True])
def test_bank_matches_per_layer_path(bos_aware):
    unet, qp, ctx, inputs = _deploy_setup(bos_aware)
    _, _, ehs, _ = inputs
    os.environ["MIXDQ_CROSS_KV"] = "1"
    try:
        bank = precompute_cross_kv(ehs, ctx, jnp.float32)
    finally:
        os.environ.pop("MIXDQ_CROSS_KV", None)
    kv_names = [n for n in ctx.deploy if n.endswith(".attn2.to_kv")]
    assert kv_names, "tiny-sdxl deploy must produce fused to_kv entries"
    assert bank is not None and sorted(bank) == sorted(kv_names)
    for n in kv_names:
        e = ctx.deploy[n]
        assert bank[n].shape == (ehs.shape[0], 77, e.w_int.shape[1])
    y_bank, y_ref = _forward_both(unet, qp, ctx, inputs)
    np.testing.assert_allclose(y_bank, y_ref, rtol=0, atol=0)


def test_bank_matches_per_layer_path_packed_w4():
    unet, qp, ctx, inputs = _deploy_setup(bos_aware=True, pack_w4=True,
                                          w_bits=4)
    _, _, ehs, _ = inputs
    os.environ["MIXDQ_CROSS_KV"] = "1"
    try:
        bank = precompute_cross_kv(ehs, ctx, jnp.float32)
    finally:
        os.environ.pop("MIXDQ_CROSS_KV", None)
    assert bank is not None and bank
    y_bank, y_ref = _forward_both(unet, qp, ctx, inputs)
    np.testing.assert_allclose(y_bank, y_ref, rtol=0, atol=0)


def test_bank_disabled_paths():
    """The bank must bail (return None) outside its domain — and is
    OFF by default (measured neutral-to-negative, r5_bank_ab.txt)."""
    unet, qp, ctx, inputs = _deploy_setup(bos_aware=False)
    _, _, ehs, _ = inputs
    assert precompute_cross_kv(ehs, ctx, jnp.float32) is None  # default off
    os.environ["MIXDQ_CROSS_KV"] = "1"
    try:
        assert precompute_cross_kv(ehs, ctx.replace(mode="fake"),
                                   jnp.float32) is None
        assert precompute_cross_kv(
            ehs, ctx.replace(deploy_compute="dequant"), jnp.float32) is None
        assert precompute_cross_kv(
            ehs, ctx.replace(dequant_small_m=256), jnp.float32) is None
        assert precompute_cross_kv(ehs, ctx, jnp.float32) is not None
    finally:
        os.environ.pop("MIXDQ_CROSS_KV", None)


def test_temb_linear_bank_matches_per_layer_path():
    """time_emb_proj bank (precompute_linear_bank) forward parity."""
    unet, qp, ctx, inputs = _deploy_setup(bos_aware=False)
    from mixdq_tpu.quant.deploy import precompute_linear_bank

    # direct bank check on a representative [B, K] input
    temb = jax.random.normal(jax.random.PRNGKey(7), (2, 128))
    names = [n for n in ctx.deploy if n.endswith(".time_emb_proj")]
    # tiny-sdxl time_embed_dim: match the real projection input width
    k_dim = ctx.deploy[names[0]].w_int.shape[0]
    temb = jax.random.normal(jax.random.PRNGKey(7), (2, k_dim))
    bank = precompute_linear_bank(temb, ctx, jnp.float32)
    assert bank is not None and sorted(bank) == sorted(names)
    from mixdq_tpu.models.layers import deploy_linear

    for n in names:
        ref = deploy_linear(temb, ctx.deploy[n], "int8", jnp.float32)
        np.testing.assert_allclose(np.asarray(bank[n]), np.asarray(ref),
                                   rtol=0, atol=0)

    # end-to-end: full forward with both banks on vs off
    old = os.environ.get("MIXDQ_LINEAR_BANK")
    try:
        os.environ["MIXDQ_LINEAR_BANK"] = "1"
        y_bank = np.asarray(jax.jit(
            lambda c: unet.apply(qp, *inputs, ctx=c))(ctx))
        os.environ["MIXDQ_LINEAR_BANK"] = "0"
        y_ref = np.asarray(jax.jit(
            lambda c: unet.apply(qp, *inputs, ctx=c))(ctx))
    finally:
        if old is None:
            os.environ.pop("MIXDQ_LINEAR_BANK", None)
        else:
            os.environ["MIXDQ_LINEAR_BANK"] = old
    np.testing.assert_allclose(y_bank, y_ref, rtol=0, atol=0)
