"""UNet structural + forward tests.

The heavyweight parity check uses ``jax.eval_shape`` (no allocation) to
init the *full-size* SDXL-Turbo UNet and compares its quantizable-layer
name space against the reference's architecture dump
(fixtures_sdxl_turbo_layers.txt, extracted from
UNet2DConditionModel_SDXL_Turbo.txt)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mixdq_tpu.models.configs import (SDXL_TURBO_UNET, TINY_SD15_UNET,
                                      TINY_SDXL_UNET)
from mixdq_tpu.models.unet import UNet2DConditionModel, conv_shortcut_splits
from mixdq_tpu.quant.state import QuantCtx, quantizable_layers
import pytest  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures_sdxl_turbo_layers.txt")


def tiny_sdxl_inputs(B=1):
    cfg = TINY_SDXL_UNET
    sample = jnp.zeros((B, cfg.sample_size, cfg.sample_size, 4))
    t = jnp.array(999.0)
    ehs = jnp.zeros((B, 77, cfg.cross_attention_dim))
    added = {
        "text_embeds": jnp.zeros((B, 64)),
        "time_ids": jnp.zeros((B, 6)),
    }
    return sample, t, ehs, added


@pytest.mark.slow
def test_tiny_sdxl_forward_shape():
    model = UNet2DConditionModel(TINY_SDXL_UNET)
    sample, t, ehs, added = tiny_sdxl_inputs()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, t, ehs, added)
    out = jax.jit(model.apply)(params, sample, t, ehs, added)
    assert out.shape == sample.shape
    assert not np.isnan(np.asarray(out)).any()


@pytest.mark.slow
def test_tiny_sd15_forward_shape():
    cfg = TINY_SD15_UNET
    model = UNet2DConditionModel(cfg)
    sample = jnp.zeros((2, cfg.sample_size, cfg.sample_size, 4))
    t = jnp.array([999.0, 500.0])
    ehs = jnp.zeros((2, 77, cfg.cross_attention_dim))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, t, ehs, None)
    out = jax.jit(model.apply)(params, sample, t, ehs, None)
    assert out.shape == sample.shape


@pytest.mark.slow
def test_sdxl_turbo_layer_names_match_reference():
    """Full-size SDXL UNet layer-name space == reference dump (794 layers)."""
    model = UNet2DConditionModel(SDXL_TURBO_UNET)
    cfg = SDXL_TURBO_UNET
    sample = jax.ShapeDtypeStruct((1, 64, 64, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    ehs = jax.ShapeDtypeStruct((1, 77, cfg.cross_attention_dim), jnp.float32)
    added = {
        "text_embeds": jax.ShapeDtypeStruct((1, 1280), jnp.float32),
        "time_ids": jax.ShapeDtypeStruct((1, 6), jnp.float32),
    }
    variables = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), sample, t, ehs, added)
    ours = set(quantizable_layers(variables["params"]).keys())

    with open(FIXTURE) as f:
        ref = {line.strip() for line in f if line.strip()}
    missing = ref - ours
    extra = ours - ref
    assert not missing, f"missing {len(missing)} layers, e.g. {sorted(missing)[:10]}"
    assert not extra, f"extra {len(extra)} layers, e.g. {sorted(extra)[:10]}"


def test_conv_shortcut_splits_match_reference_table():
    """kernels/quantize.py:61 hard-codes
    _SPLIT=[1280,1280,1280,1280,640,640,640,320,320] for SDXL."""
    splits = conv_shortcut_splits(SDXL_TURBO_UNET)
    ordered = [splits[f"up_blocks.{i}.resnets.{j}.conv_shortcut"]
               for i in range(3) for j in range(3)]
    assert ordered == [1280, 1280, 1280, 1280, 640, 640, 640, 320, 320]


@pytest.mark.slow
def test_stats_collection_sows_minmax():
    model = UNet2DConditionModel(TINY_SDXL_UNET)
    sample, t, ehs, added = tiny_sdxl_inputs()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, t, ehs, added)
    ctx = QuantCtx(collect_stats=True)
    out, state = jax.jit(
        lambda p, s, t_, e, a: model.apply(p, s, t_, e, a, ctx,
                                           mutable=["quant_stats"])
    )(params, sample, t, ehs, added)
    stats = state["quant_stats"]
    # every quantizable layer must have sown one (min, max) tuple
    n_layers = len(quantizable_layers(params["params"]))
    flat = jax.tree_util.tree_leaves(stats)
    assert len(flat) >= n_layers  # (min,max) pairs flatten to 2 leaves each
