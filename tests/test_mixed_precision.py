"""Mixed-precision search tests: metric grouping, MILP allocation
properties, end-to-end sweep on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np

from mixdq_tpu.mixed_precision import ilp, sensitivity
import pytest  # noqa: E402


def test_split_metric_groups():
    names = [
        "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj",
        "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k",
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q",
        "down_blocks.0.resnets.0.conv1",
    ]
    content, quality = sensitivity.split_metric_groups(names)
    assert names[0] in content and names[1] in content
    assert names[2] in quality and names[3] in quality


def test_allocate_bits_respects_budget():
    rng = np.random.RandomState(0)
    layers = [f"l{i}" for i in range(20)]
    # monotone sensitivities: more bits better
    sens = {l: sorted(rng.rand(3).tolist()) for l in layers}
    frac = {l: 1.0 / 20 for l in layers}
    alloc = ilp.allocate_bits(sens, frac, 5.0, bits=(2, 4, 8), tolerance=0.2)
    assert alloc is not None
    avg = sum(alloc[l] for l in layers) / 20
    assert 4.8 - 0.2 <= avg <= 5.0 + 0.2
    # sensitive layers (large gap between low and high bits) should get
    # more bits than insensitive ones on average
    gaps = {l: sens[l][2] - sens[l][0] for l in layers}
    hi = [alloc[l] for l in sorted(layers, key=lambda x: -gaps[x])[:5]]
    lo = [alloc[l] for l in sorted(layers, key=lambda x: gaps[x])[:5]]
    assert np.mean(hi) >= np.mean(lo)


def test_achieved_avg_bits():
    alloc = {"a": 8, "b": 4, "c": 2}
    frac = {"a": 0.5, "b": 0.25, "c": 0.25}
    assert abs(ilp.achieved_avg_bits(alloc, frac) - 5.5) < 1e-9
    # renormalizes over the allocated subset only
    frac2 = {"a": 0.25, "b": 0.125, "c": 0.125, "other": 0.5}
    assert abs(ilp.achieved_avg_bits(alloc, frac2) - 5.5) < 1e-9
    assert ilp.achieved_avg_bits({}, frac) == 0.0


def test_allocate_bits_uniform8_feasible():
    layers = ["a", "b"]
    sens = {l: [0.0, 1.0, 2.0] for l in layers}
    frac = {l: 0.5 for l in layers}
    alloc = ilp.allocate_bits(sens, frac, 8.0, bits=(2, 4, 8))
    assert alloc == {"a": 8, "b": 8}


def test_metric_decoupled_allocation_produces_candidates():
    rng = np.random.RandomState(1)
    sens_c = {f"c{i}": sorted(rng.rand(3).tolist()) for i in range(6)}
    sens_q = {f"q{i}": sorted(rng.rand(2).tolist()) for i in range(6)}
    frac = {**{f"c{i}": 0.08 for i in range(6)},
            **{f"q{i}": 0.0866 for i in range(6)}}
    cands = ilp.metric_decoupled_allocation(
        sens_c, sens_q, frac, 5.0, k_grid=(0.8, 1.0))
    assert len(cands) >= 1
    for cand in cands:
        assert set(cand) == set(list(sens_c) + list(sens_q))
        for l in sens_q:
            assert cand[l] in (4, 8)


@pytest.mark.slow
def test_sweep_sqnr_tiny_model():
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.state import quantizable_layers

    model = UNet2DConditionModel(TINY_SDXL_UNET)
    B = 2
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *b0)
    names = sorted(quantizable_layers(variables["params"]))
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(model, variables, [b0], WQ, AQ)
    fp_out = jax.jit(model.apply)(variables, *b0)

    subset = names[:3]
    sens = sensitivity.sweep_sqnr(model, variables, qparams, subset, names,
                                  b0, fp_out, WQ, AQ, bits=(2, 8))
    assert set(sens) == set(subset)
    for name, (s2, s8) in sens.items():
        assert s8 >= s2, f"{name}: 8-bit SQNR {s8} < 2-bit {s2}"


@pytest.mark.slow
def test_sweep_sqnr_batched_matches_sequential():
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.state import quantizable_layers

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
    fp_out = jax.jit(model.apply)(variables, *b0)

    subset = names[:3]
    seq = sensitivity.sweep_sqnr(model, variables, qparams, subset, names,
                                 b0, fp_out, WQ, AQ, bits=(4, 8))
    bat = sensitivity.sweep_sqnr_batched(model, variables, qparams, subset,
                                         names, b0, fp_out, WQ, AQ,
                                         bits=(4, 8), chunk=4)
    for n in subset:
        np.testing.assert_allclose(bat[n], seq[n], rtol=1e-3, atol=0.2)


@pytest.mark.slow
def test_sweep_ssim_batched_matches_sequential():
    from mixdq_tpu.pipelines.txt2img import Text2ImgPipeline
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.state import quantizable_layers

    pipe = Text2ImgPipeline("tiny-sdxl")
    params = pipe.init_params(jax.random.PRNGKey(0))
    B = 1
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = {"params": params["unet"]}
    names = sorted(quantizable_layers(params["unet"]))
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(pipe.unet, variables, [b0], WQ, AQ)

    content, _ = sensitivity.split_metric_groups(names)
    subset = content[:2]
    prompts = ["a cat"]
    key = jax.random.PRNGKey(3)
    seq = sensitivity.sweep_ssim(pipe, params, qparams, subset, names,
                                 prompts, key, WQ, AQ, bits=(2, 8),
                                 num_steps=1)
    bat = sensitivity.sweep_ssim_batched(pipe, params, qparams, subset,
                                         names, prompts, key, WQ, AQ,
                                         bits=(2, 8), num_steps=1, chunk=3)
    for n in subset:
        # quantized-at-2-bit layers must read as more sensitive than at 8
        assert bat[n][0] <= bat[n][1] + 1e-3
        np.testing.assert_allclose(bat[n], seq[n], atol=5e-3)


@pytest.mark.slow
def test_sweep_sqnr_dp_mesh_matches_single():
    """dp-mesh-sharded batched sweep == single-device batched sweep
    (sweep points are a batch axis; sharding them over dp changes the
    partitioning, not the per-point compute)."""
    from mixdq_tpu.models.configs import TINY_SDXL_UNET
    from mixdq_tpu.models.unet import UNet2DConditionModel
    from mixdq_tpu.parallel.mesh import make_mesh
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.state import quantizable_layers

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")

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
    fp_out = jax.jit(model.apply)(variables, *b0)

    subset = names[:4]
    single = sensitivity.sweep_sqnr_batched(
        model, variables, qparams, subset, names, b0, fp_out, WQ, AQ,
        bits=(4, 8), chunk=8)
    mesh = make_mesh(4, tp=1)
    with mesh:
        sharded = sensitivity.sweep_sqnr_batched(
            model, variables, qparams, subset, names, b0, fp_out, WQ, AQ,
            bits=(4, 8), chunk=8, mesh=mesh)
    for n in subset:
        np.testing.assert_allclose(sharded[n], single[n], rtol=1e-4,
                                   atol=1e-3)


@pytest.mark.slow
def test_sweep_ssim_dp_mesh_matches_single():
    """dp-mesh-sharded SSIM content sweep == single-device batched sweep."""
    from mixdq_tpu.parallel.mesh import make_mesh
    from mixdq_tpu.pipelines.txt2img import Text2ImgPipeline
    from mixdq_tpu.quant import calibrate as cal
    from mixdq_tpu.quant.core import QuantSpec
    from mixdq_tpu.quant.state import quantizable_layers

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")

    pipe = Text2ImgPipeline("tiny-sdxl")
    params = pipe.init_params(jax.random.PRNGKey(0))
    B = 1
    b0 = (jax.random.normal(jax.random.PRNGKey(9), (B, 16, 16, 4)),
          jnp.full((B,), 999.0),
          jax.random.normal(jax.random.PRNGKey(8), (B, 77, 128)),
          {"text_embeds": jnp.ones((B, 64)), "time_ids": jnp.ones((B, 6))})
    variables = {"params": params["unet"]}
    names = sorted(quantizable_layers(params["unet"]))
    WQ = QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    AQ = QuantSpec(running_stat=True)
    qparams = cal.calibrate(pipe.unet, variables, [b0], WQ, AQ)

    content, _ = sensitivity.split_metric_groups(names)
    subset = content[:2]
    prompts = ["a cat"]
    key = jax.random.PRNGKey(3)
    single = sensitivity.sweep_ssim_batched(
        pipe, params, qparams, subset, names, prompts, key, WQ, AQ,
        bits=(2, 8), num_steps=1, chunk=4)
    mesh = make_mesh(4, tp=1)
    with mesh:
        sharded = sensitivity.sweep_ssim_batched(
            pipe, params, qparams, subset, names, prompts, key, WQ, AQ,
            bits=(2, 8), num_steps=1, chunk=4, mesh=mesh)
    for n in subset:
        np.testing.assert_allclose(sharded[n], single[n], atol=1e-4)
