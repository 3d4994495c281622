"""Fused GN+SiLU+quantize kernel vs the XLA chain it replaces
(flax GroupNorm -> silu -> qops.quantize_per_tensor)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mixdq_tpu.ops import qops
from mixdq_tpu.ops.pallas_gn_quant import gn_silu_quantize


def _reference(x, gamma, beta, scale_inv, zp, groups, eps, silu=True):
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps,
                      use_scale=True, use_bias=True)
    y = gn.apply({"params": {"scale": gamma, "bias": beta}},
                 x.astype(jnp.float32))
    if silu:
        y = nn.silu(y)
    return qops.quantize_per_tensor(y, scale_inv, zp)


@pytest.mark.parametrize(
    "B,H,W,C,groups,silu",
    [
        (1, 8, 8, 64, 8, True),
        (2, 4, 4, 96, 32, True),   # group width 3 (not lane aligned)
        (1, 16, 8, 128, 32, False),
    ],
)
def test_gn_silu_quantize_matches_xla_chain(B, H, W, C, groups, silu):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C) * 2.0, jnp.float32)
    gamma = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(C) * 0.2, jnp.float32)
    scale_inv = jnp.float32(37.0)
    zp = jnp.float32(-5.0)

    want = np.asarray(
        _reference(x, gamma, beta, scale_inv, zp, groups, 1e-5, silu),
        np.int32)
    got = np.asarray(
        gn_silu_quantize(x, gamma, beta, scale_inv, zp, groups=groups,
                         eps=1e-5, silu=silu, interpret=True), np.int32)
    # integer codes: allow off-by-one on round-boundary values only
    diff = np.abs(got - want)
    assert (diff <= 1).all(), f"max code diff {diff.max()}"
    assert (diff > 0).mean() < 0.02, f"{(diff > 0).mean():.4f} codes differ"


def test_gn_silu_quantize_bf16_input_blocked():
    """bf16 input + spatial blocking (multiple row-blocks per image)."""
    rng = np.random.RandomState(1)
    B, H, W, C, groups = 1, 32, 32, 64, 16
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    gamma = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    scale_inv = jnp.float32(25.0)
    zp = jnp.float32(3.0)
    want = np.asarray(
        _reference(x, gamma, beta, scale_inv, zp, groups, 1e-5), np.int32)
    got = np.asarray(
        gn_silu_quantize(x, gamma, beta, scale_inv, zp, groups=groups,
                         interpret=True, block_rows=256), np.int32)
    diff = np.abs(got - want)
    assert (diff <= 1).all()
    assert (diff > 0).mean() < 0.03
