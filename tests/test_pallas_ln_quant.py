"""Fused LayerNorm+quantize kernel vs the XLA chain it replaces
(flax LayerNorm -> qops.quantize_per_tensor)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mixdq_tpu.ops import qops
from mixdq_tpu.ops.pallas_ln_quant import ln_quantize


def _reference(x, gamma, beta, scale_inv, zp, eps):
    ln = nn.LayerNorm(epsilon=eps, use_scale=True, use_bias=True)
    y = ln.apply({"params": {"scale": gamma, "bias": beta}},
                 x.astype(jnp.float32))
    return qops.quantize_per_tensor(y, scale_inv, zp)


@pytest.mark.parametrize(
    "B,T,C",
    [
        (1, 64, 128),
        (2, 96, 320),   # T not a multiple of 64
        (1, 256, 640),
    ],
)
def test_ln_quantize_matches_xla_chain(B, T, C):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C) * 2.0, jnp.float32)
    gamma = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(C) * 0.2, jnp.float32)
    scale_inv = jnp.float32(31.0)
    zp = jnp.float32(-7.0)

    want = np.asarray(_reference(x, gamma, beta, scale_inv, zp, 1e-5),
                      np.int32)
    got = np.asarray(
        ln_quantize(x, gamma, beta, scale_inv, zp, eps=1e-5,
                    interpret=True), np.int32)
    diff = np.abs(got - want)
    assert (diff <= 1).all(), f"max code diff {diff.max()}"
    assert (diff > 0).mean() < 0.02, f"{(diff > 0).mean():.4f} codes differ"


def test_ln_quantize_bf16_blocked():
    """bf16 input + row blocking (multiple row-blocks per batch)."""
    rng = np.random.RandomState(1)
    B, T, C = 2, 1024, 64
    x = jnp.asarray(rng.randn(B, T, C), jnp.bfloat16)
    gamma = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    scale_inv = jnp.float32(21.0)
    zp = jnp.float32(2.0)
    want = np.asarray(_reference(x, gamma, beta, scale_inv, zp, 1e-5),
                      np.int32)
    got = np.asarray(
        ln_quantize(x, gamma, beta, scale_inv, zp, interpret=True,
                    block_rows=128), np.int32)
    diff = np.abs(got - want)
    assert (diff <= 1).all()
    assert (diff > 0).mean() < 0.03
