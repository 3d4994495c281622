"""Golden tests for the quant core against independently-written numpy
oracles of the reference formulas (base_quantizer.py:95-262)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixdq_tpu.quant import core


def np_fake_quant(x, delta, zp, n_bits, sym):
    """Oracle: quantize->clamp->dequant per base_quantizer.py:119-128."""
    x_int = np.round(x / delta) + zp
    if sym:
        n_levels = 2 ** (n_bits - 1) - 1
        x_q = np.clip(x_int, -n_levels - 1, n_levels)
    else:
        n_levels = 2**n_bits
        x_q = np.clip(x_int, 0, n_levels - 1)
    return (x_q - zp) * delta


@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("n_bits", [2, 4, 8])
def test_fake_quant_matches_oracle(sym, n_bits):
    rng = np.random.RandomState(0)
    x = rng.randn(64, 32).astype(np.float32) * 3
    x_min = min(x.min(), 0.0)
    x_max = max(x.max(), 0.0)
    delta, zp = core.fit_qparams_minmax(
        jnp.float32(x_min), jnp.float32(x_max), n_bits, sym=sym
    )
    got = core.fake_quant(jnp.asarray(x), delta, zp, n_bits, sym=sym)
    want = np_fake_quant(x, float(delta), float(zp), n_bits, sym)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sym", [True, False])
def test_fit_minmax_formulas(sym):
    """delta/zp exactly as base_quantizer.py:173-190."""
    x_min, x_max = -1.5, 3.0
    n_bits = 8
    delta, zp = core.fit_qparams_minmax(jnp.float32(x_min), jnp.float32(x_max), n_bits, sym=sym)
    if sym:
        n_levels = 2 ** (n_bits - 1) - 1
        assert np.isclose(float(delta), max(abs(x_min), abs(x_max)) / n_levels)
        assert float(zp) == 0.0
    else:
        n_levels = 2**n_bits
        assert np.isclose(float(delta), (x_max - x_min) / (n_levels - 1))
        assert float(zp) == round(-x_min / float(delta))


def test_fit_minmax_always_zero():
    delta, zp = core.fit_qparams_minmax(
        jnp.float32(0.0), jnp.float32(1.0), 8, sym=False, always_zero=True
    )
    assert float(zp) == 0.0


def test_fit_minmax_degenerate_range_eps_floor():
    delta, zp = core.fit_qparams_minmax(jnp.float32(0.0), jnp.float32(0.0), 8)
    assert float(delta) == pytest.approx(core.EPS)


def test_activation_minmax_clamped_to_contain_zero():
    """base_quantizer.py:155-158: x_min<=0, x_max>=0."""
    x = jnp.ones((4, 4)) * 2.0  # all-positive
    mn, mx = core.tensor_minmax(x)
    assert float(mn) == 0.0 and float(mx) == 2.0
    x = -x
    mn, mx = core.tensor_minmax(x)
    assert float(mn) == -2.0 and float(mx) == 0.0


def test_channelwise_minmax():
    x = jnp.stack([jnp.full((3, 3), -1.0), jnp.full((3, 3), 2.0)], axis=-1)  # C last
    mn, mx = core.tensor_minmax(x, channel_axis=-1)
    np.testing.assert_allclose(np.asarray(mn), [-1.0, 0.0])
    np.testing.assert_allclose(np.asarray(mx), [0.0, 2.0])


def test_ema_minmax():
    """Momentum 0.95 EMA (base_quantizer.py:167-171)."""
    mn, mx = core.ema_minmax(jnp.float32(-1.0), jnp.float32(1.0), jnp.float32(-3.0), jnp.float32(2.0))
    assert float(mn) == pytest.approx(-1.0 * 0.95 + -3.0 * 0.05)
    assert float(mx) == pytest.approx(1.0 * 0.95 + 2.0 * 0.05)


def test_round_ste_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(core.round_ste(x) ** 2))(jnp.array([0.3, 1.7]))
    # d/dx sum(round(x)^2) with STE = 2*round(x)
    np.testing.assert_allclose(np.asarray(g), [0.0, 4.0])


def test_fake_quant_is_jittable_with_traced_bits():
    """Bit sweeps must not recompile: n_bits as traced arg."""
    x = jnp.linspace(-1, 1, 32).reshape(4, 8)
    delta = jnp.float32(0.01)
    zp = jnp.float32(0.0)
    f = jax.jit(lambda x, b: core.fake_quant(x, delta, zp, b, sym=True))
    y4 = f(x, jnp.int32(4))
    y8 = f(x, jnp.int32(8))
    # 8-bit reconstruction error <= 4-bit
    assert float(jnp.sum((y8 - x) ** 2)) <= float(jnp.sum((y4 - x) ** 2))


def test_multibit_stack_shapes():
    spec = core.QuantSpec(sym=True, channel_wise=True, candidate_bits=(2, 4, 8))
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 16, 32))  # HWIO
    dl, zl = core.fit_weight_qparams(w, spec, channel_axis=-1)
    assert dl.shape == (3, 32) and zl.shape == (3, 32)
    # per-channel delta matches absmax/n_levels for each out channel
    w_c = np.moveaxis(np.asarray(w), -1, 0).reshape(32, -1)
    for bi, b in enumerate((2, 4, 8)):
        n_levels = 2 ** (b - 1) - 1
        want = np.maximum(np.abs(w_c.min(1).clip(max=0)), np.abs(w_c.max(1).clip(min=0))) / n_levels
        np.testing.assert_allclose(np.asarray(dl[bi]), want, rtol=1e-5)


def test_grid_search_lp_beats_or_matches_minmax_mse():
    """Grid search should not be worse than plain min-max on heavy-tailed data."""
    rng = np.random.RandomState(1)
    x = rng.standard_t(df=2, size=(1024,)).astype(np.float32)
    xj = jnp.asarray(x)
    n_bits = 4
    d_g, z_g = core.fit_qparams_grid_search_lp(xj, n_bits)
    mn, mx = core.tensor_minmax(xj)
    d_m, z_m = core.fit_qparams_minmax(mn, mx, n_bits)
    err_g = float(jnp.mean((core.fake_quant(xj, d_g, z_g, n_bits) - xj) ** 2))
    err_m = float(jnp.mean((core.fake_quant(xj, d_m, z_m, n_bits) - xj) ** 2))
    assert err_g <= err_m * 1.001


def test_quantize_weight_int_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(2), (16, 8))
    spec = core.QuantSpec(sym=True, channel_wise=True, candidate_bits=(8,))
    dl, _ = core.fit_weight_qparams(w, spec, channel_axis=-1)
    codes = core.quantize_weight_int(w, dl[0], channel_axis=-1, n_bits=8)
    assert codes.dtype == jnp.int8
    recon = codes.astype(jnp.float32) * dl[0][None, :]
    assert float(jnp.max(jnp.abs(recon - w))) <= float(jnp.max(dl[0])) * 0.51


def test_lp_loss_matches_reference_reduction():
    """reduction='none': sum over non-batch dims then mean (base_quantizer.py:338)."""
    p = jnp.ones((2, 3, 4))
    t = jnp.zeros((2, 3, 4))
    assert float(core.lp_loss(p, t)) == pytest.approx(12.0)
    assert float(core.lp_loss(p, t, reduction="all")) == pytest.approx(1.0)
