"""Metrics tests: SQNR/MSE formula checks, SSIM vs a direct sliding-window
numpy oracle (skimage's uniform-filter formulation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mixdq_tpu.utils import metrics


def test_sqnr_formula():
    s = jnp.ones((10,))
    n = s + 0.1
    # 10*log10(10 / (10*0.01)) = 20 dB
    assert float(metrics.sqnr(s, n)) == pytest.approx(20.0, abs=1e-3)


def test_sqnr_identical_is_large():
    s = jnp.arange(8.0)
    assert float(metrics.sqnr(s, s)) > 100.0


def np_ssim_oracle(x, y, win, data_range):
    """Direct O(N*win^2) sliding-window SSIM (single channel 2D)."""
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    NP = win * win
    cov_norm = NP / (NP - 1)
    H, W = x.shape
    vals = []
    for i in range(H - win + 1):
        for j in range(W - win + 1):
            px = x[i : i + win, j : j + win]
            py = y[i : i + win, j : j + win]
            ux, uy = px.mean(), py.mean()
            vx = cov_norm * (np.mean(px * px) - ux * ux)
            vy = cov_norm * (np.mean(py * py) - uy * uy)
            vxy = cov_norm * (np.mean(px * py) - ux * uy)
            vals.append(
                ((2 * ux * uy + C1) * (2 * vxy + C2))
                / ((ux * ux + uy * uy + C1) * (vx + vy + C2))
            )
    return np.mean(vals)


def test_ssim_matches_oracle():
    rng = np.random.RandomState(0)
    x = rng.rand(20, 20).astype(np.float32)
    y = np.clip(x + 0.1 * rng.randn(20, 20).astype(np.float32), 0, 1)
    got = float(metrics.ssim(jnp.asarray(x), jnp.asarray(y), win_size=7, channel_axis=None))
    want = np_ssim_oracle(x, y, 7, 1.0)
    assert got == pytest.approx(want, abs=1e-4)


def test_ssim_identical_is_one():
    x = jnp.asarray(np.random.RandomState(1).rand(16, 16, 3).astype(np.float32))
    assert float(metrics.ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_large_window():
    """The sensitivity sweep uses win_size 511 on 512px images
    (quant_content.py:22) — the cumsum formulation must handle it."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(512, 512, 3).astype(np.float32))
    y = jnp.clip(x + 0.05, 0, 1)
    v = float(metrics.ssim(x, y, win_size=511))
    assert 0.0 < v < 1.0
