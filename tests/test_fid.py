"""FID / CLIP-score metric math tests (closed-form oracles)."""

import numpy as np
import jax.numpy as jnp

from mixdq_tpu.utils import fid


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16).astype(np.float32)
    assert abs(fid.fid_from_features(f, f)) < 1e-2


def test_frechet_mean_shift_closed_form():
    """Same covariance, shifted mean: FID == ||dmu||^2."""
    rng = np.random.RandomState(1)
    f = rng.randn(4000, 8).astype(np.float32)
    shift = np.full(8, 0.5, np.float32)
    got = fid.fid_from_features(f, f + shift)
    assert abs(got - 8 * 0.25) < 0.05


def test_frechet_isotropic_scale_closed_form():
    """Zero-mean isotropic Gaussians sigma1=1, sigma2=2:
    FID = D*(1 + 4 - 2*2) = D."""
    D = 6
    mu = np.zeros(D)
    c1 = np.eye(D)
    c2 = 4.0 * np.eye(D)
    got = float(fid.frechet_distance(mu, c1, mu, c2))
    assert abs(got - D * 1.0) < 1e-3


def test_clip_score():
    a = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    b = jnp.asarray([[2.0, 0.0], [0.0, -1.0]])  # cos = 1 and -1 (clipped to 0)
    assert abs(fid.clip_score(a, b) - 50.0) < 1e-4
