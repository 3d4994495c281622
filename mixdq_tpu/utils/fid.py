"""FID / CLIP-score metrics.

The reference lists FID and CLIP-score as TODO (README.md:169-171). The
metric math is implemented here and unit-tested; the feature extractors
(InceptionV3 for FID, CLIP image tower for CLIP-score) require local
checkpoints in this offline environment:

* ``frechet_distance(mu1, cov1, mu2, cov2)`` — exact FID given feature
  Gaussians, with a symmetric-eigendecomposition matrix square root
  (jnp, TPU-friendly; no scipy sqrtm).
* ``fid_from_features(feats_a, feats_b)`` — fit Gaussians + distance.
* ``clip_score(image_embeds, text_embeds)`` — mean cosine similarity
  (scaled by 100, the standard convention).
"""

from __future__ import annotations

import jax.numpy as jnp


def _sqrtm_psd(mat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Matrix square root of a symmetric PSD matrix via eigh."""
    vals, vecs = jnp.linalg.eigh(mat)
    vals = jnp.clip(vals, eps, None)
    return (vecs * jnp.sqrt(vals)[None, :]) @ vecs.T


def frechet_distance(mu1, cov1, mu2, cov2) -> jnp.ndarray:
    """||mu1-mu2||^2 + Tr(cov1 + cov2 - 2 (cov1 cov2)^{1/2}).

    The cross term uses the similarity-transformed PSD form
    ``(cov1^{1/2} cov2 cov1^{1/2})^{1/2}`` so eigh applies."""
    mu1, mu2 = jnp.asarray(mu1, jnp.float64 if False else jnp.float32), jnp.asarray(mu2, jnp.float32)
    diff = mu1 - mu2
    s1 = _sqrtm_psd(jnp.asarray(cov1, jnp.float32))
    inner = s1 @ jnp.asarray(cov2, jnp.float32) @ s1
    tr_cross = jnp.trace(_sqrtm_psd(inner))
    return (diff @ diff + jnp.trace(cov1) + jnp.trace(cov2)
            - 2.0 * tr_cross)


def fit_gaussian(feats: jnp.ndarray):
    """feats: [N, D] -> (mu [D], cov [D, D])."""
    mu = jnp.mean(feats, axis=0)
    x = feats - mu[None, :]
    cov = (x.T @ x) / (feats.shape[0] - 1)
    return mu, cov


def fid_from_features(feats_a: jnp.ndarray, feats_b: jnp.ndarray) -> float:
    mu1, c1 = fit_gaussian(jnp.asarray(feats_a, jnp.float32))
    mu2, c2 = fit_gaussian(jnp.asarray(feats_b, jnp.float32))
    return float(frechet_distance(mu1, c1, mu2, c2))


def clip_score(image_embeds: jnp.ndarray, text_embeds: jnp.ndarray) -> float:
    """Mean 100 * max(cos(img, txt), 0) over paired rows."""
    a = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    b = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    cos = jnp.sum(a * b, axis=-1)
    return float(100.0 * jnp.mean(jnp.maximum(cos, 0.0)))
