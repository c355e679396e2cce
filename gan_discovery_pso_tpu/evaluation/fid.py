"""Fréchet distance on CAE embeddings — fully on device.

The reference pulls embeddings into pandas, computes mean/cov with numpy and
the matrix sqrt with scipy on host
(reference src/evaluation/util_gan_evaluation.py:16-52). Here statistics and
the sqrt (eigh-based, ops/sqrtm.py) stay on device; golden-tested against
the scipy formulation in tests/test_evaluation.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.ops import trace_sqrt_product

_HI = jax.lax.Precision.HIGHEST


def mean_and_cov(features: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Column mean + unbiased covariance of [N, D] features (== np.cov
    rowvar=False, reference util_gan_evaluation.py:16-17,43-52)."""
    mu = jnp.mean(features, axis=0)
    centered = features - mu[None, :]
    cov = jnp.matmul(centered.T, centered, precision=_HI) / (features.shape[0] - 1)
    return mu, cov


def frechet_distance(mu_x, mu_y, sigma_x, sigma_y) -> jax.Array:
    """‖μx−μy‖² + tr(Σx + Σy − 2·sqrtm(Σx·Σy))
    (reference util_gan_evaluation.py:30-41)."""
    diff = mu_x - mu_y
    return (
        jnp.sum(diff * diff)
        + jnp.trace(sigma_x)
        + jnp.trace(sigma_y)
        - 2.0 * trace_sqrt_product(sigma_x, sigma_y)
    )


@jax.jit
def fid_from_features(real_features: jax.Array, synthetic_features: jax.Array) -> jax.Array:
    """One fused call: embeddings in, FID out."""
    mu_r, cov_r = mean_and_cov(real_features)
    mu_s, cov_s = mean_and_cov(synthetic_features)
    return frechet_distance(mu_r, mu_s, cov_r, cov_s)
