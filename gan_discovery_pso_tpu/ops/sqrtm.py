"""Matrix square roots on device for the FID metric.

The reference computes FID's trace term by pulling covariances to host and
running `scipy.linalg.sqrtm` (Schur decomposition) on CPU
(reference src/evaluation/util_gan_evaluation.py:19-41). On TPU we use the
symmetric-product identity instead:

    tr( sqrtm(Σx · Σy) ) = tr( sqrtm( Σx^{1/2} · Σy · Σx^{1/2} ) )
                         = Σ_i sqrt(λ_i(Σx^{1/2} Σy Σx^{1/2}))

Both Σx^{1/2} (via eigh of the symmetric PSD Σx) and the inner product are
symmetric eigendecompositions — no Schur, no host round-trip, matches scipy
to fp32 tolerance on PSD inputs (golden-tested in tests/test_ops_eval.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sqrtm_psd(a: jax.Array, eps: float = 0.0) -> jax.Array:
    """Principal square root of a symmetric PSD matrix via eigh."""
    a = 0.5 * (a + a.T)  # symmetrize against fp noise
    w, v = jnp.linalg.eigh(a)
    w = jnp.sqrt(jnp.clip(w, eps, None))
    return jnp.matmul(v * w[None, :], v.T, precision=jax.lax.Precision.HIGHEST)


def trace_sqrt_product(sigma_x: jax.Array, sigma_y: jax.Array) -> jax.Array:
    """tr(sqrtm(Σx @ Σy)) for symmetric PSD Σx, Σy — the FID cross term."""
    sx_half = sqrtm_psd(sigma_x)
    hi = jax.lax.Precision.HIGHEST
    m = jnp.matmul(jnp.matmul(sx_half, sigma_y, precision=hi), sx_half, precision=hi)
    m = 0.5 * (m + m.T)
    w = jnp.linalg.eigvalsh(m)
    return jnp.sum(jnp.sqrt(jnp.clip(w, 0.0, None)))
