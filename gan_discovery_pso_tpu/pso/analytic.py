"""Analytic objectives for PSO golden tests (reference
src/hands_on/example_pso.py:6-18 optimizes these with the minimal Swarm)."""

from __future__ import annotations

import jax.numpy as jnp


def sphere(x: jnp.ndarray) -> jnp.ndarray:
    """f(x) = Σ x_i², global minimum 0 at the origin."""
    return jnp.sum(x * x)


def cosine_mixture(x: jnp.ndarray) -> jnp.ndarray:
    """f(x) = -0.1·Σ cos(5πx_i) + Σ x_i², min −0.1·d at the origin."""
    return -0.1 * jnp.sum(jnp.cos(5.0 * jnp.pi * x)) + jnp.sum(x * x)


def rastrigin(x: jnp.ndarray) -> jnp.ndarray:
    """Highly multimodal stress objective (not in the reference; extra
    coverage for optimizer correctness)."""
    return 10.0 * x.shape[0] + jnp.sum(x * x - 10.0 * jnp.cos(2.0 * jnp.pi * x))
