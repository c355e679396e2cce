"""Pallas swarm-update kernel == reference pso_iteration math.

Runs in interpret mode on the CPU test backend; the same kernel compiles
natively on TPU (exercised by the bench/drive paths).
"""

import numpy as np

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.ops.pallas.swarm_update import pso_update_pallas
from gan_discovery_pso_tpu.pso import analytic, make_analytic_fitness, pso_iteration, swarm_init


def test_pallas_update_matches_reference_iteration():
    hp = PsoConfig(n_particles=32, dim_space=10, w_inertia=0.73,
                   w_cognitive=1.496, w_social=1.496)
    key = jax.random.key(0)
    state = swarm_init(key, hp.n_particles, hp.dim_space, hp.w_inertia)
    fit_fn = make_analytic_fitness(analytic.sphere)
    rng = np.random.RandomState(0)

    for it in range(5):
        r1 = jnp.asarray(rng.rand(hp.n_particles), jnp.float32)
        r2 = jnp.asarray(rng.rand(hp.n_particles), jnp.float32)
        fitness = fit_fn(state.positions)

        ref = pso_iteration(state, fitness, r1, r2, hp)
        (pos, vel, pbp, pbv, gbp, gbv, gpv, gimp) = pso_update_pallas(
            state.positions, state.velocities, state.p_best_pos, state.p_best_val,
            fitness, r1, r2, state.g_best_pos, state.g_best_val, state.g_prev_val,
            hp.w_inertia, hp.w_cognitive, hp.w_social, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(pos), np.asarray(ref.positions), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vel), np.asarray(ref.velocities), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pbp), np.asarray(ref.p_best_pos), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pbv), np.asarray(ref.p_best_val), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gbp), np.asarray(ref.g_best_pos), rtol=1e-6)
        np.testing.assert_allclose(float(gbv), float(ref.g_best_val), rtol=1e-6)
        np.testing.assert_allclose(float(gpv), float(ref.g_prev_val), rtol=1e-6)
        state = ref


def test_pallas_update_unpadded_sizes():
    """N and d not multiples of the tile: 13 particles, 7 dims."""
    hp = PsoConfig(n_particles=13, dim_space=7)
    state = swarm_init(jax.random.key(1), 13, 7, hp.w_inertia)
    fitness = make_analytic_fitness(analytic.cosine_mixture)(state.positions)
    r1 = jnp.linspace(0, 1, 13)
    r2 = jnp.linspace(1, 0, 13)
    ref = pso_iteration(state, fitness, r1, r2, hp)
    out = pso_update_pallas(
        state.positions, state.velocities, state.p_best_pos, state.p_best_val,
        fitness, r1, r2, state.g_best_pos, state.g_best_val, state.g_prev_val,
        hp.w_inertia, hp.w_cognitive, hp.w_social, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref.positions), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(out[5]), float(ref.g_best_val), rtol=1e-6)


def test_optimize_use_pallas_matches_xla_path():
    """optimize(use_pallas=True) falls back to interpret mode on CPU and
    reproduces the XLA-path trajectory."""
    from gan_discovery_pso_tpu.pso import optimize

    hp = PsoConfig(n_iterations=10, n_particles=8, dim_space=4)
    fit = make_analytic_fitness(analytic.sphere)
    o1 = optimize(jax.random.key(0), fit, hp, use_pallas=True)
    o2 = optimize(jax.random.key(0), fit, hp, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(o1[1].g_best_val), np.asarray(o2[1].g_best_val), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(o1[0].positions), np.asarray(o2[0].positions), rtol=1e-5, atol=1e-6
    )


def test_pallas_rescale_matches_xla():
    """ops/pallas/rescale.py == ops.rescale.rescale01_per_sample bit-for-bit
    at f32; in-kernel bf16 cast matches cast-after."""
    import numpy as np

    import jax.numpy as jnp

    from gan_discovery_pso_tpu.ops import rescale01_per_sample
    from gan_discovery_pso_tpu.ops.pallas import (
        rescale01_per_sample_pallas,
        rescale01_rows,
    )

    x = jnp.asarray(np.random.RandomState(3).randn(13, 1, 28, 28).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(rescale01_per_sample_pallas(x)),
        np.asarray(rescale01_per_sample(x)))
    got16 = np.asarray(rescale01_per_sample_pallas(x, out_dtype=jnp.bfloat16))
    want16 = np.asarray(rescale01_per_sample(x).astype(jnp.bfloat16))
    np.testing.assert_array_equal(got16, want16)
    # rows variant on a non-tile-aligned F
    r = jnp.asarray(np.random.RandomState(4).randn(9, 300).astype(np.float32))
    rr = np.asarray(rescale01_rows(r))
    assert rr.shape == (9, 300)
    np.testing.assert_allclose(rr.min(axis=1), 0.0, atol=0)
    np.testing.assert_allclose(rr.max(axis=1), 1.0, atol=0)


def test_pallas_update_under_class_vmap():
    """The batched runner calls the kernel under a class vmap (runner.py
    one-per-class); the batched lowering is where the TPU SMEM block rule
    bites (operands must keep 2-D last-two dims — swarm_update.py scal),
    and the semantics must stay per-class independent."""
    hp = PsoConfig(n_particles=16, dim_space=6, w_inertia=0.73,
                   w_cognitive=1.496, w_social=1.496)
    n_cls = 4
    keys = jax.random.split(jax.random.key(2), n_cls)
    states = jax.vmap(lambda k: swarm_init(k, hp.n_particles, hp.dim_space,
                                           hp.w_inertia))(keys)
    fit_fn = make_analytic_fitness(analytic.sphere)
    fitness = jax.vmap(fit_fn)(states.positions)
    rng = np.random.RandomState(3)
    r1 = jnp.asarray(rng.rand(n_cls, hp.n_particles), jnp.float32)
    r2 = jnp.asarray(rng.rand(n_cls, hp.n_particles), jnp.float32)

    def one(state, fit, a, b):
        return pso_update_pallas(
            state.positions, state.velocities, state.p_best_pos,
            state.p_best_val, fit, a, b, state.g_best_pos, state.g_best_val,
            state.g_prev_val, hp.w_inertia, hp.w_cognitive, hp.w_social,
            interpret=True,
        )

    batched = jax.vmap(one)(states, fitness, r1, r2)
    for c in range(n_cls):
        state_c = jax.tree.map(lambda x, c=c: x[c], states)
        ref = pso_iteration(state_c, fitness[c], r1[c], r2[c], hp)
        np.testing.assert_allclose(np.asarray(batched[0][c]),
                                   np.asarray(ref.positions), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(batched[4][c]),
                                   np.asarray(ref.g_best_pos), rtol=1e-6)
        np.testing.assert_allclose(float(batched[5][c]),
                                   float(ref.g_best_val), rtol=1e-6)
