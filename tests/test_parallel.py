"""Sharded-swarm equivalence + DP train-step tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gan_discovery_pso_tpu.core.config import AdamConfig, PsoConfig
from gan_discovery_pso_tpu.parallel import (
    make_mesh,
    make_multi_swarm_optimize,
    make_sharded_optimize,
)
from gan_discovery_pso_tpu.pso import analytic, make_analytic_fitness, optimize
from gan_discovery_pso_tpu.models.dcgan import DiscriminatorDef, GeneratorDef
from gan_discovery_pso_tpu.train.dcgan import gan_init, make_gan_train_step


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_swarm_matches_single_device():
    hp = PsoConfig(n_iterations=25, n_particles=32, dim_space=4)
    fit = make_analytic_fitness(analytic.sphere)
    key = jax.random.key(0)

    final_1, hist_1, init_1 = jax.jit(lambda k: optimize(k, fit, hp))(key)

    mesh = make_mesh(8, "swarm")
    run = make_sharded_optimize(mesh, fit, hp)
    final_8, hist_8, init_8 = run(key)

    # particle shards land on 8 devices
    assert len(final_8.positions.sharding.device_set) == 8

    np.testing.assert_array_equal(np.asarray(init_1.positions), np.asarray(init_8.positions))
    # GSPMD reassociates fp32 reductions; PSO dynamics are chaotic, so exact
    # long-horizon equality is not physical. Early iterations must agree
    # tightly; the full trajectory to fp32-drift tolerance.
    np.testing.assert_allclose(
        np.asarray(hist_1.g_best_val)[:5], np.asarray(hist_8.g_best_val)[:5],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(final_1.positions), np.asarray(final_8.positions), rtol=5e-2, atol=5e-3
    )
    np.testing.assert_allclose(
        float(final_1.g_best_val), float(final_8.g_best_val), rtol=1e-3, atol=1e-4
    )


def test_sharded_swarm_seeded_positions():
    hp = PsoConfig(n_iterations=10, n_particles=16, dim_space=3)
    fit = make_analytic_fitness(analytic.sphere)
    mesh = make_mesh(8, "swarm")
    pos0 = jnp.asarray(np.random.RandomState(0).randn(16, 3), jnp.float32)
    run = make_sharded_optimize(mesh, fit, hp)
    final, hist, init = run(jax.random.key(1), pos0)
    np.testing.assert_array_equal(np.asarray(init.positions), np.asarray(pos0))
    assert float(final.g_best_val) < float(jnp.min(jax.vmap(analytic.sphere)(pos0)))


def test_multi_swarm_vmap_sharded():
    """4 independent swarms (≡ per-class loop) across the mesh; each must
    match its own single-swarm run."""
    hp = PsoConfig(n_iterations=30, n_particles=16, dim_space=2)
    # per-swarm objective: sphere centered at swarm-specific offset
    centers = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.5]])

    def fitness_batched(idx, positions):
        c = centers[idx]
        return jnp.sum((positions - c[None, :]) ** 2, axis=1)

    mesh = make_mesh(4, "swarm")
    run = make_multi_swarm_optimize(fitness_batched, hp, n_swarms=4, mesh=mesh)
    keys = jax.random.split(jax.random.key(2), 4)
    finals, hists, inits = run(keys)
    assert finals.positions.shape == (4, 16, 2)

    for i in range(4):
        fit_i = lambda pos, c=centers[i]: jnp.sum((pos - c[None, :]) ** 2, axis=1)
        f1, h1, _ = optimize(keys[i], fit_i, hp)
        np.testing.assert_allclose(
            np.asarray(finals.g_best_val[i]), np.asarray(f1.g_best_val), rtol=1e-3, atol=1e-4
        )
        # converged near its own center
        assert float(finals.g_best_val[i]) < 0.2


def test_gan_train_step_data_parallel():
    """DP GAN step on the 8-device mesh == single-device step (same batch)."""
    gdef, ddef = GeneratorDef(z_dim=10, features_g=16), DiscriminatorDef(features_d=16)
    adam = AdamConfig(lr=1e-3, beta1=0.5, beta2=0.99)
    state, _ = gan_init(jax.random.key(3), gdef, ddef, adam)
    step = make_gan_train_step(gdef, adam)

    real = jnp.asarray(np.random.RandomState(1).rand(16, 1, 28, 28) * 2 - 1, jnp.float32)
    key = jax.random.key(4)

    s1, m1 = jax.jit(step)(state, real, key)

    mesh = make_mesh(8, "data")
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    real_sharded = jax.device_put(real, data_sh)
    state_repl = jax.device_put(state, jax.tree.map(lambda _: repl, state))
    s8, m8 = jax.jit(step)(state_repl, real_sharded, key)

    np.testing.assert_allclose(float(m1["loss_disc"]), float(m8["loss_disc"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["loss_gen"]), float(m8["loss_gen"]), rtol=1e-5)
    # params after one step agree
    l1 = jax.tree.leaves(s1.gen_params)
    l8 = jax.tree.leaves(s8.gen_params)
    for a, b in zip(l1, l8):
        # one Adam step is O(lr)=1e-3; cross-device grad reassociation leaves
        # sub-lr fp32 noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=2e-4)


def test_gan_train_step_decreases_nothing_nan():
    """Smoke: 5 steps on random data keep losses finite and change params."""
    gdef, ddef = GeneratorDef(z_dim=10, features_g=16), DiscriminatorDef(features_d=16)
    adam = AdamConfig(lr=1e-3, beta1=0.5, beta2=0.99)
    state, _ = gan_init(jax.random.key(5), gdef, ddef, adam)
    step = jax.jit(make_gan_train_step(gdef, adam))
    rng = np.random.RandomState(2)
    p0 = jax.tree.leaves(state.gen_params)[0].copy()
    for i in range(5):
        real = jnp.asarray(rng.rand(8, 1, 28, 28) * 2 - 1, jnp.float32)
        state, metrics = step(state, real, jax.random.key(10 + i))
        assert np.isfinite(float(metrics["loss_gen"]))
        assert np.isfinite(float(metrics["loss_disc"]))
    assert int(state.step) == 5
    assert not np.allclose(np.asarray(jax.tree.leaves(state.gen_params)[0]), np.asarray(p0))


def test_shardmap_optimize_matches_single_device():
    """Hand-collectived shard_map swarm == single-device optimize (same key
    streams; pmin + one-hot psum are the only cross-device ops)."""
    from gan_discovery_pso_tpu.parallel import make_shardmap_optimize

    hp = PsoConfig(n_iterations=20, n_particles=32, dim_space=4)
    fit = make_analytic_fitness(analytic.sphere)
    key = jax.random.key(7)

    ref_final, ref_hist, _ = jax.jit(lambda k: optimize(k, fit, hp))(key)

    mesh = make_mesh(8, "swarm")
    run = make_shardmap_optimize(mesh, fit, hp)
    out = run(key)

    np.testing.assert_allclose(
        np.asarray(out["g_best_trace"])[:5], np.asarray(ref_hist.g_best_val)[:5],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(out["g_best_val"]), float(ref_final.g_best_val), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["positions"]), np.asarray(ref_final.positions),
        rtol=5e-2, atol=5e-3,
    )
    # uneven particle count rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_shardmap_optimize(mesh, fit, PsoConfig(n_particles=30, dim_space=4))


def test_shardmap_optimize_early_stop_matches_single_device():
    """The shard_map swarm honors hp.early_stopping with the same done-latch
    as single-device optimize: the g_best trace freezes on the same iteration
    and the final best values agree."""
    from gan_discovery_pso_tpu.parallel import make_shardmap_optimize
    from gan_discovery_pso_tpu.pso import last_iteration

    hp = PsoConfig(n_iterations=30, n_particles=32, dim_space=4,
                   tolerance=1e-3, early_stopping=True)
    fit = make_analytic_fitness(analytic.sphere)
    key = jax.random.key(9)

    ref_final, ref_hist, _ = jax.jit(lambda k: optimize(k, fit, hp))(key)
    li = last_iteration(ref_hist)
    assert li < hp.n_iterations + 1  # the reference path did early-stop

    mesh = make_mesh(8, "swarm")
    out = make_shardmap_optimize(mesh, fit, hp)(key)
    trace = np.asarray(out["g_best_trace"])
    # frozen tail: every entry past the stop iteration repeats the final best
    np.testing.assert_array_equal(trace[li:], np.full_like(trace[li:], trace[li - 1]))
    # the stop happened on the same iteration (trace still improving before)
    ref_trace = np.asarray(ref_hist.g_best_val)
    np.testing.assert_allclose(trace[:li], ref_trace[:li], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(out["g_best_val"]), float(ref_final.g_best_val), rtol=1e-4, atol=1e-6
    )


def test_batched_sharded_discovery_2d_mesh_matches_batched():
    """2-D mesh (class x swarm) batched discovery: every class row must
    match the single-device flagship batched runner (pso/runner.py) with the
    same keys to fp32-reassociation tolerance, particle arrays sharded over
    both axes, per-class scalars over the class axis only."""
    from gan_discovery_pso_tpu.models import (GeneratorDef, ResNetDef,
                                              generator_init, resnet_init)
    from gan_discovery_pso_tpu.parallel import (
        make_batched_sharded_discovery_runner,
        make_mesh_2d,
    )
    from gan_discovery_pso_tpu.pso import make_batched_discovery_runner

    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    hp = PsoConfig(n_iterations=4, n_particles=8, dim_space=8)
    gp, gs = generator_init(jax.random.key(0), GeneratorDef(8, 1, 8))
    rp, rs = resnet_init(jax.random.key(1), rdef, init="glorot_normal")
    idxs = jnp.asarray([0, 2], jnp.int32)
    keys = jnp.stack([jax.random.key(5), jax.random.key(6)])

    ref = make_batched_discovery_runner(rdef, hp)
    rf, rh, ri = ref(keys, gp, gs, rp, rs, idxs)

    mesh = make_mesh_2d((2, 4), ("class", "swarm"))
    run = make_batched_sharded_discovery_runner(mesh, rdef, hp)
    sf, sh_, si = run(keys, gp, gs, rp, rs, idxs)

    # particle arrays land on all 8 devices; per-class scalars on 2 shards
    assert len(sf.positions.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(ri.positions), np.asarray(si.positions))
    np.testing.assert_allclose(np.asarray(rf.g_best_val),
                               np.asarray(sf.g_best_val), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rh.g_best_val),
                               np.asarray(sh_.g_best_val), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rf.positions),
                               np.asarray(sf.positions), rtol=5e-2, atol=5e-3)
