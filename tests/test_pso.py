"""PSO engine golden tests.

`NumpySwarm` is a clean-room NumPy re-execution of the documented reference
semantics (SURVEY.md §3.1; reference src/pso/util_pso.py) driven with the
SAME r1/r2 streams and init as the tensorized engine — trajectories must
agree to fp32 tolerance. Plus convergence on the analytic objectives the
reference's hands-on harness uses (src/hands_on/example_pso.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.pso import (
    analytic,
    last_iteration,
    make_analytic_fitness,
    mean_pairwise_distance,
    optimize,
    pso_iteration,
    swarm_init,
    SwarmResult,
)
from gan_discovery_pso_tpu.pso.io import (
    load_final_particle_positions,
    load_particle_trajectories,
    save_particle_histories,
)


class NumpySwarm:
    """Reference-semantics PSO in NumPy (object-free, but same update order:
    personal best → global best w/ list semantics → inertia → move)."""

    def __init__(self, pos, vel, hp: PsoConfig):
        self.pos = pos.copy()
        self.vel = vel.copy()
        self.hp = hp
        self.w = hp.w_inertia
        self.p_best_pos = pos.copy()
        self.p_best_val = np.full(pos.shape[0], np.inf, np.float32)
        self.g_best_pos = np.zeros(pos.shape[1], np.float32)
        self.g_best_val = [np.inf]  # the reference's list
        self.i = 1

    def step(self, fit, r1, r2):
        vals = np.array([fit(p) for p in self.pos], np.float32)
        for n in range(len(self.pos)):
            if vals[n] < self.p_best_val[n]:
                self.p_best_val[n] = vals[n]
                self.p_best_pos[n] = self.pos[n]
        # global best with append/overwrite-inf list semantics
        exp_val, exp_pos = self.g_best_val[-1], self.g_best_pos
        for n in range(len(self.pos)):
            if self.p_best_val[n] < exp_val:
                exp_val, exp_pos = self.p_best_val[n], self.p_best_pos[n]
        if exp_val < self.g_best_val[-1]:
            if self.g_best_val[-1] == np.inf:
                self.g_best_val[-1] = exp_val
            else:
                self.g_best_val.append(exp_val)
            self.g_best_pos = exp_pos
        if self.i > 1 and self.hp.schedule_inertia:
            self.w = 0.99 * self.w
        # move — w_cognitive couples g_best, w_social couples p_best (swap)
        for n in range(len(self.pos)):
            inertia = self.w * self.vel[n]
            cogn = self.hp.w_cognitive * r1[n] * (self.g_best_pos - self.pos[n])
            soci = self.hp.w_social * r2[n] * (self.p_best_pos[n] - self.pos[n])
            self.vel[n] = inertia + soci + cogn
            self.pos[n] = self.pos[n] + self.vel[n]
        self.i += 1

    def should_stop(self):
        return (
            self.i - 1 > 2
            and len(self.g_best_val) > 2
            and abs(self.g_best_val[-1] - self.g_best_val[-2]) < self.hp.tolerance
        )


HP = PsoConfig(n_iterations=20, n_particles=16, dim_space=4, w_inertia=0.73,
               w_cognitive=1.496, w_social=1.496, tolerance=1e-5)


def test_pso_iteration_matches_numpy_reference():
    key = jax.random.key(0)
    state = swarm_init(key, HP.n_particles, HP.dim_space, HP.w_inertia)
    pos0 = np.asarray(state.positions)
    vel0 = np.asarray(state.velocities)
    ref = NumpySwarm(pos0, vel0, HP)

    fit = lambda p: float(np.sum(p * p))
    fit_batch = make_analytic_fitness(analytic.sphere)

    rng = np.random.RandomState(7)
    for it in range(1, 13):
        r1 = rng.rand(HP.n_particles).astype(np.float32)
        r2 = rng.rand(HP.n_particles).astype(np.float32)
        vals = fit_batch(state.positions)
        state = pso_iteration(state, vals, jnp.array(r1), jnp.array(r2), HP)
        ref.step(fit, r1, r2)

        np.testing.assert_allclose(np.asarray(state.positions), ref.pos, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(state.velocities), ref.vel, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(state.p_best_val), ref.p_best_val, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(float(state.g_best_val), ref.g_best_val[-1], rtol=2e-5)
        assert int(state.g_improvements) == len(ref.g_best_val)
        assert int(state.iteration) == ref.i


def test_pso_iteration_matches_numpy_with_inertia_schedule():
    hp = PsoConfig(n_iterations=10, n_particles=8, dim_space=3, w_inertia=1.0,
                   w_cognitive=2.0, w_social=2.0, schedule_inertia=True)
    key = jax.random.key(1)
    state = swarm_init(key, hp.n_particles, hp.dim_space, hp.w_inertia)
    ref = NumpySwarm(np.asarray(state.positions), np.asarray(state.velocities), hp)
    fit_batch = make_analytic_fitness(analytic.cosine_mixture)
    fit = lambda p: float(-0.1 * np.sum(np.cos(5 * np.pi * p)) + np.sum(p * p))
    rng = np.random.RandomState(8)
    for it in range(1, 8):
        r1 = rng.rand(hp.n_particles).astype(np.float32)
        r2 = rng.rand(hp.n_particles).astype(np.float32)
        state = pso_iteration(state, fit_batch(state.positions), jnp.array(r1), jnp.array(r2), hp)
        ref.step(fit, r1, r2)
        np.testing.assert_allclose(float(state.w_inertia), ref.w, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(state.positions), ref.pos, rtol=3e-5, atol=3e-5)


def test_optimize_converges_on_sphere():
    hp = PsoConfig(n_iterations=50, n_particles=32, dim_space=2)
    fit = make_analytic_fitness(analytic.sphere)
    final, hist, init = optimize(jax.random.key(2), fit, hp)
    assert float(final.g_best_val) < 1e-3
    assert last_iteration(hist) == 51  # natural exit: n_iterations + 1
    # g_best_val series is monotone non-increasing
    series = np.asarray(hist.g_best_val)
    assert np.all(np.diff(series) <= 1e-7)


def test_optimize_converges_on_cosine_mixture():
    hp = PsoConfig(n_iterations=60, n_particles=32, dim_space=2)
    fit = make_analytic_fitness(analytic.cosine_mixture)
    final, hist, _ = optimize(jax.random.key(3), fit, hp)
    # global minimum is -0.2 at the origin
    assert float(final.g_best_val) < -0.19


def test_early_stopping_latches_and_freezes():
    hp = PsoConfig(n_iterations=50, n_particles=32, dim_space=2, tolerance=1e-3,
                   early_stopping=True)
    fit = make_analytic_fitness(analytic.sphere)
    final, hist, _ = optimize(jax.random.key(4), fit, hp)
    li = last_iteration(hist)
    assert li < 51  # stopped early
    active = np.asarray(hist.active)
    # active prefix then all-false suffix (latch never un-sets)
    flips = np.diff(active.astype(int))
    assert np.all(flips <= 0)
    # frozen rows: positions after stop equal the last active row
    pos = np.asarray(hist.positions)
    n_act = int(active.sum())
    if n_act < pos.shape[0]:
        np.testing.assert_array_equal(pos[n_act], pos[n_act - 1])


def test_mean_pairwise_distance_matches_loop():
    rng = np.random.RandomState(9)
    pos = rng.randn(10, 5).astype(np.float32)
    want = np.mean([np.linalg.norm(pos[i] - pos[j]) for i in range(10) for j in range(i + 1, 10)])
    got = float(mean_pairwise_distance(jnp.array(pos)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_particle_history_io_roundtrip(tmp_path):
    hp = PsoConfig(n_iterations=10, n_particles=8, dim_space=3)
    fit = make_analytic_fitness(analytic.sphere)
    final, hist, init = optimize(jax.random.key(5), fit, hp)
    res = SwarmResult(final, hist, init, hp)
    traj = res.particle_trajectories()
    vtraj = res.velocity_trajectories()
    assert traj.shape == (11, 8, 3)  # init + 10 iterations

    files = save_particle_histories(tmp_path, 3, traj, vtraj, kind="iid")
    names = {f.name for f in files}
    assert "particles_position_iid_class_3.pkl" in names
    assert "particles_position_iic_class_3.pkl" in names  # reader-typo alias

    last = load_final_particle_positions(tmp_path, 3, "iid")
    np.testing.assert_allclose(last, traj[-1], rtol=1e-6)
    full = load_particle_trajectories(tmp_path, 3, "iid")
    np.testing.assert_allclose(full, traj, rtol=1e-6)

    # pickle fallback path (reference reader shape)
    (tmp_path / "particles_iid_class_3.npz").unlink()
    last_pkl = load_final_particle_positions(tmp_path, 3, "iid")
    np.testing.assert_allclose(last_pkl, traj[-1], rtol=1e-6)

    hd = res.history_dict()
    assert len(hd["mean_mse"]) == 10
    assert len(hd["global_best_val"]) == 10


def test_last_iteration_matches_reference_loop_on_early_stop():
    """Golden: on an early-stop break the reference returns the BREAKING
    iteration i, not i+1 (util_pso.py:174-193: `break` before `i += 1`).
    Replay the reference while-loop on the NumPy swarm with optimize()'s
    exact r1/r2 streams and compare the returned iteration."""
    hp = PsoConfig(n_iterations=30, n_particles=16, dim_space=4,
                   tolerance=1e-3, early_stopping=True)
    fit_batch = make_analytic_fitness(analytic.sphere)
    key = jax.random.key(4)
    final, hist, _ = optimize(key, fit_batch, hp)
    li = last_iteration(hist)

    init_key, iter_key = jax.random.split(key)
    state0 = swarm_init(init_key, hp.n_particles, hp.dim_space, hp.w_inertia)
    ref = NumpySwarm(np.asarray(state0.positions), np.asarray(state0.velocities), hp)
    fit = lambda p: float(np.sum(p * p))
    i = 1
    while i < hp.n_iterations + 1:
        k = jax.random.fold_in(iter_key, i)
        k1, k2 = jax.random.split(k)
        r1 = np.asarray(jax.random.uniform(k1, (hp.n_particles,), jnp.float32))
        r2 = np.asarray(jax.random.uniform(k2, (hp.n_particles,), jnp.float32))
        ref.step(fit, r1, r2)
        if (
            i > 2 and len(ref.g_best_val) > 2
            and abs(ref.g_best_val[-1] - ref.g_best_val[-2]) < hp.tolerance
        ):
            break
        i += 1
    assert i < hp.n_iterations + 1  # the replay did early-stop
    assert li == i


def test_last_iteration_early_stop_on_final_scan_iteration():
    """Boundary case: the tolerance latch fires ON the last scheduled
    iteration — every history row is active, but the reference still
    returns i (the breaking iteration), not i+1. The final state's `done`
    flag disambiguates."""
    import dataclasses as _dc

    hp = PsoConfig(n_iterations=50, n_particles=32, dim_space=2,
                   tolerance=1e-3, early_stopping=True)
    fit = make_analytic_fitness(analytic.sphere)
    final, hist, _ = optimize(jax.random.key(4), fit, hp)
    li = last_iteration(hist, done=final.done)
    assert li < 51  # this seed early-stops

    # re-run with n_iterations == the stop iteration: latch fires on the
    # final scan step, active.all() is True, done must break the tie
    final2, hist2, _ = optimize(
        jax.random.key(4), fit, _dc.replace(hp, n_iterations=li)
    )
    assert bool(final2.done)
    assert last_iteration(hist2, done=final2.done) == li
    # without the flag the legacy ambiguity returns li+1 (documented)
    assert last_iteration(hist2) == li + 1


def test_optimize_resumable_kill_and_resume_bit_identical(tmp_path):
    """Preemption drill (SURVEY.md §5.3): 'kill' the run after the first
    checkpointed chunk, resume from disk, and require the tail trajectory to
    be BIT-identical to the single-shot run."""
    import dataclasses as _dc

    from gan_discovery_pso_tpu.core.checkpoint import Checkpointer
    from gan_discovery_pso_tpu.pso import optimize_resumable

    hp = PsoConfig(n_iterations=12, n_particles=8, dim_space=3)
    fit = make_analytic_fitness(analytic.sphere)
    key = jax.random.key(13)
    f1, h1, _ = optimize(key, fit, hp)

    ck = Checkpointer(tmp_path)
    # run only the first 5 iterations, checkpointing — then "die"
    optimize_resumable(
        key, fit, _dc.replace(hp, n_iterations=5), checkpointer=ck, checkpoint_every=5
    )
    # restart: picks up checkpoint_swarm.msgpack at iteration 6
    f2, h2, _ = optimize_resumable(key, fit, hp, checkpointer=ck, checkpoint_every=5)
    np.testing.assert_array_equal(np.asarray(f1.positions), np.asarray(f2.positions))
    np.testing.assert_array_equal(np.asarray(f1.g_best_pos), np.asarray(f2.g_best_pos))
    # resumed history covers iterations 6..12 == single-shot tail
    np.testing.assert_array_equal(np.asarray(h1.g_best_val)[5:], np.asarray(h2.g_best_val))
    np.testing.assert_array_equal(np.asarray(h1.positions)[5:], np.asarray(h2.positions))


def test_optimize_resumable_finished_run_returns_empty_history(tmp_path):
    """Resuming a checkpoint whose run already completed must return the
    final state with an empty history, not raise."""
    from gan_discovery_pso_tpu.core.checkpoint import Checkpointer
    from gan_discovery_pso_tpu.pso import optimize_resumable

    hp = PsoConfig(n_iterations=6, n_particles=8, dim_space=3)
    fit = make_analytic_fitness(analytic.sphere)
    key = jax.random.key(14)
    ck = Checkpointer(tmp_path)
    f1, _, i1 = optimize_resumable(key, fit, hp, checkpointer=ck, checkpoint_every=3)
    f2, h2, i2 = optimize_resumable(key, fit, hp, checkpointer=ck, checkpoint_every=3)
    np.testing.assert_array_equal(np.asarray(f1.positions), np.asarray(f2.positions))
    assert np.asarray(h2.active).shape[0] == 0
    # last_iteration on the 0-row history must fall back to the state's own
    # counter, not report 1 (the reference returns n_iterations+1 on natural
    # exit; the state counter sits at i+1 after iteration i executes)
    res = SwarmResult(f2, h2, i2, hp)
    assert res.last_iteration == hp.n_iterations + 1


def test_optimize_resumable_matches_single_shot(tmp_path):
    """Chunked+checkpointed optimize reproduces the one-shot trajectory
    (preemption-safe restart, SURVEY.md §5.3)."""
    from gan_discovery_pso_tpu.core.checkpoint import Checkpointer
    from gan_discovery_pso_tpu.pso import optimize_resumable

    hp = PsoConfig(n_iterations=12, n_particles=8, dim_space=3)
    fit = make_analytic_fitness(analytic.sphere)
    key = jax.random.key(11)

    f1, h1, _ = optimize(key, fit, hp)

    ck = Checkpointer(tmp_path)
    f2, h2, _ = optimize_resumable(key, fit, hp, checkpointer=ck, checkpoint_every=5)
    np.testing.assert_allclose(np.asarray(f1.positions), np.asarray(f2.positions), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(f1.g_best_val), float(f2.g_best_val), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h1.g_best_val), np.asarray(h2.g_best_val), rtol=1e-6)
    assert (tmp_path / "checkpoint_swarm.msgpack").exists()


def test_discovery_runner_reuses_compilation_across_models():
    """make_discovery_runner takes params as jit arguments: two different
    model weights run through ONE traced executable and match the
    closure-based fitness results."""
    from gan_discovery_pso_tpu.models import (GeneratorDef, ResNetDef,
                                              generator_init, resnet_init)
    from gan_discovery_pso_tpu.pso import make_discovery_fitness, make_discovery_runner

    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    hp = PsoConfig(n_iterations=3, n_particles=4, dim_space=8)
    runner = make_discovery_runner(rdef, hp)

    n_traces = 0
    outs = []
    for seed in (0, 1):  # two DIFFERENT models
        gp, gs = generator_init(jax.random.key(seed), GeneratorDef(8, 1, 8))
        rp, rs = resnet_init(jax.random.key(seed + 10), rdef, init="glorot_normal")
        final, hist, init = runner(jax.random.key(5), gp, gs, rp, rs, jnp.asarray(2))
        outs.append(final)
        # reference value from the closure-based path
        fit = make_discovery_fitness(gp, gs, rp, rs, rdef, class_idx=2)
        ref_final, _, _ = optimize(jax.random.key(5), fit, hp)
        np.testing.assert_allclose(float(final.g_best_val), float(ref_final.g_best_val),
                                   rtol=1e-5)
    # different weights -> different outcomes through the same executable
    assert float(outs[0].g_best_val) != float(outs[1].g_best_val)
    # single compilation: the jitted runner was traced exactly once
    assert runner._cache_size() == 1


def test_batched_discovery_runner_reuses_compilation_and_matches_per_class():
    """make_batched_discovery_runner (the flagship sweep): params as jit
    arguments — one executable across models — and each class row equals an
    independent single-swarm optimize with the same key."""
    from gan_discovery_pso_tpu.models import (GeneratorDef, ResNetDef,
                                              generator_init, resnet_init)
    from gan_discovery_pso_tpu.pso import (
        make_batched_discovery_runner,
        make_discovery_fitness,
    )

    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    hp = PsoConfig(n_iterations=3, n_particles=4, dim_space=8)
    runner = make_batched_discovery_runner(rdef, hp)
    idxs = jnp.asarray([0, 2], jnp.int32)
    keys = jnp.stack([jax.random.key(5), jax.random.key(6)])

    for seed in (0, 1):
        gp, gs = generator_init(jax.random.key(seed), GeneratorDef(8, 1, 8))
        rp, rs = resnet_init(jax.random.key(seed + 10), rdef, init="glorot_normal")
        finals, hists, inits = runner(keys, gp, gs, rp, rs, idxs)
        for row, (ci, key) in enumerate(((0, keys[0]), (2, keys[1]))):
            fit = make_discovery_fitness(gp, gs, rp, rs, rdef, class_idx=ci)
            ref_final, _, _ = optimize(key, fit, hp)
            np.testing.assert_allclose(
                float(jax.tree.map(lambda a: a[row], finals).g_best_val),
                float(ref_final.g_best_val), rtol=1e-5,
            )
    assert runner._cache_size() == 1


def test_batched_runner_fitness_chunk_is_exact():
    """fitness_chunk evaluates the swarm in sequential in-program chunks
    (the throughput-mode HBM-streaming fix): per-particle fitness is
    independent, so trajectories must be IDENTICAL to the unchunked runner,
    not merely close."""
    from gan_discovery_pso_tpu.models import (GeneratorDef, ResNetDef,
                                              generator_init, resnet_init)
    from gan_discovery_pso_tpu.pso import make_batched_discovery_runner

    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    hp = PsoConfig(n_iterations=3, n_particles=8, dim_space=8)
    gp, gs = generator_init(jax.random.key(0), GeneratorDef(8, 1, 8))
    rp, rs = resnet_init(jax.random.key(10), rdef, init="glorot_normal")
    idxs = jnp.asarray([0, 2], jnp.int32)
    keys = jnp.stack([jax.random.key(5), jax.random.key(6)])

    plain = make_batched_discovery_runner(rdef, hp)
    chunked = make_batched_discovery_runner(rdef, hp, fitness_chunk=2)
    f_plain, h_plain, _ = plain(keys, gp, gs, rp, rs, idxs)
    f_chunk, h_chunk, _ = chunked(keys, gp, gs, rp, rs, idxs)
    np.testing.assert_array_equal(np.asarray(f_plain.g_best_val),
                                  np.asarray(f_chunk.g_best_val))
    np.testing.assert_array_equal(np.asarray(h_plain.fitness),
                                  np.asarray(h_chunk.fitness))
    np.testing.assert_array_equal(np.asarray(f_plain.positions),
                                  np.asarray(f_chunk.positions))

    with pytest.raises(ValueError):
        make_batched_discovery_runner(rdef, hp, fitness_chunk=3)


def test_chunked_batched_runner_replays_monolithic_trajectory():
    """make_chunked_batched_discovery_runner dispatches n/chunk short
    programs; the per-iteration RNG is keyed on state.iteration, so the
    trajectory (history AND finals) must be bit-identical to the monolithic
    runner — this is what lets the bench gate run fp32 without paying the
    monolithic HIGHEST-precision compile."""
    from gan_discovery_pso_tpu.models import (GeneratorDef, ResNetDef,
                                              generator_init, resnet_init)
    from gan_discovery_pso_tpu.pso import (
        make_batched_discovery_runner,
        make_chunked_batched_discovery_runner,
    )

    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    hp = PsoConfig(n_iterations=6, n_particles=4, dim_space=8)
    gp, gs = generator_init(jax.random.key(0), GeneratorDef(8, 1, 8))
    rp, rs = resnet_init(jax.random.key(10), rdef, init="glorot_normal")
    idxs = jnp.asarray([1, 3], jnp.int32)
    keys = jnp.stack([jax.random.key(7), jax.random.key(8)])

    mono = make_batched_discovery_runner(rdef, hp)
    chunked = make_chunked_batched_discovery_runner(rdef, hp, chunk=2)
    f_m, h_m, i_m = mono(keys, gp, gs, rp, rs, idxs)
    f_c, h_c, i_c = chunked(keys, gp, gs, rp, rs, idxs)

    for a, b in zip(jax.tree.leaves(f_m), jax.tree.leaves(f_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(h_m.fitness), np.asarray(h_c.fitness))
    np.testing.assert_array_equal(np.asarray(h_m.g_best_val),
                                  np.asarray(h_c.g_best_val))
    np.testing.assert_array_equal(np.asarray(i_m.positions),
                                  np.asarray(i_c.positions))

    with pytest.raises(ValueError):
        make_chunked_batched_discovery_runner(rdef, hp, chunk=4)


@pytest.mark.parametrize("seed", [11, 23, 37, 51])
def test_pso_iteration_matches_numpy_randomized_configs(seed):
    """Property-style sweep: random hyper-parameter draws (inertia schedule
    on/off, varied weights/tolerance/swarm shapes) must track the NumPy
    reference swarm step-for-step — guards the §3.1 quirk semantics across
    config space, not just the stock dcgan_mnist values."""
    rng = np.random.RandomState(seed)
    hp = PsoConfig(
        n_iterations=15,
        n_particles=int(rng.choice([4, 9, 16, 33])),
        dim_space=int(rng.choice([2, 5, 8])),
        w_inertia=float(rng.uniform(0.3, 1.1)),
        w_cognitive=float(rng.uniform(0.5, 2.0)),
        w_social=float(rng.uniform(0.5, 2.0)),
        tolerance=float(10 ** rng.uniform(-6, -2)),
        schedule_inertia=bool(rng.rand() < 0.5),
        early_stopping=True,
    )
    key = jax.random.key(seed)
    state = swarm_init(key, hp.n_particles, hp.dim_space, hp.w_inertia)
    ref = NumpySwarm(np.asarray(state.positions), np.asarray(state.velocities), hp)

    # rastrigin-like multimodal fitness keeps g_best improvements sparse
    # enough that the early-stop/list bookkeeping gets exercised. Both
    # swarms consume the SAME fp32 values (an fp64 NumPy re-evaluation can
    # flip a personal-best tie and fork the trajectories — the update math,
    # not the fitness arithmetic, is what this test guards).
    fit_batch = lambda P: jnp.sum(P * P, axis=1) + 3.0 * jnp.sum(
        1 - jnp.cos(2 * P), axis=1)

    # NOTE: pso_iteration is the RAW update — freezing on the done latch is
    # optimize()'s masked-carry job — so both swarms step every iteration
    # here and the latch is only checked for agreement with the reference's
    # break condition.
    latched = False
    for it in range(1, hp.n_iterations + 1):
        r1 = rng.rand(hp.n_particles).astype(np.float32)
        r2 = rng.rand(hp.n_particles).astype(np.float32)
        vals = fit_batch(state.positions)
        state = pso_iteration(state, vals, jnp.asarray(r1), jnp.asarray(r2), hp)
        vals_it = iter(np.asarray(vals, np.float32))
        ref.step(lambda p: float(next(vals_it)), r1, r2)
        np.testing.assert_allclose(np.asarray(state.positions), ref.pos,
                                   rtol=5e-5, atol=5e-5)
        np.testing.assert_allclose(float(state.g_best_val), ref.g_best_val[-1],
                                   rtol=5e-5)
        assert int(state.g_improvements) == len(ref.g_best_val)
        # `done` is a sticky latch; the reference would have BROKEN at the
        # first should_stop(), so agreement is only defined up to the latch
        # (afterwards ref.should_stop() may flicker as both keep stepping)
        if not latched:
            assert bool(state.done) == ref.should_stop()
            latched = bool(state.done)


def test_stacked_batched_runner_matches_unstacked_members():
    """make_batched_discovery_runner(stack=S): S independent class-sweeps
    fused into one program (bench.py's stacked flagship). Member s must
    reproduce EXACTLY what the unstacked runner computes from keys[s] — the
    stack axis is a vmap, never a semantic change (swarms stay independent,
    SURVEY.md §5.8)."""
    from gan_discovery_pso_tpu.models import (GeneratorDef, ResNetDef,
                                              generator_init, resnet_init)
    from gan_discovery_pso_tpu.pso import make_batched_discovery_runner

    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    hp = PsoConfig(n_iterations=3, n_particles=4, dim_space=8)
    gp, gs = generator_init(jax.random.key(0), GeneratorDef(8, 1, 8))
    rp, rs = resnet_init(jax.random.key(10), rdef, init="glorot_normal")
    idxs = jnp.asarray([0, 2], jnp.int32)
    keys = jnp.stack([
        jnp.stack([jax.random.key(5), jax.random.key(6)]),
        jnp.stack([jax.random.key(7), jax.random.key(8)]),
    ])  # [stack=2, classes=2]

    plain = make_batched_discovery_runner(rdef, hp)
    stacked = make_batched_discovery_runner(rdef, hp, stack=2)
    # chunked-stacked: the bench headline geometry (GDPT_STACK_CHUNK) —
    # fitness evaluated in sequential per-swarm chunks UNDER both vmaps;
    # per-particle fitness is independent, so the trajectory is identical
    chunked = make_batched_discovery_runner(rdef, hp, stack=2, fitness_chunk=2)
    f_s, h_s, i_s = stacked(keys, gp, gs, rp, rs, idxs)
    f_c, h_c, i_c = chunked(keys, gp, gs, rp, rs, idxs)
    assert np.asarray(f_s.g_best_val).shape == (2, 2)
    np.testing.assert_allclose(
        np.asarray(f_c.g_best_val), np.asarray(f_s.g_best_val),
        rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(h_c.fitness), np.asarray(h_s.fitness),
        rtol=1e-6, atol=1e-7)
    for m in range(2):
        f_p, h_p, i_p = plain(keys[m], gp, gs, rp, rs, idxs)
        np.testing.assert_allclose(
            np.asarray(jax.tree.map(lambda a, m=m: a[m], f_s).g_best_val),
            np.asarray(f_p.g_best_val), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(h_s.fitness)[m], np.asarray(h_p.fitness),
            rtol=1e-6, atol=1e-7)


def test_resolve_fitness_chunk_defaults():
    """'auto' (the shipped config default) turns chunking on exactly at the
    measured production threshold: 64 for >=256-particle swarms, off below
    (docs/BENCH.md tp_chunk: +49% with bit-identical g_best)."""
    from gan_discovery_pso_tpu.pso import resolve_fitness_chunk

    assert resolve_fitness_chunk("auto", 256) == 64
    assert resolve_fitness_chunk(None, 512) == 64
    assert resolve_fitness_chunk("auto", 32) is None
    assert resolve_fitness_chunk("auto", 300) is None  # 64 doesn't divide
    assert resolve_fitness_chunk(0, 256) is None
    assert resolve_fitness_chunk(False, 256) is None
    assert resolve_fitness_chunk(32, 256) == 32
    assert resolve_fitness_chunk(256, 256) is None  # chunk == swarm: no-op
    with pytest.raises(ValueError):
        resolve_fitness_chunk(48, 256)  # does not divide
    with pytest.raises(ValueError):
        resolve_fitness_chunk(-8, 256)


def test_select_program_default_path():
    """The CLI cold path defaults fp32 parity runs to chunked 10-iteration
    programs (trajectory-identical — test_chunked_batched_runner_replays_
    monolithic_trajectory) and keeps the monolith for fast-math /
    early-stopping / non-divisible runs (pso/runner.select_program)."""
    from gan_discovery_pso_tpu.pso import select_program

    hp50 = PsoConfig(n_iterations=50, n_particles=32, dim_space=10)
    assert select_program("auto", hp50, fast_math=False) == 10
    assert select_program("auto", hp50, fast_math=True) == 0
    assert select_program("chunked", hp50, fast_math=True) == 10
    assert select_program("monolithic", hp50, fast_math=False) == 0

    es = PsoConfig(n_iterations=50, n_particles=32, dim_space=10,
                   early_stopping=True)
    assert select_program("auto", es, fast_math=False) == 0  # keep history exact

    hp7 = PsoConfig(n_iterations=7, n_particles=32, dim_space=10)
    assert select_program("auto", hp7, fast_math=False) == 0  # 10 ∤ 7
    assert select_program("chunked", hp7, fast_math=False) == 0
    hp10 = PsoConfig(n_iterations=10, n_particles=32, dim_space=10)
    assert select_program("auto", hp10, fast_math=False) == 0  # one chunk = monolith

    import pytest as _pytest
    with _pytest.raises(ValueError):
        select_program("bogus", hp50, fast_math=False)
