"""Sharded-swarm PSO: particles split across chips, params replicated.

One PSO iteration needs exactly one cross-device exchange: the global-best
(value, position) reduction over the particle axis (SURVEY.md §5.8). With
`jit` + NamedSharding annotations GSPMD lowers the `argmin` + gather in
pso_iteration to an all-reduce + broadcast riding ICI; everything else
(fitness forwards, velocity/position math) is embarrassingly parallel over
the local particle shard.

Determinism: randomness is key-derived (counter-based), not device-stateful,
so an 8-way sharded run produces bit-identical trajectories to a single
device run — asserted in tests/test_parallel.py.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.pso.swarm import (
    PsoHistory,
    SwarmState,
    optimize,
)


def swarm_state_sharding(mesh: Mesh, axis: str = "swarm") -> SwarmState:
    """PartitionSpec tree for SwarmState: particle-indexed arrays sharded on
    dim 0, global scalars/vectors replicated."""
    sh = lambda spec: NamedSharding(mesh, spec)
    return SwarmState(
        positions=sh(P(axis)),
        velocities=sh(P(axis)),
        p_best_pos=sh(P(axis)),
        p_best_val=sh(P(axis)),
        g_best_pos=sh(P()),
        g_best_val=sh(P()),
        g_prev_val=sh(P()),
        g_improvements=sh(P()),
        w_inertia=sh(P()),
        iteration=sh(P()),
        done=sh(P()),
    )


def history_sharding(mesh: Mesh, axis: str = "swarm") -> PsoHistory:
    sh = lambda spec: NamedSharding(mesh, spec)
    return PsoHistory(
        positions=sh(P(None, axis)),
        velocities=sh(P(None, axis)),
        fitness=sh(P(None, axis)),
        mean_mse=sh(P()),
        g_best_val=sh(P()),
        g_best_dummy=sh(P()),
        active=sh(P()),
    )


def make_sharded_optimize(
    mesh: Mesh,
    fitness_fn: Callable[[jax.Array], jax.Array],
    hp: PsoConfig,
    axis: str = "swarm",
):
    """jit-compiled optimize with the swarm axis sharded over `mesh`.

    Returns run(key[, init_positions]) -> (final_state, history, init_state).
    """
    out_shardings = (
        swarm_state_sharding(mesh, axis),
        history_sharding(mesh, axis),
        swarm_state_sharding(mesh, axis),
    )

    run = jax.jit(
        lambda key: optimize(key, fitness_fn, hp),
        out_shardings=out_shardings,
    )
    # built ONCE: a jit wrapper constructed inside run_seeded would retrace
    # (and, cache-cold, recompile) the identical program on every seeded call
    seeded = jax.jit(
        lambda k, p: optimize(k, fitness_fn, hp, init_positions=p),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(axis))),
        out_shardings=out_shardings,
    )

    def run_seeded(key, init_positions=None):
        if init_positions is None:
            return run(key)
        return seeded(key, init_positions)

    return run_seeded


def make_sharded_discovery_runner(
    mesh: Mesh,
    cnn_def,
    hp: PsoConfig,
    control: str = "optimize_out_training",
    threshold: float = 0.0,
    eps: float = 0.1,
    axis: str = "swarm",
):
    """Sharded discovery with params as ARGUMENTS (pso/runner.py pattern):
    run(key, gen_params, gen_state, cnn_params, cnn_state, class_idx) →
    (final_state, history, init_state) with the particle axis sharded over
    `mesh`. ONE compile serves every class and every model of the same
    shapes — a per-class closure over make_sharded_optimize would pay one
    full XLA compile per class."""
    from gan_discovery_pso_tpu.pso.fitness import apply_discovery_fitness

    out_shardings = (
        swarm_state_sharding(mesh, axis),
        history_sharding(mesh, axis),
        swarm_state_sharding(mesh, axis),
    )

    @functools.partial(jax.jit, out_shardings=out_shardings)
    def run(key, gen_params, gen_state, cnn_params, cnn_state, class_idx):
        def fitness(positions):
            return apply_discovery_fitness(
                positions, gen_params, gen_state, cnn_params, cnn_state,
                cnn_def, class_idx, control=control, threshold=threshold,
                eps=eps,
            )

        return optimize(key, fitness, hp)

    return run


def make_batched_sharded_discovery_runner(
    mesh: Mesh,
    cnn_def,
    hp: PsoConfig,
    control: str = "optimize_out_training",
    threshold: float = 0.0,
    eps: float = 0.1,
    dtype=None,
    class_axis: str = "class",
    swarm_axis: str = "swarm",
):
    """2-D-mesh discovery: ALL class swarms in lockstep (the flagship
    batched sweep, pso/runner.py:51-91) with the class axis data-parallel
    over mesh axis `class_axis` AND each swarm's particle axis sharded over
    `swarm_axis`. Swarms never communicate (reference runs them as a host
    loop, src/training/pso_discovery.py:174), so the only collective is each
    class's per-iteration global-best reduction, which GSPMD lowers to an
    all-reduce over `swarm_axis` only — `class_axis` stays collective-free.

    run(keys[C], gen_params, gen_state, cnn_params, cnn_state, class_idxs[C])
    → vmapped (finals, histories, inits) with a leading class axis; particle
    arrays come back sharded P(class, swarm)."""
    from gan_discovery_pso_tpu.pso.fitness import apply_discovery_fitness

    sh = lambda spec: NamedSharding(mesh, spec)
    state_sh = SwarmState(
        positions=sh(P(class_axis, swarm_axis)),
        velocities=sh(P(class_axis, swarm_axis)),
        p_best_pos=sh(P(class_axis, swarm_axis)),
        p_best_val=sh(P(class_axis, swarm_axis)),
        g_best_pos=sh(P(class_axis)),
        g_best_val=sh(P(class_axis)),
        g_prev_val=sh(P(class_axis)),
        g_improvements=sh(P(class_axis)),
        w_inertia=sh(P(class_axis)),
        iteration=sh(P(class_axis)),
        done=sh(P(class_axis)),
    )
    # history arrays gain a leading class axis over [iters, N, d]
    hist_sh = PsoHistory(
        positions=sh(P(class_axis, None, swarm_axis)),
        velocities=sh(P(class_axis, None, swarm_axis)),
        fitness=sh(P(class_axis, None, swarm_axis)),
        mean_mse=sh(P(class_axis)),
        g_best_val=sh(P(class_axis)),
        g_best_dummy=sh(P(class_axis)),
        active=sh(P(class_axis)),
    )
    out_shardings = (state_sh, hist_sh, state_sh)

    @functools.partial(jax.jit, out_shardings=out_shardings)
    def run(keys, gen_params, gen_state, cnn_params, cnn_state, class_idxs):
        if dtype is not None:
            cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
            gen_params_, gen_state_ = cast(gen_params), cast(gen_state)
            cnn_params_, cnn_state_ = cast(cnn_params), cast(cnn_state)
        else:
            gen_params_, gen_state_ = gen_params, gen_state
            cnn_params_, cnn_state_ = cnn_params, cnn_state

        def one(key, class_idx):
            def fitness(positions):
                return apply_discovery_fitness(
                    positions, gen_params_, gen_state_, cnn_params_,
                    cnn_state_, cnn_def, class_idx, control=control,
                    threshold=threshold, eps=eps, dtype=dtype,
                )

            return optimize(key, fitness, hp)

        return jax.vmap(one, in_axes=(0, 0))(keys, class_idxs)

    return run


def make_multi_swarm_optimize(
    fitness_fn_batched: Callable[[jax.Array, jax.Array], jax.Array],
    hp: PsoConfig,
    n_swarms: int,
    mesh: Mesh | None = None,
    axis: str = "swarm",
):
    """Independent swarms (one per IiD class / OoD patient) as a vmapped
    leading axis, optionally sharded across chips.

    The reference runs these as a sequential host loop
    (src/training/pso_discovery.py:174) / bash sweep
    (src/bash/start_pso_optimize.sh:3-16); swarms never communicate, so the
    class axis is embarrassingly parallel (SURVEY.md §5.8 multi-swarm mode).

    fitness_fn_batched(swarm_idx, positions[N,d]) -> [N] — closes over
    per-swarm assessor params stacked on a leading axis.
    """

    def one(idx, key):
        return optimize(key, lambda pos: fitness_fn_batched(idx, pos), hp)

    vrun = jax.vmap(one, in_axes=(0, 0))

    if mesh is None:
        return jax.jit(
            lambda keys: vrun(jnp.arange(n_swarms), keys)
        )

    sh = lambda spec: NamedSharding(mesh, spec)
    state_sh = jax.tree.map(lambda _: sh(P(axis)), swarm_state_sharding(mesh, axis))
    hist_sh = jax.tree.map(lambda _: sh(P(axis)), history_sharding(mesh, axis))
    return jax.jit(
        lambda keys: vrun(jnp.arange(n_swarms), keys),
        in_shardings=(sh(P(axis)),),
        out_shardings=(state_sh, hist_sh, state_sh),
    )
