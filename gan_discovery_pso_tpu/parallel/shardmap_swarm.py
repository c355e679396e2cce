"""Explicitly-collectived sharded swarm via shard_map.

`parallel.make_sharded_optimize` lets GSPMD place the global-best reduction
automatically. This module is the hand-placed alternative (SURVEY.md §5.8's
exact recipe): particles shard over mesh axis "swarm"; each iteration does

    local fitness → local personal-best → local argmin
    → `lax.pmin` of the candidate value over the axis (one ICI all-reduce)
    → one-hot-masked `lax.psum` to broadcast the winning position
    → local velocity/position update.

Exactly THREE collectives per iteration (two pmin + one psum), each a few hundred bytes — ICI
latency-bound, trivially scalable. Trajectories are deterministic and match
the single-device optimize bit-for-bit up to fp32 reassociation (the
per-particle r1/r2 are derived from the global key and sliced per shard).
The early-stop latch (hp.early_stopping + hp.tolerance) is implemented with
the same done-mask as pso/swarm.py; all latch operands are replicated
scalars, so every shard freezes on the same iteration.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.pso.swarm import swarm_init, swarm_init_from_positions

try:  # jax>=0.6 moved shard_map to the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_shardmap_optimize(
    mesh: Mesh,
    fitness_fn: Callable[[jax.Array], jax.Array],
    hp: PsoConfig,
    axis: str = "swarm",
):
    """Returns run(key[, init_positions]) -> (final local-state pytree with
    particle arrays globally shaped, g_best trace [iters]).

    n_particles must divide the mesh axis size evenly."""
    n_dev = mesh.shape[axis]
    if hp.n_particles % n_dev:
        raise ValueError(f"n_particles {hp.n_particles} % mesh {n_dev} != 0")
    n_loc = hp.n_particles // n_dev

    def body(iter_key, positions, velocities, p_best_pos, p_best_val, g_best_pos, g_best_val):
        """One device's shard: positions [n_loc, d] etc."""
        rank = jax.lax.axis_index(axis)

        def step(carry, it):
            old = carry
            pos, vel, pbp, pbv, gbp, gbv, gpv, gimp, w, done = carry
            k = jax.random.fold_in(iter_key, it)
            k1, k2 = jax.random.split(k)
            # global r streams sliced per shard → matches unsharded optimize
            r1 = jax.lax.dynamic_slice(
                jax.random.uniform(k1, (hp.n_particles,), jnp.float32),
                (rank * n_loc,), (n_loc,))
            r2 = jax.lax.dynamic_slice(
                jax.random.uniform(k2, (hp.n_particles,), jnp.float32),
                (rank * n_loc,), (n_loc,))

            fvals = fitness_fn(pos)  # local shard forwards

            improved = fvals < pbv
            pbv = jnp.where(improved, fvals, pbv)
            pbp = jnp.where(improved[:, None], pos, pbp)

            # global best: pmin over the axis + one-hot psum broadcast
            loc_idx = jnp.argmin(pbv)
            loc_val = pbv[loc_idx]
            best_val = jax.lax.pmin(loc_val, axis)  # ICI all-reduce #1
            is_winner = (loc_val == best_val)
            # ties: lowest rank wins, matching a global argmin's index order
            winner_rank = jax.lax.pmin(
                jnp.where(is_winner, rank, jnp.iinfo(jnp.int32).max), axis
            )
            contrib = jnp.where(
                (rank == winner_rank), pbp[loc_idx], jnp.zeros_like(pbp[0])
            )
            best_pos = jax.lax.psum(contrib, axis)  # ICI all-reduce #2

            # g_best list bookkeeping (matches pso/swarm.py pso_iteration):
            # overwriting the initial inf keeps the list length; a real
            # improvement appends and shifts the previous value.
            g_improved = best_val < gbv
            first = jnp.isinf(gbv)
            gpv = jnp.where(g_improved & ~first, gbv, gpv)
            gimp = gimp + jnp.where(g_improved & ~first, 1, 0)
            gbv = jnp.where(g_improved, best_val, gbv)
            gbp = jnp.where(g_improved, best_pos, gbp)

            if hp.schedule_inertia:
                w = jnp.where(it > 1, 0.99 * w, w)
            vel = (
                w * vel
                + hp.w_cognitive * r1[:, None] * (gbp[None, :] - pos)
                + hp.w_social * r2[:, None] * (pbp - pos)
            )
            pos = pos + vel

            # early-stop latch (util_pso.py:186-188); all operands are
            # replicated scalars so every shard latches identically
            if hp.early_stopping:
                stop = (it > 2) & (gimp > 2) & (jnp.abs(gbv - gpv) < hp.tolerance)
            else:
                stop = jnp.asarray(False)
            new = (pos, vel, pbp, pbv, gbp, gbv, gpv, gimp, w, done | stop)
            # freeze the carry once done (reference breaks out of the loop);
            # the iteration that latches `done` still records, like optimize()
            was_done = old[-1]
            out = jax.tree.map(lambda n, o: jnp.where(was_done, o, n), new, old)
            return out, out[5]

        init = (positions, velocities, p_best_pos, p_best_val, g_best_pos,
                g_best_val, jnp.asarray(jnp.inf, jnp.float32),
                jnp.asarray(1, jnp.int32),
                jnp.asarray(hp.w_inertia, jnp.float32), jnp.asarray(False))
        (pos, vel, pbp, pbv, gbp, gbv, _gpv, _gimp, _w, _done), trace = jax.lax.scan(
            step, init, jnp.arange(1, hp.n_iterations + 1)
        )
        return pos, vel, pbp, pbv, gbp, gbv, trace

    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def run(key, init_positions=None):
        init_key, iter_key = jax.random.split(key)
        if init_positions is not None:
            st = swarm_init_from_positions(init_key, init_positions, hp.w_inertia)
        else:
            st = swarm_init(init_key, hp.n_particles, hp.dim_space, hp.w_inertia)
        pos, vel, pbp, pbv, gbp, gbv, trace = mapped(
            iter_key, st.positions, st.velocities, st.p_best_pos,
            st.p_best_val, st.g_best_pos, st.g_best_val,
        )
        return {
            "positions": pos, "velocities": vel,
            "p_best_pos": pbp, "p_best_val": pbv,
            "g_best_pos": gbp, "g_best_val": gbv,
            "g_best_trace": trace,
        }

    return run
