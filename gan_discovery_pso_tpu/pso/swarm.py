"""Tensorized particle swarm: the whole swarm is one pytree of arrays and a
PSO iteration is one fused device program.

The reference keeps a Python list of `Particle` objects and walks it four
times per iteration on the host, calling the fitness at BATCH SIZE 1 per
particle (reference src/pso/util_pso.py:24-193, 114-133), with two
host↔device transfers per particle per iteration
(src/pso/util_discovery.py:58-82). Here:

    SwarmState = positions[N,d], velocities[N,d], p_best_pos[N,d],
                 p_best_val[N], g_best_pos[d], g_best_val[], ...

and `optimize()` is a single jitted `lax.scan` over iterations in which the
fitness (generator forward + assessor forward over ALL particles as one MXU
batch), the personal/global best updates, the velocity/position math, and
the mean-pairwise-distance diagnostic all fuse. Early stopping is an
active-mask on the scan carry, preserving the reference's exact break
semantics (util_pso.py:186-188) with static shapes.

Reference semantics reproduced exactly (SURVEY.md §3.1):
- velocity naming swap: the `w_cognitive` term couples the GLOBAL best and
  the `w_social` term couples the PERSONAL best (util_pso.py:43-49);
- r1, r2 are scalars per particle-update, not per-dimension (:45,47);
- personal best evaluated BEFORE the move; global best from personal bests;
  `g_best_val` appends only on improvement and the first improvement
  overwrites the initial inf (:135-151);
- early stop requires i > 2 AND ≥3 recorded improvements AND
  |g[-1] − g[-2]| < tol (:186-188);
- inertia schedule w ← 0.99·w applied from iteration 2 when enabled
  (:72-74, :178-179);
- init: pos ~ N(0,1)^d, vel = (N(0,1)−0.5)/10 (:30-31).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.core.config import PsoConfig


class SwarmState(NamedTuple):
    positions: jax.Array  # [N, d]
    velocities: jax.Array  # [N, d]
    p_best_pos: jax.Array  # [N, d]
    p_best_val: jax.Array  # [N]
    g_best_pos: jax.Array  # [d]
    g_best_val: jax.Array  # [] current best (inf before first improvement)
    g_prev_val: jax.Array  # [] previous appended best (for the tol check)
    g_improvements: jax.Array  # [] int32 == len(reference g_best_val list)
    w_inertia: jax.Array  # [] scalar, mutable under schedule_inertia
    iteration: jax.Array  # [] int32, 1-based like the reference loop
    done: jax.Array  # [] bool early-stop latch


class PsoHistory(NamedTuple):
    """Per-iteration trajectory records ≡ the reference's per-particle
    DataFrame pickles (util_pso.py:159-165) and history dict (:173,182-184),
    as dense arrays: history rows past the stop iteration repeat the final
    state (masked scan)."""

    positions: jax.Array  # [iters, N, d] after each move
    velocities: jax.Array  # [iters, N, d] after each move
    fitness: jax.Array  # [iters, N] fitness evaluated at pre-move positions
    mean_mse: jax.Array  # [iters] mean pairwise Euclidean distance
    g_best_val: jax.Array  # [iters] best value after the iteration
    g_best_dummy: jax.Array  # [iters] per-iteration candidate (:151)
    active: jax.Array  # [iters] bool — False once early-stopped


def swarm_init(
    key: jax.Array, n_particles: int, dim_space: int, w_inertia: float
) -> SwarmState:
    """Random init matching Particle.__init__ (util_pso.py:30-37)."""
    kp, kv = jax.random.split(key)
    positions = jax.random.normal(kp, (n_particles, dim_space), jnp.float32)
    velocities = (jax.random.normal(kv, (n_particles, dim_space), jnp.float32) - 0.5) / 10.0
    return _state_from_positions(positions, velocities, w_inertia)


def swarm_init_from_positions(
    key: jax.Array, positions: jax.Array, w_inertia: float
) -> SwarmState:
    """Encoder-seeded init (pso_inverter): positions supplied (one per OoD
    slice, util_pso.py:93-112), velocities still random."""
    velocities = (jax.random.normal(key, positions.shape, jnp.float32) - 0.5) / 10.0
    return _state_from_positions(positions.astype(jnp.float32), velocities, w_inertia)


def _state_from_positions(positions, velocities, w_inertia) -> SwarmState:
    n, d = positions.shape
    return SwarmState(
        positions=positions,
        velocities=velocities,
        p_best_pos=positions,
        p_best_val=jnp.full((n,), jnp.inf, jnp.float32),
        g_best_pos=jnp.zeros((d,), jnp.float32),
        g_best_val=jnp.asarray(jnp.inf, jnp.float32),
        g_prev_val=jnp.asarray(jnp.inf, jnp.float32),
        g_improvements=jnp.asarray(1, jnp.int32),  # reference starts [inf]
        w_inertia=jnp.asarray(w_inertia, jnp.float32),
        iteration=jnp.asarray(1, jnp.int32),
        done=jnp.asarray(False),
    )


def mean_pairwise_distance(positions: jax.Array) -> jax.Array:
    """Mean Euclidean distance over unordered particle pairs — the reference's
    O(N²) host 'mse' diagnostic (util_pso.py:76-86) as one device reduction.
    (Mean over off-diagonal entries equals mean over unordered pairs.)"""
    sq = jnp.sum(positions * positions, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        positions, positions.T, precision=jax.lax.Precision.HIGHEST
    )
    d2 = jnp.maximum(d2, 0.0)
    n = positions.shape[0]
    mask = 1.0 - jnp.eye(n, dtype=positions.dtype)
    return jnp.sum(jnp.sqrt(d2) * mask) / (n * (n - 1))


def pso_iteration(
    state: SwarmState,
    fitness_vals: jax.Array,
    r1: jax.Array,
    r2: jax.Array,
    hp: PsoConfig,
) -> SwarmState:
    """One PSO update given already-evaluated fitness at current positions.

    r1, r2: [N] uniforms (scalar per particle, reference util_pso.py:45-47).
    Pure and shape-static; fuses with the fitness evaluation under jit.
    """
    # 1) personal best (update_personal_best, :114-133)
    improved = fitness_vals < state.p_best_val
    p_best_val = jnp.where(improved, fitness_vals, state.p_best_val)
    p_best_pos = jnp.where(improved[:, None], state.positions, state.p_best_pos)

    # 2) global best (update_global_best, :135-151)
    cand_idx = jnp.argmin(p_best_val)
    cand_val = p_best_val[cand_idx]
    g_improved = cand_val < state.g_best_val
    first = jnp.isinf(state.g_best_val)
    g_best_val = jnp.where(g_improved, cand_val, state.g_best_val)
    g_best_pos = jnp.where(g_improved, p_best_pos[cand_idx], state.g_best_pos)
    # list semantics: overwrite inf keeps length; real improvement appends
    g_prev_val = jnp.where(g_improved & ~first, state.g_best_val, state.g_prev_val)
    g_improvements = state.g_improvements + jnp.where(g_improved & ~first, 1, 0)

    # 3) inertia schedule (update_inertia, :72-74; applied when i > 1, :178)
    w = state.w_inertia
    if hp.schedule_inertia:
        w = jnp.where(state.iteration > 1, 0.99 * w, w)

    # 4) move (update_velocity/update_position, :39-50) — NOTE the reference's
    # naming swap: w_cognitive couples g_best, w_social couples p_best.
    vel = (
        w * state.velocities
        + hp.w_cognitive * r1[:, None] * (g_best_pos[None, :] - state.positions)
        + hp.w_social * r2[:, None] * (p_best_pos - state.positions)
    )
    pos = state.positions + vel

    # 5) early-stop latch (checked after the move, :186-188)
    tol_hit = jnp.abs(g_best_val - g_prev_val) < hp.tolerance
    stop = (
        (state.iteration > 2) & (g_improvements > 2) & tol_hit
        if hp.early_stopping
        else jnp.asarray(False)
    )

    return SwarmState(
        positions=pos,
        velocities=vel,
        p_best_pos=p_best_pos,
        p_best_val=p_best_val,
        g_best_pos=g_best_pos,
        g_best_val=g_best_val,
        g_prev_val=g_prev_val,
        g_improvements=g_improvements,
        w_inertia=w,
        iteration=state.iteration + 1,
        done=state.done | stop,
    )


def pso_iteration_pallas(
    state: SwarmState,
    fitness_vals: jax.Array,
    r1: jax.Array,
    r2: jax.Array,
    hp: PsoConfig,
) -> SwarmState:
    """pso_iteration with the update chain executed as one fused Pallas TPU
    kernel (ops/pallas/swarm_update.py); equality asserted in
    tests/test_pallas.py. Inertia/early-stop bookkeeping stays in XLA."""
    from gan_discovery_pso_tpu.ops.pallas.swarm_update import pso_update_pallas

    w = state.w_inertia
    if hp.schedule_inertia:
        w = jnp.where(state.iteration > 1, 0.99 * w, w)
    (pos, vel, pbp, pbv, gbp, gbv, gpv, g_appended) = pso_update_pallas(
        state.positions, state.velocities, state.p_best_pos, state.p_best_val,
        fitness_vals, r1, r2, state.g_best_pos, state.g_best_val,
        state.g_prev_val, w, hp.w_cognitive, hp.w_social,
        # CPU has no Mosaic lowering; run the kernel interpreted there so the
        # use_pallas API works uniformly (native on TPU)
        interpret=jax.default_backend() == "cpu",
    )
    g_improvements = state.g_improvements + g_appended.astype(jnp.int32)
    tol_hit = jnp.abs(gbv - gpv) < hp.tolerance
    stop = (
        (state.iteration > 2) & (g_improvements > 2) & tol_hit
        if hp.early_stopping
        else jnp.asarray(False)
    )
    return SwarmState(pos, vel, pbp, pbv, gbp, gbv, gpv, g_improvements,
                      w, state.iteration + 1, state.done | stop)


def optimize(
    key: jax.Array,
    fitness_fn: Callable[[jax.Array], jax.Array],
    hp: PsoConfig,
    init_positions: jax.Array | None = None,
    init_state: SwarmState | None = None,
    n_iterations: int | None = None,
    use_pallas: bool = False,
    unroll: int = 1,
) -> tuple[SwarmState, PsoHistory, SwarmState]:
    """Full swarm optimization as ONE jitted device program.

    fitness_fn: positions [N,d] → values [N] (already batched over the swarm;
    typically generator+assessor forwards — see pso/fitness.py).

    init_state resumes a checkpointed swarm (its `iteration` keeps the RNG
    stream aligned, so chunked/resumed runs reproduce the single-shot
    trajectory — see optimize_resumable).

    Returns (final_state, history, start_state). `last_iteration(history)`
    recovers the reference's returned iteration count.
    """
    init_key, iter_key = jax.random.split(key)
    if init_state is not None:
        state0 = init_state
    elif init_positions is not None:
        state0 = swarm_init_from_positions(init_key, init_positions, hp.w_inertia)
    else:
        state0 = swarm_init(init_key, hp.n_particles, hp.dim_space, hp.w_inertia)
    n_iters = hp.n_iterations if n_iterations is None else n_iterations
    iteration_fn = pso_iteration_pallas if use_pallas else pso_iteration

    def step(carry, _):
        state = carry
        k = jax.random.fold_in(iter_key, state.iteration)
        k1, k2 = jax.random.split(k)
        n = state.positions.shape[0]
        r1 = jax.random.uniform(k1, (n,), jnp.float32)
        r2 = jax.random.uniform(k2, (n,), jnp.float32)

        fitness_vals = fitness_fn(state.positions)
        new_state = iteration_fn(state, fitness_vals, r1, r2, hp)
        # candidate value this iteration (g_best_val_dummy, :151)
        dummy = jnp.min(new_state.p_best_val)
        mmse = mean_pairwise_distance(new_state.positions)

        # masked update: once done, freeze the carry (reference breaks out)
        out_state = jax.tree.map(
            lambda new, old: jnp.where(state.done, old, new), new_state, state
        )
        rec = PsoHistory(
            positions=out_state.positions,
            velocities=out_state.velocities,
            fitness=fitness_vals,
            mean_mse=jnp.where(state.done, jnp.nan, mmse),
            g_best_val=out_state.g_best_val,
            g_best_dummy=jnp.where(state.done, jnp.nan, dummy),
            active=~state.done,
        )
        return out_state, rec

    # unroll>1 trades program size for less loop bookkeeping; semantics are
    # identical (the RNG folds in the state's own iteration counter)
    final_state, history = jax.lax.scan(
        step, state0, None, length=n_iters, unroll=unroll
    )
    return final_state, history, state0


optimize_jit = jax.jit(
    optimize,
    static_argnames=("fitness_fn", "hp", "n_iterations", "use_pallas", "unroll"),
)


def optimize_resumable(
    key: jax.Array,
    fitness_fn: Callable[[jax.Array], jax.Array],
    hp: PsoConfig,
    checkpointer=None,
    checkpoint_every: int = 10,
    tag: str = "swarm",
    init_positions: jax.Array | None = None,
):
    """Preemption-safe optimize: runs in chunks of `checkpoint_every`
    iterations, persisting the full swarm state between chunks (SURVEY.md
    §5.3: deterministic restart from (step, PRNG key, swarm state)).

    The per-iteration RNG is derived from the state's own iteration counter,
    so a resumed run reproduces the single-shot trajectory exactly.
    Returns (final_state, history, init_state) like optimize().
    """
    from gan_discovery_pso_tpu.core.checkpoint import restore_into

    state = None
    if checkpointer is not None:
        saved = checkpointer.try_load(f"checkpoint_{tag}.msgpack")
        if saved is not None:
            plain = saved["state"]
            if isinstance(plain, SwarmState):
                state = plain
            else:
                # Typed restore: field-name keyed, never dict-order dependent.
                template = _state_from_positions(
                    jnp.zeros((1, 1), jnp.float32),
                    jnp.zeros((1, 1), jnp.float32),
                    hp.w_inertia,
                )
                state = restore_into(template, plain)

    run = jax.jit(
        lambda k, s: optimize(
            k, fitness_fn, hp, init_state=s, n_iterations=checkpoint_every
        )
    )

    if state is None:
        # Materialize the initial state exactly as optimize() would: the init
        # key is the first half of the top-level split (iter RNG uses the
        # second half via fold_in on the state's iteration counter).
        init_key, _ = jax.random.split(key)
        if init_positions is not None:
            state = swarm_init_from_positions(init_key, init_positions, hp.w_inertia)
        else:
            state = swarm_init(init_key, hp.n_particles, hp.dim_space, hp.w_inertia)
    init_state = state

    hist_parts = []
    done_iters = int(state.iteration) - 1
    while done_iters < hp.n_iterations and not bool(state.done):
        chunk = min(checkpoint_every, hp.n_iterations - done_iters)
        if chunk != checkpoint_every:
            state, hist = optimize(
                key, fitness_fn, hp, init_state=state, n_iterations=chunk
            )[:2]
        else:
            state, hist = run(key, state)[:2]
        hist_parts.append(hist)
        done_iters += chunk
        if checkpointer is not None:
            checkpointer.save_every_epoch(tag, done_iters, state._asdict())

    if not hist_parts:
        # Resumed an already-finished run: return an empty (0-iteration)
        # history instead of concatenating nothing.
        _, history, _ = optimize(key, fitness_fn, hp, init_state=state, n_iterations=0)
        return state, history, init_state

    history = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *hist_parts)
    return state, history, init_state


def last_iteration(history: PsoHistory, done=None, state_iteration=None) -> int:
    """The reference's returned `i`: n_iterations+1 on natural exit, else the
    iteration whose tolerance check broke the loop (util_pso.py:174-189).

    In the masked scan the iteration that latches `done` is itself recorded
    active, so on early stop the active count IS the breaking iteration.
    Pass the final state's `done` flag to disambiguate the boundary case
    where the latch fires ON the last scheduled iteration (every history
    row is active but the reference still returns i, not i+1).

    A 0-row history (optimize_resumable resuming an already-finished run)
    carries no signal; pass `state_iteration` so the answer can come from
    the state's own counter, which sits at i+1 after iteration i executes."""
    import numpy as np

    active = np.asarray(history.active)
    if active.size == 0:
        if state_iteration is None:
            return 0
        it = int(np.asarray(state_iteration))
        # reference returns i on an early-stop break, n+1 on natural exit
        return it - 1 if (done is not None and bool(np.asarray(done))) else it
    n_act = int(active.sum())
    if not bool(active.all()):
        return n_act
    if done is not None and bool(np.asarray(done)):
        return n_act  # early stop latched on the final iteration
    return n_act + 1


@dataclasses.dataclass
class SwarmResult:
    """Host-side unpack of optimize()'s (state, history, init_state) with the
    reference's artifact contract (see pso/io.py for the pickle writers)."""

    state: SwarmState
    history: PsoHistory
    init_state: SwarmState
    hp: PsoConfig

    @property
    def g_best_pos(self):
        return self.state.g_best_pos

    @property
    def g_best_val(self):
        return self.state.g_best_val

    @property
    def last_iteration(self) -> int:
        return last_iteration(
            self.history, done=self.state.done,
            state_iteration=self.state.iteration,
        )

    def _active_count(self) -> int:
        import numpy as np

        return int(np.asarray(self.history.active).sum())

    def particle_trajectories(self):
        """[n_active+1, N, d]: init positions + post-move positions per
        iteration — the exact contents of Particle.history
        (util_pso.py:34-41)."""
        import numpy as np

        n_act = self._active_count()
        pos = np.asarray(self.history.positions)[:n_act]
        return np.concatenate([np.asarray(self.init_state.positions)[None], pos], axis=0)

    def velocity_trajectories(self):
        """[n_active+1, N, d] ≡ Particle.history_vel (util_pso.py:36-37,50)."""
        import numpy as np

        n_act = self._active_count()
        vel = np.asarray(self.history.velocities)[:n_act]
        return np.concatenate([np.asarray(self.init_state.velocities)[None], vel], axis=0)

    def history_dict(self):
        """≡ the reference optimize() history dict
        {'mean_mse': [...], 'global_best_val': [...]} (util_pso.py:173,182-184)
        plus the per-iteration dummy series (:151)."""
        import numpy as np

        n_act = self._active_count()
        return {
            "mean_mse": list(np.asarray(self.history.mean_mse)[:n_act]),
            "global_best_val": list(np.asarray(self.history.g_best_val)[:n_act]),
            "global_best_dummy": list(np.asarray(self.history.g_best_dummy)[:n_act]),
        }
