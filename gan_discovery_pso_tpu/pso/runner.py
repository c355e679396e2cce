"""Reusable compiled discovery runners: model params as ARGUMENTS.

`optimize(key, fitness_fn, hp)` closes over model params, so every new set
of weights (a different trained G, each per-patient fine-tuned assessor in
the start_pso_optimize sweep) bakes new constants into the jaxpr and pays a
fresh compile/executable-load. These runners take the params as runtime
arguments instead: ONE executable per (shape, hp) serves every model —
sweeping 10 patients costs one compile, not ten.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.models.resnet import ResNetDef
from gan_discovery_pso_tpu.pso.fitness import (
    OPTIMIZE_IN,
    OPTIMIZE_OUT,
    apply_discovery_fitness,
)
from gan_discovery_pso_tpu.pso.swarm import optimize


def resolve_fitness_chunk(value, n_particles: int) -> int | None:
    """Resolve the `trainer_pso.fitness_chunk` config knob to a chunk size.

    'auto' (the shipped default, configs/dcgan_mnist.yaml) or an absent key
    enables the measured production default: chunk 64 for swarms of >=256
    particles — the bench_ab tp_chunk result (+49% evals/s at 8c x 256p with
    bit-identical g_best, docs/BENCH.md round-4 table) — and no chunking for
    small swarms, where the whole swarm already fits the HBM streaming size.
    Explicit int → that chunk (validated); 0/false/null → disabled.
    """
    if value in (None, "auto"):
        return 64 if n_particles >= 256 and n_particles % 64 == 0 else None
    if not value:
        return None
    v = int(value)
    if v <= 0 or n_particles % v:
        raise ValueError(
            f"fitness_chunk={v} must be positive and divide "
            f"n_particles={n_particles}")
    return v if v < n_particles else None


def select_program(program: str, hp: PsoConfig, fast_math: bool) -> int:
    """Resolve `trainer_pso.program` to a chunk length (0 = monolithic).

    'auto' (the shipped default): fp32 HIGHEST-precision 50-iteration
    monoliths compile superlinearly on the axon XLA:TPU backend (316-506 s
    cold vs 38 s for the trajectory-identical 10-iteration chunk chain —
    docs/BENCH.md compile_bisect + round-5), so parity runs default to
    chunked programs; fast-math (bf16) programs compile in seconds and keep
    the monolith, as do early-stopping runs (the chunked host early-exit
    truncates history at chunk granularity). 'chunked'/'monolithic' force.
    Chunking requires 10 | n_iterations.
    """
    if program not in ("auto", "chunked", "monolithic"):
        raise ValueError(f"trainer_pso.program={program!r} — expected "
                         "auto | chunked | monolithic")
    chunk = 10
    if program == "monolithic" or hp.n_iterations % chunk or hp.n_iterations <= chunk:
        return 0
    if program == "chunked":
        return chunk
    return 0 if (fast_math or hp.early_stopping) else chunk


def make_discovery_runner(
    cnn_def: ResNetDef,
    hp: PsoConfig,
    control: str = OPTIMIZE_OUT,
    threshold: float = 0.0,
    eps: float = 0.1,
):
    """run(key, gen_params, gen_state, cnn_params, cnn_state, class_idx)
    → (final_state, history, init_state). All model pytrees are jit
    ARGUMENTS; swapping weights does not recompile."""

    @jax.jit
    def run(key, gen_params, gen_state, cnn_params, cnn_state, class_idx):
        def fitness(positions):
            return apply_discovery_fitness(
                positions, gen_params, gen_state, cnn_params, cnn_state,
                cnn_def, class_idx, control=control, threshold=threshold,
                eps=eps,
            )

        return optimize(key, fitness, hp)

    return run


def make_batched_discovery_runner(
    cnn_def: ResNetDef,
    hp: PsoConfig,
    control: str = OPTIMIZE_OUT,
    threshold: float = 0.0,
    eps: float = 0.1,
    dtype=None,
    unroll: int = 1,
    rescale_impl: str = "xla",
    fitness_chunk: int | None = None,
    use_pallas: bool = False,
    stack: int | None = None,
):
    """The flagship batched multi-class sweep with params as ARGUMENTS:
    run(keys[C], gen_params, gen_state, cnn_params, cnn_state, class_idxs[C])
    → vmapped (finals, histories, inits) with a leading class axis.

    stack=S fuses S INDEPENDENT class-sweeps into one program: keys gain a
    leading stack axis ([S, C]) and every fitness iteration batches
    S x n_classes x n_particles forwards. Swarms stay fully independent
    (vmap axes only — the reference's swarms never communicate, SURVEY.md
    §5.8); member s reproduces exactly what the unstacked runner computes
    from keys[s]. This is the throughput geometry for sweeps that keep many
    optimizes in flight anyway (bench.py flagship): bigger per-dispatch MXU
    batches amortize the small-kernel overhead between matmuls.

    One compile serves every model of the same shapes (the former vmapped
    path in pipelines/pso_discovery.py closed over params and recompiled per
    model). dtype=jnp.bfloat16 runs the model forwards in MXU-native
    precision (cast once per call, fp32 swarm math) — wrap the first call in
    ops.precision.fast_math() or rely on the cast params alone.

    fitness_chunk: evaluate each swarm's fitness in sequential chunks of
    this many particles INSIDE the program (lax.map over reshaped chunks;
    per-particle fitness is independent, so values are identical). Under the
    class vmap the map body still sees n_classes x chunk images at once —
    size it so that product keeps assessor residual activations at the HBM
    streaming size (the throughput-mode MFU fix, docs/BENCH.md "where the
    time goes"). Must divide hp.n_particles. use_pallas selects the fused
    Pallas swarm-update iteration (pso/swarm.py pso_iteration_pallas)."""
    if fitness_chunk is not None and hp.n_particles % fitness_chunk:
        raise ValueError(
            f"fitness_chunk={fitness_chunk} must divide n_particles={hp.n_particles}")

    @jax.jit
    def run(keys, gen_params, gen_state, cnn_params, cnn_state, class_idxs):
        if dtype is not None:
            cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
            gen_params_, gen_state_ = cast(gen_params), cast(gen_state)
            cnn_params_, cnn_state_ = cast(cnn_params), cast(cnn_state)
        else:
            gen_params_, gen_state_ = gen_params, gen_state
            cnn_params_, cnn_state_ = cnn_params, cnn_state

        def one(key, class_idx):
            def fitness_body(positions):
                return apply_discovery_fitness(
                    positions, gen_params_, gen_state_, cnn_params_, cnn_state_,
                    cnn_def, class_idx, control=control, threshold=threshold,
                    eps=eps, dtype=dtype, rescale_impl=rescale_impl,
                )

            if fitness_chunk and fitness_chunk < hp.n_particles:
                def fitness(positions):
                    xs = positions.reshape(
                        -1, fitness_chunk, positions.shape[1])
                    return jax.lax.map(fitness_body, xs).reshape(-1)
            else:
                fitness = fitness_body

            return optimize(key, fitness, hp, unroll=unroll,
                            use_pallas=use_pallas)

        per_class = jax.vmap(one, in_axes=(0, 0))
        if stack:
            return jax.vmap(per_class, in_axes=(0, None))(keys, class_idxs)
        return per_class(keys, class_idxs)

    return run


def make_chunked_batched_discovery_runner(
    cnn_def: ResNetDef,
    hp: PsoConfig,
    chunk: int,
    control: str = OPTIMIZE_OUT,
    threshold: float = 0.0,
    eps: float = 0.1,
    dtype=None,
    unroll: int = 1,
    rescale_impl: str = "xla",
    fitness_chunk: int | None = None,
    use_pallas: bool = False,
):
    """make_batched_discovery_runner semantics, compiled as a `chunk`-
    iteration program dispatched n_iterations/chunk times from the host.

    The trajectory is IDENTICAL to the monolithic runner: optimize() derives
    each iteration's RNG by fold_in(iter_key, state.iteration) and the same
    top-level key is reused for every chunk, so chunked calls replay the
    single-shot stream exactly (same mechanism as optimize_resumable,
    pso/swarm.py:298). Purpose: HIGHEST-precision fp32 programs compile
    superlinearly in program length on this backend (BENCH r2: 522.9 s cold
    for the 50-iteration monolith vs 2.1 s for the bf16 twin) — a parity/gate
    run needs the converged g_best, not one monolithic program. Dispatch
    overhead is one tunnel RTT per chunk. Stops early once every class swarm
    has latched `done`; the returned history then covers only the executed
    chunks (callers needing the reference's full-length history should size
    `chunk` to divide the early-stop point or use the monolithic runner)."""
    if hp.n_iterations % chunk:
        raise ValueError(f"chunk={chunk} must divide n_iterations={hp.n_iterations}")

    kw = dict(control=control, threshold=threshold, eps=eps, dtype=dtype,
              unroll=unroll, rescale_impl=rescale_impl,
              fitness_chunk=fitness_chunk, use_pallas=use_pallas)
    import dataclasses

    hp_chunk = dataclasses.replace(hp, n_iterations=chunk)
    first = make_batched_discovery_runner(cnn_def, hp_chunk, **kw)

    def _fitness(gen_params_, gen_state_, cnn_params_, cnn_state_, class_idx):
        def fitness(positions):
            return apply_discovery_fitness(
                positions, gen_params_, gen_state_, cnn_params_, cnn_state_,
                cnn_def, class_idx, control=control, threshold=threshold,
                eps=eps, dtype=dtype, rescale_impl=rescale_impl,
            )
        return fitness

    @jax.jit
    def resume(keys, gen_params, gen_state, cnn_params, cnn_state,
               class_idxs, states):
        if dtype is not None:
            gen_params_ = jax.tree.map(lambda x: x.astype(dtype), gen_params)
            gen_state_ = jax.tree.map(lambda x: x.astype(dtype), gen_state)
            cnn_params_ = jax.tree.map(lambda x: x.astype(dtype), cnn_params)
            cnn_state_ = jax.tree.map(lambda x: x.astype(dtype), cnn_state)
        else:
            gen_params_, gen_state_ = gen_params, gen_state
            cnn_params_, cnn_state_ = cnn_params, cnn_state

        def one(key, class_idx, state):
            fitness_body = _fitness(gen_params_, gen_state_, cnn_params_,
                                    cnn_state_, class_idx)
            if fitness_chunk and fitness_chunk < hp.n_particles:
                def fitness(positions):
                    xs = positions.reshape(-1, fitness_chunk, positions.shape[1])
                    return jax.lax.map(fitness_body, xs).reshape(-1)
            else:
                fitness = fitness_body
            return optimize(
                key, fitness, hp, init_state=state, n_iterations=chunk,
                unroll=unroll, use_pallas=use_pallas,
            )

        return jax.vmap(one, in_axes=(0, 0, 0))(keys, class_idxs, states)

    def run(keys, gen_params, gen_state, cnn_params, cnn_state, class_idxs):
        import numpy as np

        finals, hist, inits = first(
            keys, gen_params, gen_state, cnn_params, cnn_state, class_idxs)
        parts = [hist]
        for _ in range(hp.n_iterations // chunk - 1):
            # the host early-exit needs a result transfer (a dispatch
            # barrier); with early stopping disabled `done` can never latch
            # (pso_iteration's stop is constant False), so skip the check and
            # let ALL chunks enqueue via async dispatch — the chunk chain
            # then pipelines exactly like the monolithic program.
            if hp.early_stopping and bool(np.asarray(finals.done).all()):
                break
            finals, hist, _ = resume(
                keys, gen_params, gen_state, cnn_params, cnn_state,
                class_idxs, finals)
            parts.append(hist)
        if len(parts) > 1:
            history = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=1), *parts)
        else:
            history = parts[0]
        return finals, history, inits

    return run


def make_inverter_runner(
    cnn_def: ResNetDef,
    hp: PsoConfig,
    control: str = OPTIMIZE_IN,
    threshold: float = 0.0,
    eps: float = 0.1,
    w_ass: float = 1.0,
    w_rec: float = 1.0,
):
    """Hybrid-inversion runner with params + source slices as arguments:
    run(key, gen_params, gen_state, cnn_params, cnn_state, class_idx,
    source_images, init_positions). One compile serves EVERY patient of the
    per-patient sweep (the reference recompiles nothing because it never
    compiles — here the sweep's fine-tuned assessors all reuse one
    executable)."""

    @jax.jit
    def run(key, gen_params, gen_state, cnn_params, cnn_state, class_idx,
            source_images, init_positions):
        def fitness(positions):
            vals, (_img01, img) = apply_discovery_fitness(
                positions, gen_params, gen_state, cnn_params, cnn_state,
                cnn_def, class_idx, control=control, threshold=threshold,
                eps=eps, return_images=True,
            )
            f_rec = w_rec * jnp.mean(
                (source_images.astype(jnp.float32) - img) ** 2, axis=(1, 2, 3)
            )
            # double eps: the reference re-adds it on the combined value
            # (util_discovery.py:101)
            return w_ass * vals + f_rec + eps

        return optimize(key, fitness, hp, init_positions=init_positions)

    return run
