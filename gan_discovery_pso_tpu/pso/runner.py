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
):
    """The flagship batched multi-class sweep with params as ARGUMENTS:
    run(keys[C], gen_params, gen_state, cnn_params, cnn_state, class_idxs[C])
    → vmapped (finals, histories, inits) with a leading class axis.

    One compile serves every model of the same shapes (the former vmapped
    path in pipelines/pso_discovery.py closed over params and recompiled per
    model). dtype=jnp.bfloat16 runs the model forwards in MXU-native
    precision (cast once per call, fp32 swarm math) — wrap the first call in
    ops.precision.fast_math() or rely on the cast params alone."""

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
            def fitness(positions):
                return apply_discovery_fitness(
                    positions, gen_params_, gen_state_, cnn_params_, cnn_state_,
                    cnn_def, class_idx, control=control, threshold=threshold,
                    eps=eps, dtype=dtype, rescale_impl=rescale_impl,
                )

            return optimize(key, fitness, hp, unroll=unroll)

        return jax.vmap(one, in_axes=(0, 0))(keys, class_idxs)

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
