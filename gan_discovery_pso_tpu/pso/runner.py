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
from gan_discovery_pso_tpu.models.dcgan import generator_forward
from gan_discovery_pso_tpu.models.resnet import ResNetDef, resnet_apply
from gan_discovery_pso_tpu.ops import rescale01_per_sample
from gan_discovery_pso_tpu.pso.fitness import (
    OPTIMIZE_IN,
    OPTIMIZE_OUT,
    assessor_posterior,
    fitness_from_posterior,
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
            z = positions.reshape(positions.shape[0], positions.shape[1], 1, 1)
            img = generator_forward(gen_params, gen_state, z)
            img01 = rescale01_per_sample(img)
            logits, _ = resnet_apply(cnn_params, cnn_state, img01, cnn_def, train=False)
            p = assessor_posterior(logits, class_idx)
            return fitness_from_posterior(p, control, threshold, eps)

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
                z = positions.reshape(positions.shape[0], positions.shape[1], 1, 1)
                if dtype is not None:
                    z = z.astype(dtype)
                img = generator_forward(gen_params_, gen_state_, z)
                img01 = rescale01_per_sample(img.astype(jnp.float32)).astype(img.dtype)
                logits, _ = resnet_apply(
                    cnn_params_, cnn_state_, img01, cnn_def, train=False
                )
                p = assessor_posterior(logits.astype(jnp.float32), class_idx)
                return fitness_from_posterior(p, control, threshold, eps)

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
            z = positions.reshape(positions.shape[0], positions.shape[1], 1, 1)
            img = generator_forward(gen_params, gen_state, z)
            img01 = rescale01_per_sample(img)
            logits, _ = resnet_apply(cnn_params, cnn_state, img01, cnn_def, train=False)
            p = assessor_posterior(logits, class_idx)
            f_ass = w_ass * fitness_from_posterior(p, control, threshold, eps)
            f_rec = w_rec * jnp.mean(
                (source_images.astype(jnp.float32) - img) ** 2, axis=(1, 2, 3)
            )
            return f_ass + f_rec + eps

        return optimize(key, fitness, hp, init_positions=init_positions)

    return run
