"""Fitness library: particle positions → scalar objective, batched over the
whole swarm as one device program.

Reproduces the reference `Discovery` fitness semantics exactly
(reference src/pso/util_discovery.py:33-101) but with the generator and
assessor forwards running over ALL particles at once on the MXU instead of
batch-1 per particle:

- positions [N,d] reshape to [N,d,1,1] latents (:33-43);
- generator forward (eval mode), per-particle min-max rescale to [0,1]
  (:45-50 → util_data.py:129-135, per-sample under batching);
- assessor softmax posterior; multi-class nets index the class column via
  class_to_idx, binary nets take column 1 (:69-74);
- 'optimize_in_training'  → min(p + thr, 1) + eps
  'optimize_out_training' → 1 − min(p + thr, 1) + eps, eps = 0.1 (:75-80);
- the hybrid inverter fitness adds w_rec·MSE(source, raw G output) and a
  second +eps (:84-101 — yes, eps is added twice there; reproduced).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.models.dcgan import generator_forward
from gan_discovery_pso_tpu.models.resnet import ResNetDef, assessor_apply
from gan_discovery_pso_tpu.ops import rescale01_per_sample

OPTIMIZE_IN = "optimize_in_training"
OPTIMIZE_OUT = "optimize_out_training"


def assessor_posterior(logits: jax.Array, class_idx) -> jax.Array:
    """softmax over classes; pick the target column (multi-class uses
    class_to_idx, binary uses column 1 — util_discovery.py:69-74).
    class_idx may be a traced scalar so one compiled program serves every
    class of the per-class sweep."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    if logits.shape[1] > 2:
        return jnp.take(probs, jnp.asarray(class_idx), axis=1)
    return probs[:, 1]


def fitness_from_posterior(
    p: jax.Array, control: str, threshold: float = 0.0, eps: float = 0.1
) -> jax.Array:
    clipped = jnp.minimum(p + threshold, 1.0)
    if control == OPTIMIZE_IN:
        return clipped + eps
    if control == OPTIMIZE_OUT:
        return (1.0 - clipped) + eps
    raise ValueError(control)


def apply_discovery_fitness(
    positions: jax.Array,
    gen_params,
    gen_state,
    cnn_params,
    cnn_state,
    cnn_def,  # ResNetDef or AlexNetDef (reference get_cnn indirection)
    class_idx,
    control: str = OPTIMIZE_OUT,
    threshold: float = 0.0,
    eps: float = 0.1,
    dtype=None,
    return_images: bool = False,
    rescale_impl: str = "xla",
):
    """THE discovery fitness body (single source of truth for every runner:
    closure-based, params-as-arguments, vmapped-batched, and sharded):
    positions [N,d] → z [N,d,1,1] → G forward → per-sample [0,1] rescale →
    assessor posterior column → objective (util_discovery.py:33-82).
    class_idx may be traced. dtype casts only the latents here — callers
    on the fast-math path cast the params themselves (once).
    rescale_impl='pallas' uses the fused full-lane rescale kernel
    (ops/pallas/rescale.py) with the cast folded in."""
    z = positions.reshape(positions.shape[0], positions.shape[1], 1, 1)
    if dtype is not None:
        z = z.astype(dtype)
    img = generator_forward(gen_params, gen_state, z)  # [N,C,28,28] in [-1,1]
    if rescale_impl == "pallas":
        from gan_discovery_pso_tpu.ops.pallas import rescale01_per_sample_pallas

        img01 = rescale01_per_sample_pallas(
            img.astype(jnp.float32), out_dtype=img.dtype)
    else:
        img01 = rescale01_per_sample(img.astype(jnp.float32)).astype(img.dtype)
    logits, _ = assessor_apply(cnn_params, cnn_state, img01, cnn_def, train=False)
    p = assessor_posterior(logits.astype(jnp.float32), class_idx)
    vals = fitness_from_posterior(p, control, threshold, eps)
    if return_images:
        return vals, (img01, img)
    return vals


def make_discovery_fitness(
    gen_params,
    gen_state,
    cnn_params,
    cnn_state,
    cnn_def: ResNetDef,
    class_idx: int,
    control: str = OPTIMIZE_OUT,
    threshold: float = 0.0,
    eps: float = 0.1,
    return_images: bool = False,
    dtype=None,
) -> Callable[[jax.Array], jax.Array]:
    """Swarm-batched discovery fitness. positions [N,d] → values [N].

    dtype=jnp.bfloat16 casts model params once and runs the forwards with
    MXU-native precision (wrap the jit trace in ops.precision.fast_math());
    the fitness math stays fp32. Default keeps the fp32 parity path."""
    if dtype is not None:
        cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
        gen_params, gen_state = cast(gen_params), cast(gen_state)
        cnn_params, cnn_state = cast(cnn_params), cast(cnn_state)

    def fitness(positions: jax.Array):
        return apply_discovery_fitness(
            positions, gen_params, gen_state, cnn_params, cnn_state, cnn_def,
            class_idx, control=control, threshold=threshold, eps=eps,
            dtype=dtype, return_images=return_images,
        )

    return fitness


def make_inverter_fitness(
    gen_params,
    gen_state,
    cnn_params,
    cnn_state,
    cnn_def: ResNetDef,
    source_images: jax.Array,
    class_idx: int,
    control: str = OPTIMIZE_IN,
    threshold: float = 0.0,
    eps: float = 0.1,
    w_ass: float = 1.0,
    w_rec: float = 1.0,
) -> Callable[[jax.Array], jax.Array]:
    """Hybrid PSO-inversion fitness (util_discovery.py:84-101): assessor term
    + w_rec·MSE(source slice, raw G output). Each particle i owns source
    image i (encoder-seeded init, util_pso.py:93-112). source_images
    [N,C,H,W] in [-1,1]."""

    def fitness(positions: jax.Array):
        vals, (_img01, img) = apply_discovery_fitness(
            positions, gen_params, gen_state, cnn_params, cnn_state, cnn_def,
            class_idx, control=control, threshold=threshold, eps=eps,
            return_images=True,
        )
        f_ass = w_ass * vals
        # per-particle pixel MSE against its own source slice (raw G output,
        # NOT the rescaled image — util_discovery.py:96-98)
        f_rec = w_rec * jnp.mean(
            (source_images.astype(jnp.float32) - img) ** 2, axis=(1, 2, 3)
        )
        # the reference adds eps a second time on the combined value (:101)
        return f_ass + f_rec + eps

    return fitness


def make_discovery_fitness_dynamic(
    gen_params,
    gen_state,
    cnn_params,
    cnn_state,
    cnn_def: ResNetDef,
    control: str = OPTIMIZE_OUT,
    threshold: float = 0.0,
    eps: float = 0.1,
    dtype=None,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Discovery fitness with the class index as a RUNTIME argument:
    fitness(positions [N,d], class_idx []) → [N]. One compiled optimize
    serves the whole per-class sweep (the reference's outer loop,
    src/training/pso_discovery.py:174) instead of recompiling per class.
    dtype=jnp.bfloat16 = the fast-math path (see make_discovery_fitness)."""
    if dtype is not None:
        cast = lambda t: jax.tree.map(lambda x: x.astype(dtype), t)
        gen_params, gen_state = cast(gen_params), cast(gen_state)
        cnn_params, cnn_state = cast(cnn_params), cast(cnn_state)

    def fitness(positions: jax.Array, class_idx) -> jax.Array:
        return apply_discovery_fitness(
            positions, gen_params, gen_state, cnn_params, cnn_state, cnn_def,
            class_idx, control=control, threshold=threshold, eps=eps, dtype=dtype,
        )

    return fitness


def make_analytic_fitness(fn: Callable[[jax.Array], jax.Array]):
    """Wrap an analytic R^d → R objective for swarm batching (the golden-test
    harness, reference src/hands_on/example_pso.py)."""

    def fitness(positions: jax.Array):
        return jax.vmap(fn)(positions)

    return fitness
