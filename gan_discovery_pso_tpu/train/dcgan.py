"""DCGAN adversarial training: one fused jitted step + an epoch driver.

Reproduces the reference loop semantics (src/utils/util_dcgan.py:184-223)
as a single device program per batch:

1. fake = G(noise) in train mode (BN batch stats updated once);
2. D step: loss = (BCE(D(real), ỹ₁) + BCE(D(fake), ỹ₀))/2 with label
   smoothing; only D's params move (torch's retain_graph dance reduces to
   taking the gradient w.r.t. D params with `fake` stopped);
3. G step: loss = BCE(D_new(G(noise)), ỹ₁) against the ALREADY-UPDATED D
   (the reference calls optimizer_disc.step() before the G backward) and
   reusing the same smoothed positive labels.

Data-parallel by construction: batch axis shardable over a mesh axis
("data"); params replicated; optax and the loss means psum under pjit
automatically.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gan_discovery_pso_tpu.core.config import AdamConfig
from gan_discovery_pso_tpu.ops import precision
from gan_discovery_pso_tpu.models.dcgan import (
    DiscriminatorDef,
    GeneratorDef,
    discriminator_init,
    discriminator_logits,
    generator_apply,
    generator_init,
)
from gan_discovery_pso_tpu.train.common import (
    bce_from_logits,
    make_optimizer,
    smooth_negative,
    smooth_positive,
)


class GanTrainState(NamedTuple):
    gen_params: dict
    gen_state: dict
    disc_params: dict
    opt_g: optax.OptState
    opt_d: optax.OptState
    step: jax.Array


def gan_init(key, gdef: GeneratorDef, ddef: DiscriminatorDef, adam: AdamConfig):
    tx = make_optimizer(adam)

    # one fused init program (core.jit_init rationale: eager per-tensor
    # dispatches cost minutes over the TPU tunnel)
    @jax.jit
    def build(k):
        kg, kd = jax.random.split(k)
        gen_params, gen_state = generator_init(kg, gdef, dcgan_init=True)
        disc_params, _ = discriminator_init(kd, ddef, dcgan_init=True)
        return GanTrainState(
            gen_params=gen_params,
            gen_state=gen_state,
            disc_params=disc_params,
            opt_g=tx.init(gen_params),
            opt_d=tx.init(disc_params),
            step=jnp.asarray(0, jnp.int32),
        )

    return build(key), tx


def make_gan_train_step(gdef: GeneratorDef, adam: AdamConfig, label_smoothing: bool = True,
                        compute_dtype=None):
    """Returns train_step(state, real, key) -> (state, metrics), jittable and
    shardable (real: [B,C,H,W] on the "data" axis).

    compute_dtype=jnp.bfloat16 is the opt-in mixed-precision path: master
    params, optimizer state, and loss/metric math stay fp32; the G/D
    forwards and backwards run with params and activations cast to bf16
    (the cast is differentiable, so gradients arrive back in fp32). BN
    batch statistics are computed by the model in fp32 regardless. Gated in
    bench.py on fp32 loss-trajectory agreement; default None keeps the
    reference-parity fp32 path."""
    tx = make_optimizer(adam)
    cast = (lambda t: t) if compute_dtype is None else (
        lambda t: jax.tree.map(lambda x: x.astype(compute_dtype), t))

    def train_step(state: GanTrainState, real: jax.Array, key: jax.Array):
        # trace-time: bf16 convs keep bf16 outputs so the whole program is
        # reverse-differentiable (precision.resolve_accum_dtype rationale)
        with precision.lowp_io(compute_dtype is not None):
            return _train_step(state, real, key)

    def _train_step(state: GanTrainState, real: jax.Array, key: jax.Array):
        bs = real.shape[0]
        kz, kp, kn = jax.random.split(key, 3)
        noise = jax.random.normal(kz, (bs, gdef.z_dim, 1, 1), jnp.float32)
        noise_c = cast(noise)
        real_c = cast(real)

        if label_smoothing:
            y_real = smooth_positive(kp, (bs,))
            y_fake = smooth_negative(kn, (bs,))
        else:
            y_real = jnp.ones((bs,), jnp.float32)
            y_fake = jnp.zeros((bs,), jnp.float32)

        # forward G once in train mode: fake images + updated BN stats
        fake, new_gen_state = generator_apply(
            cast(state.gen_params), cast(state.gen_state), noise_c, train=True)
        fake_const = jax.lax.stop_gradient(fake)
        if compute_dtype is not None:
            # BN running stats remain an fp32 pytree in the train state
            new_gen_state = jax.tree.map(
                lambda new, old: new.astype(old.dtype), new_gen_state,
                state.gen_state)

        # --- D step (util_dcgan.py:195-211)
        def d_loss_fn(dp):
            dp = cast(dp)  # grad of the cast upcasts back: fp32 grads out
            l_real = bce_from_logits(
                discriminator_logits(dp, real_c).astype(jnp.float32), y_real)
            l_fake = bce_from_logits(
                discriminator_logits(dp, fake_const).astype(jnp.float32), y_fake)
            return (l_real + l_fake) / 2.0

        loss_d, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, new_opt_d = tx.update(d_grads, state.opt_d, state.disc_params)
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)

        # --- G step against the updated D (util_dcgan.py:213-218)
        def g_loss_fn(gp):
            fake_g, _ = generator_apply(cast(gp), cast(state.gen_state),
                                        noise_c, train=True)
            return bce_from_logits(
                discriminator_logits(cast(new_disc_params), fake_g)
                .astype(jnp.float32), y_real)

        loss_g, g_grads = jax.value_and_grad(g_loss_fn)(state.gen_params)
        g_updates, new_opt_g = tx.update(g_grads, state.opt_g, state.gen_params)
        new_gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = GanTrainState(
            gen_params=new_gen_params,
            gen_state=new_gen_state,
            disc_params=new_disc_params,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
            step=state.step + 1,
        )
        return new_state, {"loss_gen": loss_g, "loss_disc": loss_d}

    return train_step


def make_gan_train_scan_step(gdef: GeneratorDef, adam: AdamConfig,
                             label_smoothing: bool = True,
                             compute_dtype=None):
    """Fused multi-step trainer: K sequential train steps as ONE program.

    scan_step(state, reals[K, B, C, H, W], key) -> (state, metrics) where
    metrics arrays carry a leading per-step axis. Step i runs the exact
    single-step math (make_gan_train_step) with jax.random.fold_in(key, i),
    matching K sequential step() calls with those keys to float-ulp level
    (tests/test_train.py parity; XLA fuses the scan body differently than
    the standalone step program, so last-bit reassociation differs while
    the arithmetic is identical) — the fusion only removes K-1 program
    dispatches and lets XLA schedule across step boundaries. The
    per-step program at batch 128 on 28x28 images is dispatch-bound on this
    backend (the reference workload util_dcgan.py:184-223 has ~us-scale
    model FLOPs per step); scanning K steps per dispatch amortizes that
    overhead into real MXU work (bench.py dcgan_train measurements)."""
    step = make_gan_train_step(gdef, adam, label_smoothing=label_smoothing,
                               compute_dtype=compute_dtype)

    def scan_step(state: GanTrainState, reals: jax.Array, key: jax.Array):
        def body(st, xs):
            i, real = xs
            return step(st, real, jax.random.fold_in(key, i))

        n = reals.shape[0]
        return jax.lax.scan(body, state, (jnp.arange(n), reals))

    return scan_step


def make_sampler(gdef: GeneratorDef):
    """Batched synthetic-image sampler: one fused program generating B images
    rescaled per-sample to [0,1] — replaces the reference's DataLoader that
    synthesized ONE image per __getitem__ (src/utils/util_data.py:422-445)."""
    from functools import partial

    from gan_discovery_pso_tpu.ops import rescale01_per_sample

    @partial(jax.jit, static_argnums=3)
    def sample(gen_params, gen_state, key, batch: int):
        z = jax.random.normal(key, (batch, gdef.z_dim, 1, 1), jnp.float32)
        img, _ = generator_apply(gen_params, gen_state, z, train=False)
        return rescale01_per_sample(img)

    return sample
