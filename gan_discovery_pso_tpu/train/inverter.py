"""GAN-inverter training and gradient-based latent optimization.

Covers the reference inverter stack
(src/inverter/utils_ae/util_inverter.py:213-638 and the statistics variant
util_inverter_statistics.py:476-598) as jitted device programs:

- `pix_rec`: encoder E trained by pixel MSE through the frozen G (:213-293);
- `pix_fea_rec_adv`: E + discriminator adversarial training with
  R1 gradient penalty on real samples (grad-of-grad, :304-320,330-491),
  perceptual features from the frozen multipatient assessor's pooled head
  (w_rec=1, w_fea=1, w_adv=0.1, r1_gamma=10);
- `invert`: per-image Adam on z, loss = pix·MSE(x, G(z)) +
  reg·MSE(z, E(G(z))), encoder init (:544-638) — batched over images via
  vmap semantics (each image optimizes independently);
- `invert_bn`: z re-expressed as a learnable-weighted sum of per-class
  batch-normalizations against PSO particle populations
  (util_inverter_statistics.py:476-598; the reference's in-place graph
  rebinding of z_optim is reproduced as its evident intent: z stays the
  optimized leaf, the mixed/normalized z feeds G).

R1 in JAX: `jax.grad` of the summed real predictions w.r.t. the input
inside the D-loss, then `value_and_grad` of the whole loss w.r.t. D params —
second-order autodiff replaces torch's create_graph=True.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gan_discovery_pso_tpu.core.config import AdamConfig
from gan_discovery_pso_tpu.models.dcgan import (
    discriminator_logits,
    generator_apply,
)
from gan_discovery_pso_tpu.models.encoder import encoder_apply
from gan_discovery_pso_tpu.models.resnet import ResNetDef, resnet_features
from gan_discovery_pso_tpu.train.common import (
    bce_from_logits,
    make_optimizer,
    smooth_negative,
    smooth_positive,
)


def _decode(gen_params, gen_state, z):
    img, _ = generator_apply(gen_params, gen_state, z, train=False)
    return img


def _encode(enc_params, x):
    z, _ = encoder_apply(enc_params, {}, x)
    return z


# ---------------------------------------------------------------------------
# pix_rec: E-only training
# ---------------------------------------------------------------------------


class PixRecState(NamedTuple):
    enc_params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_pix_rec_step(gen_params, gen_state, adam: AdamConfig):
    tx = make_optimizer(adam)

    @jax.jit
    def train_step(state: PixRecState, real):
        def loss_fn(ep):
            rec = _decode(gen_params, gen_state, _encode(ep, real))
            return jnp.mean((real - rec) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.enc_params)
        updates, new_opt = tx.update(grads, state.opt_state, state.enc_params)
        new_params = optax.apply_updates(state.enc_params, updates)
        return PixRecState(new_params, new_opt, state.step + 1), loss

    @jax.jit
    def eval_step(state: PixRecState, real):
        rec = _decode(gen_params, gen_state, _encode(state.enc_params, real))
        return jnp.mean((real - rec) ** 2)

    return train_step, eval_step


class PixRecStatefulState(NamedTuple):
    enc_params: dict
    enc_state: dict
    opt_state: optax.OptState
    step: jax.Array


def make_pix_rec_step_stateful(gen_params, gen_state, adam: AdamConfig, enc_apply):
    """pix_rec for encoders WITH internal state (the AttGAN variant's
    BatchNorm stack, reference util_inverter.py:142-162).

    enc_apply(params, state, x, train) -> (z [N,z,1,1], new_state)."""
    tx = make_optimizer(adam)

    @jax.jit
    def train_step(state: PixRecStatefulState, real):
        def loss_fn(ep):
            z, new_es = enc_apply(ep, state.enc_state, real, True)
            rec = _decode(gen_params, gen_state, z)
            return jnp.mean((real - rec) ** 2), new_es

        (loss, new_es), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.enc_params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.enc_params)
        new_params = optax.apply_updates(state.enc_params, updates)
        return PixRecStatefulState(new_params, new_es, new_opt, state.step + 1), loss

    @jax.jit
    def eval_step(state: PixRecStatefulState, real):
        z, _ = enc_apply(state.enc_params, state.enc_state, real, False)
        rec = _decode(gen_params, gen_state, z)
        return jnp.mean((real - rec) ** 2)

    return train_step, eval_step


# ---------------------------------------------------------------------------
# pix_fea_rec_adv: E + D adversarial with R1
# ---------------------------------------------------------------------------


class PixFeaRecAdvState(NamedTuple):
    enc_params: dict
    disc_params: dict
    opt_e: optax.OptState
    opt_d: optax.OptState
    step: jax.Array


def r1_penalty(disc_params, real):
    """mean over batch of ‖∂ Σ D(x) / ∂x‖² with D's sigmoid output
    (reference R1_reg, util_inverter.py:304-320)."""
    grad_x = jax.grad(
        lambda x: jnp.sum(jax.nn.sigmoid(discriminator_logits(disc_params, x)))
    )(real)
    return jnp.mean(jnp.sum(grad_x**2, axis=(1, 2, 3)))


def make_pix_fea_rec_adv_step(
    gen_params,
    gen_state,
    cnn_params,
    cnn_state,
    cnn_def: ResNetDef,
    adam_e: AdamConfig,
    adam_d: AdamConfig,
    w_rec: float = 1.0,
    w_fea: float = 1.0,
    w_adv: float = 0.1,
    r1_gamma: float = 10.0,
    label_smoothing: bool = True,
):
    tx_e, tx_d = make_optimizer(adam_e), make_optimizer(adam_d)

    def features(x):
        return resnet_features(cnn_params, cnn_state, x, cnn_def)

    @jax.jit
    def train_step(state: PixFeaRecAdvState, real, key):
        bs = real.shape[0]
        kp, kn = jax.random.split(key)
        if label_smoothing:
            y_real = smooth_positive(kp, (bs,))
            y_fake = smooth_negative(kn, (bs,))
        else:
            y_real = jnp.ones((bs,), jnp.float32)
            y_fake = jnp.zeros((bs,), jnp.float32)

        fake = _decode(gen_params, gen_state, _encode(state.enc_params, real))
        fake_const = jax.lax.stop_gradient(fake)

        # --- D step with R1 (reference :383-397)
        def d_loss_fn(dp):
            l_adv = (
                bce_from_logits(discriminator_logits(dp, real), y_real)
                + bce_from_logits(discriminator_logits(dp, fake_const), y_fake)
            ) / 2.0
            l_r1 = r1_penalty(dp, real) * (r1_gamma * 0.5)
            return l_adv + l_r1, (l_adv, l_r1)

        (loss_d, (loss_d_adv, loss_d_r1)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.disc_params)
        d_up, new_opt_d = tx_d.update(d_grads, state.opt_d, state.disc_params)
        new_disc = optax.apply_updates(state.disc_params, d_up)

        # --- E step against the updated D (reference :399-420)
        feat_real = features(real)

        def e_loss_fn(ep):
            fake_e = _decode(gen_params, gen_state, _encode(ep, real))
            l_pix = w_rec * jnp.mean((fake_e - real) ** 2)
            l_fea = w_fea * jnp.mean((features(fake_e) - feat_real) ** 2)
            l_adv = w_adv * bce_from_logits(discriminator_logits(new_disc, fake_e), y_real)
            return l_pix + l_fea + l_adv, (l_pix, l_fea, l_adv)

        (loss_e, (l_pix, l_fea, l_adv)), e_grads = jax.value_and_grad(
            e_loss_fn, has_aux=True
        )(state.enc_params)
        e_up, new_opt_e = tx_e.update(e_grads, state.opt_e, state.enc_params)
        new_enc = optax.apply_updates(state.enc_params, e_up)

        metrics = {
            "loss_disc": loss_d,
            "loss_disc_adv": loss_d_adv,
            "loss_disc_r1penalty": loss_d_r1,
            "loss_enc": loss_e,
            "loss_enc_rec_pix": l_pix,
            "loss_enc_rec_fea": l_fea,
            "loss_enc_adv": l_adv,
        }
        return (
            PixFeaRecAdvState(new_enc, new_disc, new_opt_e, new_opt_d, state.step + 1),
            metrics,
        )

    @jax.jit
    def eval_step(state: PixFeaRecAdvState, real, key):
        bs = real.shape[0]
        # the reference smooths labels BEFORE the train/val phase branch
        # (util_inverter.py:379-382), so the val adversarial term also sees
        # U[0.7,1.2] positives
        if label_smoothing:
            y_real = smooth_positive(key, (bs,))
        else:
            y_real = jnp.ones((bs,), jnp.float32)
        fake = _decode(gen_params, gen_state, _encode(state.enc_params, real))
        l_pix = w_rec * jnp.mean((fake - real) ** 2)
        l_fea = w_fea * jnp.mean((features(fake) - features(real)) ** 2)
        l_adv = w_adv * bce_from_logits(discriminator_logits(state.disc_params, fake), y_real)
        return {
            "loss_enc_rec_pix": l_pix,
            "loss_enc_rec_fea": l_fea,
            "loss_enc_adv": l_adv,
            "loss_enc": l_pix + l_fea + l_adv,
        }

    return train_step, eval_step


class PixFeaRecAdvStatefulState(NamedTuple):
    enc_params: dict
    enc_state: dict
    disc_params: dict
    opt_e: optax.OptState
    opt_d: optax.OptState
    step: jax.Array


def make_pix_fea_rec_adv_step_stateful(
    gen_params,
    gen_state,
    cnn_params,
    cnn_state,
    cnn_def: ResNetDef,
    adam_e: AdamConfig,
    adam_d: AdamConfig,
    enc_apply,
    w_rec: float = 1.0,
    w_fea: float = 1.0,
    w_adv: float = 0.1,
    r1_gamma: float = 10.0,
    label_smoothing: bool = True,
):
    """pix_fea_rec_adv for encoders WITH internal state — the AttGAN
    variant's BatchNorm stack. The reference's train-fn dispatch is
    encoder-agnostic (util_inverter.py:31-87 with Encoder_AttGAN at
    :142-162), so this combination is legal there; here it threads the
    encoder BN state through the adversarial step.

    enc_apply(params, state, x, train) -> (z [N,z,1,1], new_state).

    BN-state discipline matches the reference's single E forward per batch
    (util_inverter.py:371-373): the train-mode encoder forward runs ONCE per
    step for state purposes; the E-loss gradient re-evaluates the identical
    forward from the same pre-step state (same math, same new state)."""
    tx_e, tx_d = make_optimizer(adam_e), make_optimizer(adam_d)

    def features(x):
        return resnet_features(cnn_params, cnn_state, x, cnn_def)

    @jax.jit
    def train_step(state: PixFeaRecAdvStatefulState, real, key):
        bs = real.shape[0]
        kp, kn = jax.random.split(key)
        if label_smoothing:
            y_real = smooth_positive(kp, (bs,))
            y_fake = smooth_negative(kn, (bs,))
        else:
            y_real = jnp.ones((bs,), jnp.float32)
            y_fake = jnp.zeros((bs,), jnp.float32)

        z_const, _ = enc_apply(state.enc_params, state.enc_state, real, True)
        fake_const = jax.lax.stop_gradient(_decode(gen_params, gen_state, z_const))

        # --- D step with R1 (reference :383-397)
        def d_loss_fn(dp):
            l_adv = (
                bce_from_logits(discriminator_logits(dp, real), y_real)
                + bce_from_logits(discriminator_logits(dp, fake_const), y_fake)
            ) / 2.0
            l_r1 = r1_penalty(dp, real) * (r1_gamma * 0.5)
            return l_adv + l_r1, (l_adv, l_r1)

        (loss_d, (loss_d_adv, loss_d_r1)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.disc_params)
        d_up, new_opt_d = tx_d.update(d_grads, state.opt_d, state.disc_params)
        new_disc = optax.apply_updates(state.disc_params, d_up)

        # --- E step against the updated D (reference :399-420)
        feat_real = features(real)

        def e_loss_fn(ep):
            z, new_es = enc_apply(ep, state.enc_state, real, True)
            fake_e = _decode(gen_params, gen_state, z)
            l_pix = w_rec * jnp.mean((fake_e - real) ** 2)
            l_fea = w_fea * jnp.mean((features(fake_e) - feat_real) ** 2)
            l_adv = w_adv * bce_from_logits(
                discriminator_logits(new_disc, fake_e), y_real)
            return l_pix + l_fea + l_adv, (l_pix, l_fea, l_adv, new_es)

        (loss_e, (l_pix, l_fea, l_adv, new_es)), e_grads = jax.value_and_grad(
            e_loss_fn, has_aux=True
        )(state.enc_params)
        e_up, new_opt_e = tx_e.update(e_grads, state.opt_e, state.enc_params)
        new_enc = optax.apply_updates(state.enc_params, e_up)

        metrics = {
            "loss_disc": loss_d,
            "loss_disc_adv": loss_d_adv,
            "loss_disc_r1penalty": loss_d_r1,
            "loss_enc": loss_e,
            "loss_enc_rec_pix": l_pix,
            "loss_enc_rec_fea": l_fea,
            "loss_enc_adv": l_adv,
        }
        return (
            PixFeaRecAdvStatefulState(
                new_enc, new_es, new_disc, new_opt_e, new_opt_d, state.step + 1
            ),
            metrics,
        )

    @jax.jit
    def eval_step(state: PixFeaRecAdvStatefulState, real, key):
        bs = real.shape[0]
        if label_smoothing:
            y_real = smooth_positive(key, (bs,))
        else:
            y_real = jnp.ones((bs,), jnp.float32)
        z, _ = enc_apply(state.enc_params, state.enc_state, real, False)
        fake = _decode(gen_params, gen_state, z)
        l_pix = w_rec * jnp.mean((fake - real) ** 2)
        l_fea = w_fea * jnp.mean((features(fake) - features(real)) ** 2)
        l_adv = w_adv * bce_from_logits(
            discriminator_logits(state.disc_params, fake), y_real)
        return {
            "loss_enc_rec_pix": l_pix,
            "loss_enc_rec_fea": l_fea,
            "loss_enc_adv": l_adv,
            "loss_enc": l_pix + l_fea + l_adv,
        }

    return train_step, eval_step


# ---------------------------------------------------------------------------
# gradient-descent inversion
# ---------------------------------------------------------------------------


def invert(
    x: jax.Array,
    gen_params,
    gen_state,
    enc_params,
    iterations: int = 500,
    learning_rate: float = 1e-2,
    loss_pix_weight: float = 1.0,
    loss_reg_weight: float = 2.0,
    record_z: bool = False,
):
    """Batched latent optimization (reference invert, util_inverter.py:544-638
    runs one image at a time; here all images optimize independently in one
    scan). x: [B,C,H,W] in [-1,1].

    Returns (z [B,z,1,1], history {loss_pix, loss_reg, loss}: [iters] means).
    record_z=True adds history["z"] [iters, B, z, 1, 1] — the per-step
    latents, which the stage decodes post-hoc into the reference's
    `synthetic_images_{step}.png` snapshots (util_inverter.py:622-624)
    without breaking the fused scan.

    Independence: the optimized loss SUMS per-image means over the batch,
    so each image's gradient equals its B=1 gradient and batched
    trajectories match the reference's one-image-at-a-time runs (up to conv
    batch-vectorization rounding; a batch MEAN would instead scale grads by
    1/B, which Adam's eps term does not cancel). The history records
    per-image means."""
    z0 = _encode(enc_params, x)
    tx = optax.adam(learning_rate)
    n_img = x.shape[0]

    def loss_fn(z):
        x_rec = _decode(gen_params, gen_state, z)
        pix_i = jnp.mean((x - x_rec) ** 2, axis=(1, 2, 3))  # [B]
        z_rec = _encode(enc_params, x_rec)
        reg_i = jnp.mean((z - z_rec) ** 2, axis=(1, 2, 3))  # [B]
        loss_pix, loss_reg = jnp.sum(pix_i), jnp.sum(reg_i)
        return loss_pix * loss_pix_weight + loss_reg * loss_reg_weight, (
            loss_pix / n_img, loss_reg / n_img)

    @jax.jit
    def run(z0):
        def step(carry, _):
            z, opt = carry
            (loss, (lp, lr)), grads = jax.value_and_grad(loss_fn, has_aux=True)(z)
            updates, opt = tx.update(grads, opt, z)
            z = optax.apply_updates(z, updates)
            rec = {"loss": loss / n_img, "loss_pix": lp, "loss_reg": lr}
            if record_z:
                rec["z"] = z
            return (z, opt), rec

        (z, _), hist = jax.lax.scan(step, (z0, tx.init(z0)), None, length=iterations + 1)
        return z, hist

    z, hist = run(z0)
    return z, {k: np.asarray(v) for k, v in hist.items()}


def invert_bn(
    x: jax.Array,
    gen_params,
    gen_state,
    enc_params,
    class_particles: jax.Array,  # [C, N, d] final PSO positions per class
    iterations: int = 500,
    learning_rate: float = 1e-2,
    weights_lr: float = 0.1,
    loss_pix_weight: float = 1.0,
    key=None,
):
    """Statistics-regularized inversion (util_inverter_statistics.py:476-598):
    z is re-expressed as Σ_c w_c·BN(z; μ_c, σ_c) / Σ_c w_c where (μ_c, σ_c)
    are the PSO particle-population statistics of class c and w are learnable
    (init N(0,1), their own lr).

    Per-image independence matches the reference, which runs one image at a
    time (its invert asserts x.shape[0] == 1, :516): each image gets its OWN
    weight vector w_i (returned as [B, C]) and the optimized loss sums
    per-image pixel means, so no image's update depends on another's.
    The returned z is the mix evaluated in the final pass BEFORE its
    optimizer step — exactly the reference's returned z_optim."""
    if key is None:
        key = jax.random.key(0)
    z0 = _encode(enc_params, x)  # [B, d, 1, 1]
    if class_particles.shape[-1] != z0.shape[1]:
        raise ValueError(
            f"PSO particles have dim_space={class_particles.shape[-1]} but "
            f"the encoder produces z_dim={z0.shape[1]} latents — the "
            "--path-pso run must come from a discovery sweep at this GAN's "
            "latent dimension"
        )
    n_img = x.shape[0]
    n_classes = class_particles.shape[0]
    # one weight vector per image (reference: fresh weights per single-image
    # run); all init from the same key-stream order a sequential reference
    # sweep would draw
    w0 = jax.random.normal(key, (n_img, n_classes), jnp.float32)

    # per-class population stats over (particles,) for each latent dim
    mu = jnp.mean(class_particles, axis=1)  # [C, d]
    var = jnp.mean((class_particles - mu[:, None, :]) ** 2, axis=1)  # [C, d]

    def mix(z, w, eps=1e-5):
        # BN(z; class c) per class, per-image weighted sum / per-image Σw
        zn = (z[None] - mu[:, None, :, None, None]) / jnp.sqrt(
            var[:, None, :, None, None] + eps
        )  # [C, B, d, 1, 1]
        return jnp.einsum("bc,cbdhw->bdhw", w, zn) / jnp.sum(
            w, axis=1)[:, None, None, None]

    tx = optax.multi_transform(
        {"z": optax.adam(learning_rate), "w": optax.adam(weights_lr)},
        {"z": "z", "w": "w"},
    )

    def loss_fn(p):
        z_mix = mix(p["z"], p["w"])
        x_rec = _decode(gen_params, gen_state, z_mix)
        pix_i = jnp.mean((x - x_rec) ** 2, axis=(1, 2, 3))  # [B]
        # SUM over images: each image's gradient equals its B=1 gradient
        return jnp.sum(pix_i) * loss_pix_weight, (jnp.mean(pix_i), z_mix)

    @jax.jit
    def run(p0):
        def step(carry, _):
            p, opt = carry
            (loss, (lp, z_mix)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, opt = tx.update(grads, opt, p)
            p = optax.apply_updates(p, updates)
            return (p, opt), {"loss": loss / n_img, "loss_pix": lp,
                              "z_mix": z_mix, "w": p["w"]}

        params = p0
        (params, _), hist = jax.lax.scan(
            step, (params, tx.init(params)), None, length=iterations + 1
        )
        return params, hist

    _params, hist = run({"z": z0, "w": w0})
    # the final pass's PRE-step mix and the weights as of that pass
    z_final = hist.pop("z_mix")[-1]
    w_final = hist.pop("w")[-2] if iterations > 0 else w0
    return z_final, w_final, {k: np.asarray(v) for k, v in hist.items()}
