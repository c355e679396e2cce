"""VQ-VAE training with a frozen pretrained-G decoder.

Reference loop: src/inverter/utils_vq_vae/util_training.py:11-65 driven by
src/training/vq_vae.py:216-245 — loss = MSE(x̃,x) + MSE(z_q, sg z_e) +
β·MSE(z_e, sg z_q), β=0.25; decoder frozen to the pretrained DCGAN G;
best model by val_ood reconstruction loss.

Freezing is structural here: gradients to the decoder subtree are zeroed by
optax.multi_transform (set_to_zero), so the optimizer state stays aligned
while the decoder never moves.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gan_discovery_pso_tpu.core.config import AdamConfig
from gan_discovery_pso_tpu.models.vqvae import (
    VQVAEGanDef,
    load_frozen_decoder,
    vq_loss_terms,
    vqvae_gan_apply,
    vqvae_gan_init,
)
from gan_discovery_pso_tpu.train.common import make_optimizer


class VqvaeTrainState(NamedTuple):
    params: dict
    model_state: dict
    opt_state: optax.OptState
    step: jax.Array


def vqvae_init(
    key,
    d: VQVAEGanDef,
    adam: AdamConfig,
    data_pso=None,
    frozen_gen: tuple | None = None,
):
    """frozen_gen: (gen_params, gen_state) to install + freeze as decoder."""
    # one fused init program (core.jit_init rationale); data_pso folds in as
    # a compile-time constant
    params, state = jax.jit(lambda k: vqvae_gan_init(k, d, data_pso=data_pso))(key)
    if frozen_gen is not None:
        params, state = load_frozen_decoder(params, state, *frozen_gen)
        tx = optax.multi_transform(
            {"train": make_optimizer(adam), "frozen": optax.set_to_zero()},
            {"encoder": "train", "codebook": "train", "decoder": "frozen"},
        )
    else:
        tx = make_optimizer(adam)
    opt0 = jax.jit(tx.init)(params)  # fused opt-state init, not per-tensor
    return VqvaeTrainState(params, state, opt0, jnp.asarray(0, jnp.int32)), tx


def make_vqvae_steps(d: VQVAEGanDef, adam: AdamConfig, beta: float = 0.25, frozen_decoder: bool = True):
    if frozen_decoder:
        tx = optax.multi_transform(
            {"train": make_optimizer(adam), "frozen": optax.set_to_zero()},
            {"encoder": "train", "codebook": "train", "decoder": "frozen"},
        )
    else:
        tx = make_optimizer(adam)

    @jax.jit
    def train_step(state: VqvaeTrainState, x):
        def loss_fn(p):
            x_tilde, z_e, z_q_bar, _idx, new_ms = vqvae_gan_apply(
                p, state.model_state, x, d, train=True,
                frozen_decoder=frozen_decoder,
            )
            lr_, lvq, lc = vq_loss_terms(x, x_tilde, z_e, z_q_bar, beta)
            return lr_ + lvq + lc, (lr_, lvq, lc, new_ms)

        (loss, (l_rec, l_vq, l_commit, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "loss_recons": l_rec, "loss_vq": l_vq, "loss_commit": l_commit}
        return VqvaeTrainState(new_params, new_ms, new_opt, state.step + 1), metrics

    @jax.jit
    def eval_step(state: VqvaeTrainState, x):
        x_tilde, z_e, z_q_bar, _idx, _ = vqvae_gan_apply(
            state.params, state.model_state, x, d, train=False
        )
        l_rec, l_vq, l_commit = vq_loss_terms(x, x_tilde, z_e, z_q_bar, beta)
        return {"loss": l_rec + l_vq + l_commit, "loss_recons": l_rec,
                "loss_vq": l_vq, "loss_commit": l_commit}

    return train_step, eval_step


def train_vqvae(
    state: VqvaeTrainState,
    d: VQVAEGanDef,
    adam: AdamConfig,
    train_batches,
    val_iid_batches,
    val_ood_batches,
    num_epochs: int,
    beta: float = 0.25,
    frozen_decoder: bool = True,
    metrics_writer=None,
    report_cb=None,
):
    """Epoch driver: best model by val_ood recon (reference
    src/training/vq_vae.py:240-245). Returns (state, history, best_epoch).

    report_cb(epoch, state): optional per-epoch artifact hook — the stage
    uses it for the reference's img_loss_{phase}_{epoch+1}.png recon panels
    (vq_vae.py:221-227)."""
    train_step, eval_step = make_vqvae_steps(d, adam, beta, frozen_decoder)
    # component keys use the reference's names so its plot_training figures
    # (reconstruction_loss.png / vq_loss.png) read the history unchanged
    # (reference vq_vae.py:229-232)
    history = {"train_loss": [], "val_iid_loss": [], "val_ood_loss": [],
               "train_loss_recons": [], "train_loss_vq": [],
               "val_ood_loss_recons": [], "val_ood_loss_vq": []}
    best = float("inf")
    best_epoch = 0
    best_params, best_ms = state.params, state.model_state

    def _mean(vals):
        return float(jnp.mean(jnp.stack(vals))) if vals else float("nan")

    for epoch in range(num_epochs):
        tl, tl_rec, tl_vq = [], [], []
        for x, _y in train_batches(epoch):
            state, m = train_step(state, x)
            tl.append(m["loss"])
            tl_rec.append(m["loss_recons"])
            tl_vq.append(m["loss_vq"])
        vi = [eval_step(state, x)["loss_recons"] for x, _y in val_iid_batches(epoch)]
        vom = [eval_step(state, x) for x, _y in val_ood_batches(epoch)]
        vo = [m["loss_recons"] for m in vom]
        tr, viid, vood = _mean(tl), _mean(vi), _mean(vo)
        history["train_loss"].append(tr)
        history["val_iid_loss"].append(viid)
        history["val_ood_loss"].append(vood)
        history["train_loss_recons"].append(_mean(tl_rec))
        history["train_loss_vq"].append(_mean(tl_vq))
        history["val_ood_loss_recons"].append(vood)
        history["val_ood_loss_vq"].append(_mean([m["loss_vq"] for m in vom]))
        if metrics_writer is not None:
            metrics_writer.append(epoch, train_loss=tr, val_iid_loss=viid, val_ood_loss=vood)
        if report_cb is not None:
            report_cb(epoch, state)
        # empty val_ood set → vood is NaN and `nan < best` is always False,
        # which would silently keep the RANDOM INIT as "best"; fall back to
        # val_iid, then train loss (same guard as run_inverter's phases)
        sel = next((v for v in (vood, viid, tr) if not math.isnan(v)), vood)
        if sel < best:
            best, best_epoch = sel, epoch
            best_params, best_ms = state.params, state.model_state

    state = state._replace(params=best_params, model_state=best_ms)
    return state, history, best_epoch
