"""CAE training (denoising / reconstruction) + embedding extraction.

Re-designs the reference CAE stage (src/training/cae.py +
src/evaluation/util_cae.py:168-281) as jitted steps:

- 'denoising' task corrupts inputs with clipped gaussian noise
  (noise_factor 0.3, util_cae.py:28-31) before encoding;
- 'reconstruction' trains on clean inputs;
- test epoch evaluates the loss over the CONCATENATED outputs (one global
  MSE, not a batch mean-of-means — util_cae.py:216-219); with equal batch
  sizes these coincide, which epoch_batches(drop_last=True) guarantees;
- `encode_dataset` replaces create_encoded_sample(_batch)
  (util_cae.py:44-94): one chunked device sweep → [N, latent] embeddings.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gan_discovery_pso_tpu.core.config import AdamConfig
from gan_discovery_pso_tpu.models.cae import (
    CAEDef,
    add_noise,
    cae_decoder_apply,
    cae_decoder_init,
    cae_encoder_apply,
    cae_encoder_init,
)
from gan_discovery_pso_tpu.train.common import make_optimizer


class CaeTrainState(NamedTuple):
    enc_params: dict
    enc_state: dict
    dec_params: dict
    dec_state: dict
    opt_state: optax.OptState
    step: jax.Array


def cae_init(key, d: CAEDef, adam: AdamConfig) -> tuple[CaeTrainState, optax.GradientTransformation]:
    tx = make_optimizer(adam)

    @jax.jit  # one fused init program (core.jit_init rationale)
    def build(k):
        ke, kd = jax.random.split(k)
        ep, es = cae_encoder_init(ke, d)
        dp, ds = cae_decoder_init(kd, d)
        return ep, es, dp, ds, tx.init({"enc": ep, "dec": dp})

    ep, es, dp, ds, opt = build(key)
    return (
        CaeTrainState(ep, es, dp, ds, opt,
                      jnp.asarray(0, jnp.int32)),
        tx,
    )


def make_cae_steps(d: CAEDef, adam: AdamConfig, task: str = "denoising",
                   noise_factor: float = 0.3):
    if task not in ("denoising", "reconstruction"):
        raise ValueError(task)
    tx = make_optimizer(adam)

    @jax.jit
    def train_step(state: CaeTrainState, x, key):
        inp = add_noise(key, x, noise_factor) if task == "denoising" else x

        def loss_fn(p):
            z, new_es = cae_encoder_apply(p["enc"], state.enc_state, inp, train=True)
            rec, new_ds = cae_decoder_apply(p["dec"], state.dec_state, z, train=True)
            return jnp.mean((rec - x) ** 2), (new_es, new_ds)

        (loss, (new_es, new_ds)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            {"enc": state.enc_params, "dec": state.dec_params}
        )
        updates, new_opt = tx.update(grads, state.opt_state,
                                     {"enc": state.enc_params, "dec": state.dec_params})
        new_p = optax.apply_updates({"enc": state.enc_params, "dec": state.dec_params}, updates)
        return (
            CaeTrainState(new_p["enc"], new_es, new_p["dec"], new_ds, new_opt, state.step + 1),
            loss,
        )

    @jax.jit
    def eval_step(state: CaeTrainState, x, key):
        inp = add_noise(key, x, noise_factor) if task == "denoising" else x
        z, _ = cae_encoder_apply(state.enc_params, state.enc_state, inp, train=False)
        rec, _ = cae_decoder_apply(state.dec_params, state.dec_state, z, train=False)
        return jnp.mean((rec - x) ** 2)

    return train_step, eval_step


def train_cae(key, d: CAEDef, adam: AdamConfig, train_batches, val_batches,
              num_epochs: int, task: str = "denoising", noise_factor: float = 0.3,
              metrics_writer=None):
    """Epoch driver; returns (state, history). Best model = final (the
    reference keeps the last epoch and saves encoder.pt/decoder.pt,
    src/training/cae.py:205-206)."""
    state, _ = cae_init(key, d, adam)
    train_step, eval_step = make_cae_steps(d, adam, task, noise_factor)
    history = {"train_loss": [], "val_loss": []}
    nkey = jax.random.fold_in(key, 1)
    for epoch in range(num_epochs):
        tkey = jax.random.fold_in(nkey, 2 * epoch)
        vkey = jax.random.fold_in(nkey, 2 * epoch + 1)
        losses = []
        for b, (x, _y) in enumerate(train_batches(epoch)):
            state, loss = train_step(state, x, jax.random.fold_in(tkey, b))
            losses.append(loss)
        tr = float(jnp.mean(jnp.stack(losses)))
        vlosses = [
            eval_step(state, x, jax.random.fold_in(vkey, b))
            for b, (x, _y) in enumerate(val_batches(epoch))
        ]
        va = float(jnp.mean(jnp.stack(vlosses))) if vlosses else float("nan")
        history["train_loss"].append(tr)
        history["val_loss"].append(va)
        if metrics_writer is not None:
            metrics_writer.append(epoch, train_loss=tr, val_loss=va)
    return state, history


def encode_dataset(state: CaeTrainState, images: jax.Array, chunk: int = 2048) -> np.ndarray:
    """[N, latent] CAE embeddings — the encoded_samples_train.csv contract
    (reference src/training/cae.py:214, util_cae.py:44-94) as one chunked
    device sweep."""

    @jax.jit
    def enc(x):
        z, _ = cae_encoder_apply(state.enc_params, state.enc_state, x, train=False)
        return z

    out = [np.asarray(enc(images[i : i + chunk])) for i in range(0, images.shape[0], chunk)]
    return np.concatenate(out, axis=0)


def save_encoded_samples_csv(path, embeddings: np.ndarray, labels: np.ndarray):
    """var_0..var_{d-1},label CSV (reference util_cae.py:66-72 layout)."""
    import pandas as pd

    df = pd.DataFrame(embeddings, columns=[f"var_{i}" for i in range(embeddings.shape[1])])
    df["label"] = np.asarray(labels)
    df.to_csv(path, index=False)
    return df
