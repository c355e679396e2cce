"""GAN quality metrics: IS, denoise-recon, polarization stats, and the
per-epoch eval driver.

Replaces the reference eval phase (src/utils/util_dcgan.py:240-270) — which
funnels 12,800 batch-1 generator samples through a DataLoader, pandas and
per-image sklearn calls — with fused device programs: batched sampling,
batched CAE encoding, one-shot FID/IS/recon.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.evaluation.classifiers import KnnBattery, compute_posterior
from gan_discovery_pso_tpu.evaluation.fid import fid_from_features
from gan_discovery_pso_tpu.models.cae import (
    add_noise,
    cae_decoder_apply,
    cae_encoder_apply,
)


@jax.jit
def inception_score(p_yx: jax.Array, eps: float = 1e-16) -> jax.Array:
    """exp(E_x[KL(p(y|x) ‖ p(y))]) from the battery posterior
    (reference src/evaluation/util_gan_evaluation.py:84-95)."""
    p_y = jnp.mean(p_yx, axis=0, keepdims=True)
    kl = p_yx * (jnp.log(p_yx + eps) - jnp.log(p_y + eps))
    return jnp.exp(jnp.mean(jnp.sum(kl, axis=1)))


@jax.jit
def denoise_recon_loss(
    key, enc_params, enc_state, dec_params, dec_state, images, noise_factor: float = 0.3
) -> jax.Array:
    """CAE denoising reconstruction MSE on a batch (reference
    util_gan_evaluation.py:106-133, batched instead of per-image)."""
    noisy = add_noise(key, images, noise_factor)
    z, _ = cae_encoder_apply(enc_params, enc_state, noisy, train=False)
    rec, _ = cae_decoder_apply(dec_params, dec_state, z, train=False)
    return jnp.mean((rec - images) ** 2)


def posterior_energy(p_yx: jax.Array) -> jax.Array:
    """Σ_c p(c|x)² per image (reference util_gan_evaluation.py:161-162)."""
    return jnp.sum(p_yx * p_yx, axis=1)


def posterior_variance(p_yx: jax.Array) -> jax.Array:
    """Var_c p(c|x) per image (reference util_gan_evaluation.py:164-165)."""
    return jnp.var(p_yx, axis=1)


class GanEvalResult(NamedTuple):
    fid: jax.Array
    inception_score: jax.Array
    rec_loss_syn: jax.Array
    p_yx: jax.Array  # [N, C] battery posterior on synthetic samples
    energy: jax.Array  # [N]
    variance: jax.Array  # [N]


# module-level with params as ARGUMENTS: one executable serves every epoch
# and every CAE of the same shapes (a per-call @jax.jit closure would start
# with an empty jit cache each epoch and retrace twice per call)
@jax.jit
def _cae_encode(cae_enc, cae_enc_state, imgs):
    z, _ = cae_encoder_apply(cae_enc, cae_enc_state, imgs, train=False)
    return z


def evaluate_gan_epoch(
    key,
    sample_fn,
    gen_params,
    gen_state,
    cae_enc,
    cae_enc_state,
    cae_dec,
    cae_dec_state,
    battery: KnnBattery,
    real_images01: jax.Array,
    n_synthetic: int = 12800,
    noise_factor: float = 0.3,
    chunk: int = 1280,
    enc_real: jax.Array | None = None,
) -> GanEvalResult:
    """The full per-epoch eval (reference util_dcgan.py:240-270):
    sample n_synthetic images (chunked to bound HBM), CAE-encode real +
    synthetic, FID, battery-posterior IS, denoise recon on synthetic.

    real_images01: [M,C,H,W] in [0,1] (the val loader's drange).
    enc_real: optional precomputed CAE embeddings of real_images01 — the
    frozen CAE makes them constant across a GAN run, so epoch loops should
    encode the val set ONCE and pass them in (run_dcgan does)."""
    ks, kn = jax.random.split(key)

    def encode(imgs):
        return _cae_encode(cae_enc, cae_enc_state, imgs)

    syn_chunks = []
    emb_syn = []
    for i in range(0, n_synthetic, chunk):
        b = min(chunk, n_synthetic - i)
        imgs = sample_fn(gen_params, gen_state, jax.random.fold_in(ks, i), b)
        syn_chunks.append(imgs)
        emb_syn.append(encode(imgs))
    synthetic = jnp.concatenate(syn_chunks, axis=0)
    enc_syn = jnp.concatenate(emb_syn, axis=0)
    if enc_real is None:
        enc_real = encode(real_images01)

    fid = fid_from_features(enc_real, enc_syn)
    p_yx = compute_posterior(battery, enc_syn)
    is_score = inception_score(p_yx)
    rec = denoise_recon_loss(
        kn, cae_enc, cae_enc_state, cae_dec, cae_dec_state, synthetic, noise_factor
    )
    return GanEvalResult(
        fid=fid,
        inception_score=is_score,
        rec_loss_syn=rec,
        p_yx=p_yx,
        energy=posterior_energy(p_yx),
        variance=posterior_variance(p_yx),
    )
