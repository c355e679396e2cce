"""Hands-on: train a small VQ-VAE on synthetic digits and inspect the
codebook — the reference's pedagogical hands_on/vq_vae stack
(reference src/hands_on/vq_vae/*, a VQ-VAE without the PSO codebook init)
as one short script against the library's real model code.

Run: python examples/vqvae_demo.py  (CPU or TPU; ~a minute on either)
"""

import sys
from pathlib import Path

# runnable as a plain script: Python puts the script's dir on sys.path,
# not the cwd, so add the repo root for the package import
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import optax

from gan_discovery_pso_tpu.core import seed_all
from gan_discovery_pso_tpu.data import load_mnist
from gan_discovery_pso_tpu.models import get_vqvae, vq_loss_terms
from gan_discovery_pso_tpu.analysis import reporting

STEPS = 100
BATCH = 64


def main():
    keys = seed_all(0)
    Def, init, apply = get_vqvae("vqvae_mnist")
    d = Def(embedded_dim=16, num_embedding=64, num_hiddens=32)
    params, state = init(keys("vqvae"), d)

    ds = load_mnist("./data/data_raw", "train", drange=(-1, 1))
    x_all = np.asarray(ds.images[:512], np.float32)
    print(f"data: {len(x_all)} images ({ds.source})")

    tx = optax.adam(5e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, state, opt, x):
        def loss_fn(p):
            x_tilde, z_e, z_q_bar, idx, new_state = apply(p, state, x, d, train=True)
            lr_, lvq, lc = vq_loss_terms(x, x_tilde, z_e, z_q_bar)
            return lr_ + lvq + lc, (lr_, lvq, idx, new_state)

        (loss, (l_rec, l_vq, idx, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_state, opt, l_rec, l_vq, idx

    rng = np.random.RandomState(0)
    for i in range(STEPS):
        x = x_all[rng.choice(len(x_all), BATCH, replace=False)]
        params, state, opt, l_rec, l_vq, idx = step(params, state, opt, x)
        if i % 10 == 0 or i == STEPS - 1:
            # with a 1x1 latent each image maps to ONE code, so on the ~10
            # synthetic digit shapes a handful of active codes is the
            # expected steady state (the vq term spikes while the codebook
            # chases the still-moving encoder — normal early VQ dynamics)
            used = len(np.unique(np.asarray(idx)))
            print(f"step {i:3d}: recons={float(l_rec):.4f} vq={float(l_vq):.4f} "
                  f"codebook codes in use: {used}/{d.num_embedding}")

    # reconstruction grid: originals on top, reconstructions below
    x = x_all[:8]
    x_tilde, *_ = apply(params, state, x, d, train=False)
    grid = np.concatenate([x, np.asarray(x_tilde)], axis=0)
    reporting.image_grid((grid + 1) / 2, "examples_vqvae_recon.png", ncols=8)
    print("wrote examples_vqvae_recon.png (top: real, bottom: reconstruction)")


if __name__ == "__main__":
    main()
