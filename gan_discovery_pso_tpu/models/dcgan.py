"""DCGAN generator / discriminator as pure functions of (params, state, x).

Architectures reproduce the reference nets exactly (fp32 parity tested
against torch in tests/test_models_parity.py):

- Generator (reference src/utils/util_dcgan.py:128-149):
    z [N, z_dim, 1, 1]
      → ConvT(z_dim, 2f, k7, s1, p0) + BN + ReLU   → [N, 2f, 7, 7]
      → ConvT(2f,   f,  k4, s2, p1) + BN + ReLU    → [N, f, 14, 14]
      → ConvT(f,    C,  k4, s2, p1) + Tanh         → [N, C, 28, 28]

- Discriminator (reference src/utils/util_dcgan.py:103-125):
    x [N, C, 28, 28]
      → Conv(C,  f,  k4, s2, p1) + LeakyReLU(0.2)  → [N, f, 14, 14]
      → Conv(f,  2f, k4, s2, p1) + LeakyReLU(0.2)  → [N, 2f, 7, 7]
      → Conv(2f, 1,  k7, s2, p0) + Sigmoid         → [N, 1, 1, 1]

The DCGAN-paper N(0, 0.02) re-init covers conv/convT/BN *weights* only,
leaving biases at torch defaults (reference util_dcgan.py:45-48) — we do the
same so parameter statistics match.

The encoder-inverter reuses these exact nets (reference
src/inverter/utils_ae/util_inverter.py:95-140 duplicates them verbatim).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.models import layers as L
from gan_discovery_pso_tpu.ops import (
    batch_norm_eval,
    batch_norm_train,
    conv2d,
    conv_transpose2d,
)


class GeneratorDef(NamedTuple):
    z_dim: int
    channels_img: int = 1
    features_g: int = 64


class DiscriminatorDef(NamedTuple):
    channels_img: int = 1
    features_d: int = 64


# -- Generator ----------------------------------------------------------------


def generator_init(key, d: GeneratorDef, dcgan_init: bool = True):
    """Returns (params, state). `dcgan_init` applies N(0,0.02) to conv/BN
    weights (reference initialize_weights, util_dcgan.py:45-48)."""
    k1, k2, k3, kb1, kb2 = jax.random.split(key, 5)
    f = d.features_g
    winit = "random_normal" if dcgan_init else "torch_default"
    params = {
        "convt1": L.conv_transpose_params(k1, d.z_dim, f * 2, 7, init=winit),
        "bn1": L.bn_params(f * 2, init=winit if dcgan_init else "torch_default", key=kb1),
        "convt2": L.conv_transpose_params(k2, f * 2, f, 4, init=winit),
        "bn2": L.bn_params(f, init=winit if dcgan_init else "torch_default", key=kb2),
        "convt3": L.conv_transpose_params(k3, f, d.channels_img, 4, init=winit),
    }
    state = {"bn1": L.bn_state(f * 2), "bn2": L.bn_state(f)}
    return params, state


def generator_apply(params, state, z, train: bool = False):
    """z [N, z_dim, 1, 1] → (img [N, C, 28, 28] in [-1,1], new_state)."""
    h = conv_transpose2d(z, params["convt1"]["w"], params["convt1"]["b"], stride=1, padding=0)
    h, s1 = _bn(params["bn1"], state["bn1"], h, train)
    h = jax.nn.relu(h)
    h = conv_transpose2d(h, params["convt2"]["w"], params["convt2"]["b"], stride=2, padding=1)
    h, s2 = _bn(params["bn2"], state["bn2"], h, train)
    h = jax.nn.relu(h)
    h = conv_transpose2d(h, params["convt3"]["w"], params["convt3"]["b"], stride=2, padding=1)
    img = jnp.tanh(h)
    return img, {"bn1": s1, "bn2": s2}


def generator_forward(params, state, z):
    """Eval-mode forward (the PSO fitness path): no state update."""
    img, _ = generator_apply(params, state, z, train=False)
    return img


# -- Discriminator --------------------------------------------------------------


def discriminator_init(key, d: DiscriminatorDef, dcgan_init: bool = True):
    k1, k2, k3 = jax.random.split(key, 3)
    f = d.features_d
    winit = "random_normal" if dcgan_init else "torch_default"
    params = {
        "conv1": L.conv_params(k1, d.channels_img, f, 4, init=winit),
        "conv2": L.conv_params(k2, f, f * 2, 4, init=winit),
        "conv3": L.conv_params(k3, f * 2, 1, 7, init=winit),
    }
    return params, {}  # no BN in the reference D (commented out, util_dcgan.py:120)


def _disc_trunk(params, x):
    """Shared pre-sigmoid conv trunk — single source of truth for BOTH the
    sigmoid forward and the stable-BCE logits path."""
    h = conv2d(x, params["conv1"]["w"], params["conv1"]["b"], stride=2, padding=1)
    h = jax.nn.leaky_relu(h, 0.2)
    h = conv2d(h, params["conv2"]["w"], params["conv2"]["b"], stride=2, padding=1)
    h = jax.nn.leaky_relu(h, 0.2)
    return conv2d(h, params["conv3"]["w"], params["conv3"]["b"], stride=2, padding=0)


def discriminator_apply(params, state, x, train: bool = False):
    del train  # D is stateless
    return jax.nn.sigmoid(_disc_trunk(params, x)), state


def discriminator_logits(params, x):
    """Pre-sigmoid logits [N] — used by losses that want the stable
    `sigmoid_binary_cross_entropy` formulation."""
    h = _disc_trunk(params, x)
    return h.reshape(h.shape[0])


def _bn(p, s, x, train):
    if train:
        return batch_norm_train(x, p["scale"], p["bias"], s)
    return batch_norm_eval(x, p["scale"], p["bias"], s), s
