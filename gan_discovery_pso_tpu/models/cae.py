"""Denoising convolutional autoencoder — the framework's FID/IS feature net.

The reference replaces InceptionV3 with this CAE for all GAN-quality metrics
(reference src/evaluation/util_cae.py:103-165):

Encoder (input 1×28×28):
    Conv(1, 8, k3, s2, p1) + ReLU        → [N, 8, 14, 14]
    Conv(8, 16, k3, s2, p1) + BN + ReLU  → [N, 16, 7, 7]
    Conv(16, 32, k3, s2, p0) + ReLU      → [N, 32, 3, 3]
    flatten → Linear(288, 128) + ReLU → Linear(128, latent)

Decoder:
    Linear(latent, 128) + ReLU → Linear(128, 288) + ReLU → unflatten (32,3,3)
    ConvT(32, 16, k3, s2, p0)        + BN + ReLU  → [N, 16, 7, 7]
    ConvT(16, 8,  k3, s2, p1, op1)   + BN + ReLU  → [N, 8, 14, 14]
    ConvT(8,  1,  k3, s2, p1, op1)   + Sigmoid    → [N, 1, 28, 28]
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


class CAEDef(NamedTuple):
    latent_dim: int = 10


def cae_encoder_init(key, d: CAEDef):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "conv1": L.conv_params(k1, 1, 8, 3),
        "conv2": L.conv_params(k2, 8, 16, 3),
        "bn2": L.bn_params(16),
        "conv3": L.conv_params(k3, 16, 32, 3),
        "fc1": L.linear_params(k4, 3 * 3 * 32, 128),
        "fc2": L.linear_params(k5, 128, d.latent_dim),
    }
    return params, {"bn2": L.bn_state(16)}


def cae_encoder_apply(params, state, x, train: bool = False):
    h = jax.nn.relu(conv2d(x, params["conv1"]["w"], params["conv1"]["b"], stride=2, padding=1))
    h = conv2d(h, params["conv2"]["w"], params["conv2"]["b"], stride=2, padding=1)
    if train:
        h, s2 = batch_norm_train(h, params["bn2"]["scale"], params["bn2"]["bias"], state["bn2"])
    else:
        h, s2 = batch_norm_eval(h, params["bn2"]["scale"], params["bn2"]["bias"], state["bn2"]), state["bn2"]
    h = jax.nn.relu(h)
    h = jax.nn.relu(conv2d(h, params["conv3"]["w"], params["conv3"]["b"], stride=2, padding=0))
    h = h.reshape(h.shape[0], -1)  # torch Flatten(start_dim=1) on NCHW
    h = jax.nn.relu(L.linear(params["fc1"], h))
    z = L.linear(params["fc2"], h)
    return z, {"bn2": s2}


def cae_decoder_init(key, d: CAEDef):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "fc1": L.linear_params(k1, d.latent_dim, 128),
        "fc2": L.linear_params(k2, 128, 3 * 3 * 32),
        "convt1": L.conv_transpose_params(k3, 32, 16, 3),
        "bn1": L.bn_params(16),
        "convt2": L.conv_transpose_params(k4, 16, 8, 3),
        "bn2": L.bn_params(8),
        "convt3": L.conv_transpose_params(k5, 8, 1, 3),
    }
    return params, {"bn1": L.bn_state(16), "bn2": L.bn_state(8)}


def cae_decoder_apply(params, state, z, train: bool = False):
    h = jax.nn.relu(L.linear(params["fc1"], z))
    h = jax.nn.relu(L.linear(params["fc2"], h))
    h = h.reshape(h.shape[0], 32, 3, 3)
    h = conv_transpose2d(h, params["convt1"]["w"], params["convt1"]["b"], stride=2, padding=0)
    if train:
        h, s1 = batch_norm_train(h, params["bn1"]["scale"], params["bn1"]["bias"], state["bn1"])
    else:
        h, s1 = batch_norm_eval(h, params["bn1"]["scale"], params["bn1"]["bias"], state["bn1"]), state["bn1"]
    h = jax.nn.relu(h)
    h = conv_transpose2d(h, params["convt2"]["w"], params["convt2"]["b"], stride=2, padding=1, output_padding=1)
    if train:
        h, s2 = batch_norm_train(h, params["bn2"]["scale"], params["bn2"]["bias"], state["bn2"])
    else:
        h, s2 = batch_norm_eval(h, params["bn2"]["scale"], params["bn2"]["bias"], state["bn2"]), state["bn2"]
    h = jax.nn.relu(h)
    h = conv_transpose2d(h, params["convt3"]["w"], params["convt3"]["b"], stride=2, padding=1, output_padding=1)
    return jax.nn.sigmoid(h), {"bn1": s1, "bn2": s2}


def add_noise(key, x, noise_factor: float = 0.3):
    """Denoising corruption: x + N(0,1)·nf, clipped to [0,1]
    (reference src/evaluation/util_cae.py:28-31)."""
    return jnp.clip(x + noise_factor * jax.random.normal(key, x.shape, x.dtype), 0.0, 1.0)
