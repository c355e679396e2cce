"""Inverter encoders E: image → z (the GAN inversion nets).

- `Encoder` mirrors the discriminator's conv stack but ends in `enc_dim`
  channels with no sigmoid (reference
  src/inverter/utils_ae/util_inverter.py:164-184):
    x [N, C, 28, 28]
      → Conv(C,  f,  k4, s2, p1) + LeakyReLU(0.2)   → [N, f, 14, 14]
      → Conv(f,  2f, k4, s2, p1) + LeakyReLU(0.2)   → [N, 2f, 7, 7]
      → Conv(2f, z,  k7, s2, p0)                    → [N, z, 1, 1]

- `EncoderAttGAN` is the alternative 4-layer conv+BN+ReLU stack with
  channel widths min(f·2^i, enc_dim) (reference util_inverter.py:142-162).
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from gan_discovery_pso_tpu.models import layers as L
from gan_discovery_pso_tpu.ops import batch_norm_eval, batch_norm_train, conv2d


class EncoderDef(NamedTuple):
    enc_dim: int
    channels_img: int = 1
    features_e: int = 64


def encoder_init(key, d: EncoderDef, dcgan_init: bool = True):
    k1, k2, k3 = jax.random.split(key, 3)
    f = d.features_e
    winit = "random_normal" if dcgan_init else "torch_default"
    params = {
        "conv1": L.conv_params(k1, d.channels_img, f, 4, init=winit),
        "conv2": L.conv_params(k2, f, f * 2, 4, init=winit),
        "conv3": L.conv_params(k3, f * 2, d.enc_dim, 7, init=winit),
    }
    return params, {}


def encoder_apply(params, state, x, train: bool = False):
    del train
    h = conv2d(x, params["conv1"]["w"], params["conv1"]["b"], stride=2, padding=1)
    h = jax.nn.leaky_relu(h, 0.2)
    h = conv2d(h, params["conv2"]["w"], params["conv2"]["b"], stride=2, padding=1)
    h = jax.nn.leaky_relu(h, 0.2)
    z = conv2d(h, params["conv3"]["w"], params["conv3"]["b"], stride=2, padding=0)
    return z, state  # [N, enc_dim, 1, 1]


def encoder_forward(params, x):
    z, _ = encoder_apply(params, {}, x)
    return z


class EncoderAttGANDef(NamedTuple):
    enc_dim: int
    channels_img: int = 1
    features_e: int = 16
    enc_layers: int = 4


def encoder_attgan_init(key, d: EncoderAttGANDef):
    keys = jax.random.split(key, d.enc_layers)
    params, state = {}, {}
    n_in = d.channels_img
    for i in range(d.enc_layers):
        n_out = min(d.features_e * 2**i, d.enc_dim)
        # reference Conv2dBlock: bias only when norm_fn == 'none'
        # (util_nn.py:80); AttGAN uses batchnorm -> bias=False
        params[f"conv{i}"] = L.conv_params(keys[i], n_in, n_out, 4, bias=False)
        params[f"bn{i}"] = L.bn_params(n_out)
        state[f"bn{i}"] = L.bn_state(n_out)
        n_in = n_out
    return params, state


def encoder_attgan_apply(params, state, x, train: bool = False):
    new_state = {}
    h = x
    i = 0
    while f"conv{i}" in params:
        h = conv2d(h, params[f"conv{i}"]["w"], params[f"conv{i}"].get("b"),
                   stride=2, padding=1)
        if train:
            h, new_state[f"bn{i}"] = batch_norm_train(
                h, params[f"bn{i}"]["scale"], params[f"bn{i}"]["bias"], state[f"bn{i}"]
            )
        else:
            h = batch_norm_eval(
                h, params[f"bn{i}"]["scale"], params[f"bn{i}"]["bias"], state[f"bn{i}"]
            )
            new_state[f"bn{i}"] = state[f"bn{i}"]
        h = jax.nn.relu(h)
        i += 1
    return h, new_state
