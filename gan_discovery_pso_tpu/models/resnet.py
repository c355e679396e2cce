"""Assessor CNNs: bottleneck ResNet-50/101/152 and the small AlexNet.

Faithful re-implementations of the reference assessors
(reference src/pso/util_cnn.py:81-249) including their quirks:

- the pooling head named `avgpool` is actually `AdaptiveMaxPool2d((1,1))`
  (util_cnn.py:99) — a global MAX pool;
- conv layers are bias-free, the fc head is Linear(512·4, n_class);
- `forward_avgpool` returns the pooled 2048-d feature (the perceptual-loss
  head used by the inverter, util_cnn.py:119-133);
- class_to_idx maps sorted IiD class labels to logit columns
  (util_cnn.py:90-91).

Layer counts: ResNet50 [3,4,6,3], ResNet101 [3,4,23,3], ResNet152 [3,8,36,3]
(util_cnn.py:31-36).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.models import layers as L
from gan_discovery_pso_tpu.ops import (
    adaptive_max_pool2d,
    batch_norm_eval,
    batch_norm_train,
    conv2d,
    max_pool2d,
)

_LAYERS = {"ResNet50": (3, 4, 6, 3), "ResNet101": (3, 4, 23, 3), "ResNet152": (3, 8, 36, 3)}
_EXPANSION = 4


class ResNetDef(NamedTuple):
    model_name: str = "ResNet50"
    image_channels: int = 1
    n_class: int = 2
    iid_classes: tuple = ()

    @property
    def layers(self) -> tuple:
        return _LAYERS[self.model_name]

    def class_to_idx(self) -> dict:
        return {c: i for i, c in enumerate(sorted(self.iid_classes))}


def resnet_init(key, d: ResNetDef, init: str = "torch_default"):
    """Returns (params, state). `init` may be 'glorot_normal' / 'he_normal' /
    'random_normal' to mirror the reference's initialize_weights options
    (util_cnn.py:65-79, applied to Conv2d/Linear only)."""
    keys = iter(jax.random.split(key, 4096))
    params: dict = {
        "conv1": L.conv_params(next(keys), d.image_channels, 64, 7, bias=False, init=init),
        "bn1": L.bn_params(64),
    }
    state: dict = {"bn1": L.bn_state(64)}

    in_ch = 64
    for li, (n_blocks, width, stride) in enumerate(
        zip(d.layers, (64, 128, 256, 512), (1, 2, 2, 2)), start=1
    ):
        blocks = []
        bstates = []
        for bi in range(n_blocks):
            s = stride if bi == 0 else 1
            need_ds = bi == 0 and (s != 1 or in_ch != width * _EXPANSION)
            bp = {
                "conv1": L.conv_params(next(keys), in_ch, width, 1, bias=False, init=init),
                "bn1": L.bn_params(width),
                "conv2": L.conv_params(next(keys), width, width, 3, bias=False, init=init),
                "bn2": L.bn_params(width),
                "conv3": L.conv_params(next(keys), width, width * _EXPANSION, 1, bias=False, init=init),
                "bn3": L.bn_params(width * _EXPANSION),
            }
            bs = {
                "bn1": L.bn_state(width),
                "bn2": L.bn_state(width),
                "bn3": L.bn_state(width * _EXPANSION),
            }
            if need_ds:
                bp["ds_conv"] = L.conv_params(
                    next(keys), in_ch, width * _EXPANSION, 1, bias=False, init=init
                )
                bp["ds_bn"] = L.bn_params(width * _EXPANSION)
                bs["ds_bn"] = L.bn_state(width * _EXPANSION)
            blocks.append(bp)
            bstates.append(bs)
            in_ch = width * _EXPANSION
        params[f"layer{li}"] = blocks
        state[f"layer{li}"] = bstates

    params["fc"] = L.linear_params(next(keys), 512 * _EXPANSION, d.n_class, init=init)
    return params, state


def _bottleneck(bp, bs, x, stride, train):
    identity = x
    new_bs = {}
    h = conv2d(x, bp["conv1"]["w"], stride=1, padding=0)
    h, new_bs["bn1"] = _bn(bp["bn1"], bs["bn1"], h, train)
    h = jax.nn.relu(h)
    h = conv2d(h, bp["conv2"]["w"], stride=stride, padding=1)
    h, new_bs["bn2"] = _bn(bp["bn2"], bs["bn2"], h, train)
    h = jax.nn.relu(h)
    h = conv2d(h, bp["conv3"]["w"], stride=1, padding=0)
    h, new_bs["bn3"] = _bn(bp["bn3"], bs["bn3"], h, train)
    if "ds_conv" in bp:
        identity = conv2d(identity, bp["ds_conv"]["w"], stride=stride, padding=0)
        identity, new_bs["ds_bn"] = _bn(bp["ds_bn"], bs["ds_bn"], identity, train)
    return jax.nn.relu(h + identity), new_bs


def _trunk(params, state, x, d: ResNetDef, train):
    new_state = {}
    h = conv2d(x, params["conv1"]["w"], stride=2, padding=3)
    h, new_state["bn1"] = _bn(params["bn1"], state["bn1"], h, train)
    h = jax.nn.relu(h)
    h = max_pool2d(h, 3, 2, 1)
    for li, stride in zip((1, 2, 3, 4), (1, 2, 2, 2)):
        blocks, bstates, new_bstates = params[f"layer{li}"], state[f"layer{li}"], []
        for bi, (bp, bs) in enumerate(zip(blocks, bstates)):
            h, nbs = _bottleneck(bp, bs, h, stride if bi == 0 else 1, train)
            new_bstates.append(nbs)
        new_state[f"layer{li}"] = new_bstates
    h = adaptive_max_pool2d(h, (1, 1))  # MAX pool — reference quirk
    return h.reshape(h.shape[0], -1), new_state


def resnet_apply(params, state, x, d: ResNetDef, train: bool = False):
    """x [N,C,H,W] → (logits [N, n_class], new_state)."""
    feat, new_state = _trunk(params, state, x, d, train)
    return L.linear(params["fc"], feat), new_state


def resnet_features(params, state, x, d: ResNetDef):
    """The `forward_avgpool` perceptual feature head [N, 2048]
    (reference util_cnn.py:119-133). Eval mode."""
    feat, _ = _trunk(params, state, x, d, train=False)
    return feat


def _bn(p, s, x, train):
    if train:
        return batch_norm_train(x, p["scale"], p["bias"], s)
    return batch_norm_eval(x, p["scale"], p["bias"], s), s


def change_classifier_head(key, params, n_class: int, init: str = "torch_default"):
    """Re-head the fc layer for transfer (reference
    src/pso/util_pso_inverter.py:10-12 `change_classifier_n_class`)."""
    new = dict(params)
    new["fc"] = L.linear_params(key, 512 * _EXPANSION, n_class, init=init)
    return new


# -- AlexNet (reference util_cnn.py:193-249) ---------------------------------


class AlexNetDef(NamedTuple):
    image_channels: int = 1
    n_class: int = 2
    img_size: int = 64
    kernel: int = 3
    padding: int = 0  # reference config uses 'valid' → 0
    alpha: float = 0.2  # LeakyReLU slope
    iid_classes: tuple = ()
    # reference get_activation (util_cnn.py:48-54): 'LeakyReLU' | 'ReLU',
    # selected by the config's model_cnn.network.cnn_activation
    activation: str = "LeakyReLU"

    def class_to_idx(self) -> dict:
        """Sorted-label → logit-column map (reference util_cnn.py:204-205)."""
        return {c: i for i, c in enumerate(sorted(self.iid_classes))}

    def conv_sizes(self) -> list:
        """Spatial size after each conv+pool (the reference derives this with
        a dry forward, util_cnn.py:207-235)."""
        s = self.img_size
        sizes = []
        for _ in range(4):
            s = s + 2 * self.padding - self.kernel + 1  # conv stride 1
            s = s // 2  # maxpool (2,2)
            sizes.append(s)
        return sizes

    @property
    def to_linear(self) -> int:
        return 256 * self.conv_sizes()[-1] ** 2


def alexnet_init(key, d: AlexNetDef, init: str = "glorot_normal"):
    ks = jax.random.split(key, 7)
    params = {
        "conv1": L.conv_params(ks[0], d.image_channels, 32, d.kernel, init=init),
        "conv2": L.conv_params(ks[1], 32, 64, d.kernel, init=init),
        "conv3": L.conv_params(ks[2], 64, 128, d.kernel, init=init),
        "conv4": L.conv_params(ks[3], 128, 256, d.kernel, init=init),
        "fc1": L.linear_params(ks[4], d.to_linear, 256, init=init),
        "fc2": L.linear_params(ks[5], 256, 256, init=init),
        "fc3": L.linear_params(ks[6], 256, d.n_class, init=init),
    }
    return params, {}


def alexnet_apply(params, state, x, d: AlexNetDef, train: bool = False, dropout_key=None):
    if d.activation == "ReLU":
        act = jax.nn.relu
    elif d.activation == "LeakyReLU":
        act = lambda h: jax.nn.leaky_relu(h, d.alpha)
    else:  # mirror the reference's get_activation ValueError (util_cnn.py:54)
        raise ValueError(d.activation)
    h = x
    for name in ("conv1", "conv2", "conv3", "conv4"):
        h = conv2d(h, params[name]["w"], params[name]["b"], stride=1, padding=d.padding)
        h = act(h)
        h = max_pool2d(h, 2)
    h = h.reshape(h.shape[0], -1)
    h = act(L.linear(params["fc1"], h))
    h = _dropout2d_like(h, train, dropout_key, 0)
    h = act(L.linear(params["fc2"], h))
    h = _dropout2d_like(h, train, dropout_key, 1)
    return L.linear(params["fc3"], h), state


def _dropout2d_like(h, train, key, salt):
    """The reference applies nn.Dropout2d(0.5) on 2-D activations
    (util_cnn.py:214,244-247) — torch then drops whole rows (per-sample
    channels); on a [N, F] tensor that zeroes entire samples. We reproduce
    standard elementwise dropout instead when training (the torch behavior on
    2-D input is a warning-documented accident, not intent)."""
    if not train or key is None:
        return h
    k = jax.random.fold_in(key, salt)
    keep = jax.random.bernoulli(k, 0.5, h.shape)
    return jnp.where(keep, h / 0.5, 0.0)


def assessor_apply(params, state, x, mdef, train: bool = False, **kw):
    """Forward for EITHER assessor family — the reference's get_cnn
    indirection (util_cnn.py:24-38) means any entry that loads a CNN from
    config may get a ResNet or an AlexNet; dispatch on the def type so the
    discovery/inversion fitness paths work with both."""
    if isinstance(mdef, AlexNetDef):
        return alexnet_apply(params, state, x, mdef, train=train, **kw)
    return resnet_apply(params, state, x, mdef, train=train, **kw)
