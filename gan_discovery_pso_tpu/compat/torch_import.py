"""Import reference PyTorch checkpoints into this framework's param trees.

Reference users carry trained artifacts in three torch formats (SURVEY.md
§5.4): `.tar` dicts with `model_state_dict` (checkpoint_g/best_g,
util_dcgan.py:225-238), bare `state_dict` `.pt` files (encoder.pt,
model_{label}.pt, encoder/decoder CAE), and pickled sklearn batteries. This
module converts the torch nets — whose Sequential key layout is fixed by the
reference architectures — into our pytrees (weights keep torch layouts, so
values copy verbatim; only names re-key):

    DCGAN G      gen.{0,1}.{0,1}.* / gen.2.*        → generator params+state
    DCGAN D      disc.{0,2.0,3}.*                   → discriminator params
    Encoder E    enc.{0,2.0,3}.*                    → encoder params
    CAE enc/dec  encoder_cnn/encoder_linear/...     → cae params+state
    ResNet       conv1/bn1/layer{1-4}.{i}.*/fc      → resnet params+state

torch is an optional dependency of this module only; everything else in the
framework is torch-free.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from gan_discovery_pso_tpu.ops import BatchNormStats


def load_torch_state_dict(path: str | Path) -> dict:
    """Accepts a raw state_dict .pt or a .tar-style dict with
    'model_state_dict' (reference util_dcgan.py:227-231)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in obj.items()}


def _conv(sd, prefix, bias=True):
    p = {"w": sd[f"{prefix}.weight"]}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    return p


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    state = BatchNormStats(sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"])
    return params, state


def import_generator(sd: dict):
    """Reference Generator (util_dcgan.py:128-149): gen = Sequential(
    block(ConvT,BN,ReLU), block(ConvT,BN,ReLU), ConvT, Tanh)."""
    bn1, s1 = _bn(sd, "gen.0.1")
    bn2, s2 = _bn(sd, "gen.1.1")
    params = {
        "convt1": _conv(sd, "gen.0.0"),
        "bn1": bn1,
        "convt2": _conv(sd, "gen.1.0"),
        "bn2": bn2,
        "convt3": _conv(sd, "gen.2"),
    }
    return params, {"bn1": s1, "bn2": s2}


def import_discriminator(sd: dict):
    """Reference Discriminator (util_dcgan.py:103-125): disc = Sequential(
    Conv, LReLU, block(Conv,LReLU), Conv, Sigmoid)."""
    params = {
        "conv1": _conv(sd, "disc.0"),
        "conv2": _conv(sd, "disc.2.0"),
        "conv3": _conv(sd, "disc.3"),
    }
    return params, {}


def import_encoder(sd: dict):
    """Reference inverter Encoder (util_inverter.py:164-184): enc =
    Sequential(Conv, LReLU, block(Conv,LReLU), Conv)."""
    params = {
        "conv1": _conv(sd, "enc.0"),
        "conv2": _conv(sd, "enc.2.0"),
        "conv3": _conv(sd, "enc.3"),
    }
    return params, {}


def import_cae_encoder(sd: dict):
    """Reference CAE Encoder (util_cae.py:103-131)."""
    bn2, s2 = _bn(sd, "encoder_cnn.3")
    params = {
        "conv1": _conv(sd, "encoder_cnn.0"),
        "conv2": _conv(sd, "encoder_cnn.2"),
        "bn2": bn2,
        "conv3": _conv(sd, "encoder_cnn.5"),
        "fc1": {"w": sd["encoder_linear.0.weight"], "b": sd["encoder_linear.0.bias"]},
        "fc2": {"w": sd["encoder_linear.2.weight"], "b": sd["encoder_linear.2.bias"]},
    }
    return params, {"bn2": s2}


def import_cae_decoder(sd: dict):
    """Reference CAE Decoder (util_cae.py:133-165)."""
    bn1, s1 = _bn(sd, "decoder_conv.1")
    bn2, s2 = _bn(sd, "decoder_conv.4")
    params = {
        "fc1": {"w": sd["decoder_linear.0.weight"], "b": sd["decoder_linear.0.bias"]},
        "fc2": {"w": sd["decoder_linear.2.weight"], "b": sd["decoder_linear.2.bias"]},
        "convt1": _conv(sd, "decoder_conv.0"),
        "bn1": bn1,
        "convt2": _conv(sd, "decoder_conv.3"),
        "bn2": bn2,
        "convt3": _conv(sd, "decoder_conv.6"),
    }
    return params, {"bn1": s1, "bn2": s2}


def import_resnet(sd: dict, layers=(3, 4, 6, 3)):
    """Reference Resnet (util_cnn.py:81-190): conv1/bn1 stem,
    layer{1-4}.{i}.{conv1..3,bn1..3,identity_downsample.{0,1}}, fc head.
    BN running stats map into our state tree."""
    bn1, s1 = _bn(sd, "bn1")
    params = {"conv1": _conv(sd, "conv1", bias=False), "bn1": bn1}
    state = {"bn1": s1}
    for li, n_blocks in enumerate(layers, start=1):
        blocks, bstates = [], []
        for bi in range(n_blocks):
            pfx = f"layer{li}.{bi}"
            bp, bs = {}, {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = _conv(sd, f"{pfx}.conv{ci}", bias=False)
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{pfx}.bn{ci}")
            if f"{pfx}.identity_downsample.0.weight" in sd:
                bp["ds_conv"] = _conv(sd, f"{pfx}.identity_downsample.0", bias=False)
                bp["ds_bn"], bs["ds_bn"] = _bn(sd, f"{pfx}.identity_downsample.1")
            blocks.append(bp)
            bstates.append(bs)
        params[f"layer{li}"] = blocks
        state[f"layer{li}"] = bstates
    params["fc"] = {"w": sd["fc.weight"], "b": sd["fc.bias"]}
    return params, state


_IMPORTERS = {
    "generator": import_generator,
    "discriminator": import_discriminator,
    "encoder": import_encoder,
    "cae_encoder": import_cae_encoder,
    "cae_decoder": import_cae_decoder,
    "resnet50": lambda sd: import_resnet(sd, (3, 4, 6, 3)),
    "resnet101": lambda sd: import_resnet(sd, (3, 4, 23, 3)),
    "resnet152": lambda sd: import_resnet(sd, (3, 8, 36, 3)),
}


def convert_torch_checkpoint(src: str | Path, model: str, dst: str | Path | None = None):
    """Convert a reference torch checkpoint to a framework msgpack.

    model ∈ {generator, discriminator, encoder, cae_encoder, cae_decoder,
    resnet50, resnet101, resnet152}. Returns (params, state) and, when `dst`
    is given, writes {'params', 'state'} there (the pipelines' loader
    format)."""
    sd = load_torch_state_dict(src)
    try:
        params, state = _IMPORTERS[model](sd)
    except KeyError as e:
        if str(e).strip("'") in _IMPORTERS or model in _IMPORTERS:
            raise KeyError(
                f"state dict at {src} is missing expected key {e} for model "
                f"{model!r} — is this really a reference {model} checkpoint?"
            ) from e
        raise ValueError(
            f"unknown model {model!r}; choose from {sorted(_IMPORTERS)}"
        ) from e
    import jax.numpy as jnp

    to_jnp = lambda t: __import__("jax").tree.map(jnp.asarray, t)
    params, state = to_jnp(params), to_jnp(state)
    if dst is not None:
        from gan_discovery_pso_tpu.core.checkpoint import save_pytree

        save_pytree(dst, {"params": params, "state": state})
    return params, state
