"""Export framework checkpoints back to reference PyTorch state dicts.

The exact inverse of `compat.torch_import`: our param/state pytrees carry
torch weight layouts already (conv OIHW, convT IOHW, linear (out, in) —
models/ layer contract), so values copy verbatim and only names re-key to
the reference's Sequential layouts (reference src/utils/util_dcgan.py:103-149,
util_inverter.py:164-184, util_cae.py:103-165, util_cnn.py:81-190). A model
trained in this framework can then be loaded with `load_state_dict(strict=
True)` into the reference nets — the return leg of the migration story
(docs/MIGRATION.md): train on TPU here, validate/deploy in the reference
PyTorch stack.

Output formats match what the reference reads back:
- bare state_dict `.pt` (encoder.pt, model_{label}.pt, CAE encoder/decoder)
- `.tar` dicts `{'epoch', 'model_state_dict', 'loss'}` (checkpoint_g /
  best_g, reference util_dcgan.py:225-238, loaded at :29-34)

torch is an optional dependency of this module only.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _bn_stats(st):
    """(running_mean, running_var) from BatchNormStats or its plain forms."""
    if hasattr(st, "mean"):
        return _np(st.mean), _np(st.var)
    if isinstance(st, dict):
        return _np(st["mean"]), _np(st["var"])
    m, v = st
    return _np(m), _np(v)


def _put_conv(sd: dict, prefix: str, p: dict):
    sd[f"{prefix}.weight"] = _np(p["w"])
    if "b" in p:
        sd[f"{prefix}.bias"] = _np(p["b"])


def _put_bn(sd: dict, prefix: str, p: dict, st):
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])
    mean, var = _bn_stats(st)
    sd[f"{prefix}.running_mean"] = mean
    sd[f"{prefix}.running_var"] = var
    # strict load_state_dict requires the counter torch BN modules carry
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _put_linear(sd: dict, prefix: str, p: dict):
    sd[f"{prefix}.weight"] = _np(p["w"])
    sd[f"{prefix}.bias"] = _np(p["b"])


def export_generator(params: dict, state: dict) -> dict:
    sd: dict = {}
    _put_conv(sd, "gen.0.0", params["convt1"])
    _put_bn(sd, "gen.0.1", params["bn1"], state["bn1"])
    _put_conv(sd, "gen.1.0", params["convt2"])
    _put_bn(sd, "gen.1.1", params["bn2"], state["bn2"])
    _put_conv(sd, "gen.2", params["convt3"])
    return sd


def export_discriminator(params: dict, state: dict) -> dict:
    sd: dict = {}
    _put_conv(sd, "disc.0", params["conv1"])
    _put_conv(sd, "disc.2.0", params["conv2"])
    _put_conv(sd, "disc.3", params["conv3"])
    return sd


def export_encoder(params: dict, state: dict) -> dict:
    sd: dict = {}
    _put_conv(sd, "enc.0", params["conv1"])
    _put_conv(sd, "enc.2.0", params["conv2"])
    _put_conv(sd, "enc.3", params["conv3"])
    return sd


def export_cae_encoder(params: dict, state: dict) -> dict:
    sd: dict = {}
    _put_conv(sd, "encoder_cnn.0", params["conv1"])
    _put_conv(sd, "encoder_cnn.2", params["conv2"])
    _put_bn(sd, "encoder_cnn.3", params["bn2"], state["bn2"])
    _put_conv(sd, "encoder_cnn.5", params["conv3"])
    _put_linear(sd, "encoder_linear.0", params["fc1"])
    _put_linear(sd, "encoder_linear.2", params["fc2"])
    return sd


def export_cae_decoder(params: dict, state: dict) -> dict:
    sd: dict = {}
    _put_linear(sd, "decoder_linear.0", params["fc1"])
    _put_linear(sd, "decoder_linear.2", params["fc2"])
    _put_conv(sd, "decoder_conv.0", params["convt1"])
    _put_bn(sd, "decoder_conv.1", params["bn1"], state["bn1"])
    _put_conv(sd, "decoder_conv.3", params["convt2"])
    _put_bn(sd, "decoder_conv.4", params["bn2"], state["bn2"])
    _put_conv(sd, "decoder_conv.6", params["convt3"])
    return sd


def export_resnet(params: dict, state: dict) -> dict:
    sd: dict = {}
    _put_conv(sd, "conv1", params["conv1"])
    _put_bn(sd, "bn1", params["bn1"], state["bn1"])
    li = 1
    while f"layer{li}" in params:
        for bi, (bp, bs) in enumerate(zip(params[f"layer{li}"], state[f"layer{li}"])):
            pfx = f"layer{li}.{bi}"
            for ci in (1, 2, 3):
                _put_conv(sd, f"{pfx}.conv{ci}", bp[f"conv{ci}"])
                _put_bn(sd, f"{pfx}.bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
            if "ds_conv" in bp:
                _put_conv(sd, f"{pfx}.identity_downsample.0", bp["ds_conv"])
                _put_bn(sd, f"{pfx}.identity_downsample.1", bp["ds_bn"], bs["ds_bn"])
        li += 1
    _put_linear(sd, "fc", params["fc"])
    return sd


_EXPORTERS = {
    "generator": export_generator,
    "discriminator": export_discriminator,
    "encoder": export_encoder,
    "cae_encoder": export_cae_encoder,
    "cae_decoder": export_cae_decoder,
    "resnet50": export_resnet,
    "resnet101": export_resnet,
    "resnet152": export_resnet,
}


def export_torch_checkpoint(
    src: "str | Path | tuple",
    model: str,
    dst: str | Path,
    epoch: int = 0,
    loss: float = 0.0,
):
    """Write a reference-loadable torch checkpoint from a framework one.

    src: a framework msgpack path or a `(params, state)` tree pair. Paths
    may point at any of the pipelines' artifact shapes: `{params, state}`
    state-dict saves (cae encoder/decoder, cnn model_*, inverter encoder)
    or the GAN `{epoch, state: GanTrainState, loss}` checkpoints
    (best_g/checkpoint_g — `model` selects the generator or discriminator
    half, and epoch/loss default from the file). Extension of `dst`
    selects the container: `.tar` wraps the state dict in the reference's
    `{'epoch', 'model_state_dict', 'loss'}` dict (util_dcgan.py:225-238),
    anything else saves the bare state_dict (`.pt` convention)."""
    import torch

    if model not in _EXPORTERS:
        raise ValueError(f"unknown model {model!r}; choose from {sorted(_EXPORTERS)}")
    if isinstance(src, (str, Path)):
        from gan_discovery_pso_tpu.core.checkpoint import load_pytree, restore_tree

        d = restore_tree(load_pytree(src))
        st = d.get("state", {})
        if isinstance(st, dict) and "gen_params" in st:  # GAN train state
            epoch = int(d.get("epoch", epoch) or 0)
            if d.get("loss") is not None:
                loss = float(d["loss"])
            if model == "generator":
                params, state = st["gen_params"], st["gen_state"]
            elif model == "discriminator":
                params, state = st["disc_params"], {}
            else:
                raise ValueError(
                    f"{src} is a GAN checkpoint; model must be 'generator' "
                    f"or 'discriminator', not {model!r}"
                )
        else:
            params, state = d["params"], st or {}
    else:
        params, state = src
    try:
        sd = _EXPORTERS[model](params, state)
    except KeyError as e:
        raise KeyError(
            f"checkpoint is missing expected entry {e} for model {model!r} — "
            f"is this really a {model} checkpoint from this framework?"
        ) from e
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
        if v.dtype != np.int64 else torch.from_numpy(np.ascontiguousarray(v))
        for k, v in sd.items()
    }
    dst = Path(dst)
    dst.parent.mkdir(parents=True, exist_ok=True)
    if dst.suffix == ".tar":
        torch.save({"epoch": int(epoch), "model_state_dict": sd,
                    "loss": float(loss)}, dst)
    else:
        torch.save(sd, dst)
    return dst
