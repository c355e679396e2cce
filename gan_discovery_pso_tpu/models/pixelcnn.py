"""Gated PixelCNN prior over VQ-VAE codebook indices.

Functional re-design of the reference prior
(src/inverter/utils_vq_vae/util_model.py:325-448): class-conditioned gated
masked convolutions over the discrete latent grid. The reference mutates
conv weights in-place for the type-A causal mask at every forward
(`make_causal`, :365-367); here masks are constant tensors applied to the
weights inside the pure forward — trace-friendly and grad-correct.

Autoregressive `generate` runs the H·W sampling loop on host (the latent
grid for the 28×28 pipeline is 1×1–8×8; sequential sampling is not a TPU
bottleneck), with each step a jitted full-grid forward.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.models import layers as L
from gan_discovery_pso_tpu.ops import conv2d


class PixelCNNDef(NamedTuple):
    input_dim: int = 256  # codebook size K
    dim: int = 64
    n_layers: int = 15
    n_classes: int = 10


def pixelcnn_init(key, d: PixelCNNDef):
    keys = iter(jax.random.split(key, 8 + 6 * d.n_layers))
    params: dict = {
        # input embedding K -> dim (xavier for conv-likes per weights_init;
        # embeddings keep torch's N(0,1) default)
        "embedding": jax.random.normal(next(keys), (d.input_dim, d.dim), jnp.float32),
    }
    layers = []
    for i in range(d.n_layers):
        k = 7 if i == 0 else 3
        layers.append(
            {
                "class_embed": jax.random.normal(
                    next(keys), (d.n_classes, 2 * d.dim), jnp.float32
                ),
                # vert stack: kernel (k//2+1, k), pad (k//2, k//2)
                "vert": L.conv_params(next(keys), d.dim, 2 * d.dim, (k // 2 + 1, k),
                                      init="glorot_uniform"),
                "v2h": L.conv_params(next(keys), 2 * d.dim, 2 * d.dim, 1,
                                     init="glorot_uniform"),
                # horiz stack: kernel (1, k//2+1), pad (0, k//2)
                "horiz": L.conv_params(next(keys), d.dim, 2 * d.dim, (1, k // 2 + 1),
                                       init="glorot_uniform"),
                "h_res": L.conv_params(next(keys), d.dim, d.dim, 1,
                                       init="glorot_uniform"),
            }
        )
    params["layers"] = layers
    params["out1"] = L.conv_params(next(keys), d.dim, 512, 1, init="glorot_uniform")
    params["out2"] = L.conv_params(next(keys), 512, d.input_dim, 1, init="glorot_uniform")
    # weights_init zeroes every conv bias (util_model.py:39-46, applied at
    # :421) — embeddings keep N(0,1)
    from gan_discovery_pso_tpu.models.vqvae import _zero_conv_biases

    return _zero_conv_biases(params)


def _gate(x):
    a, b = jnp.split(x, 2, axis=1)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


def _masked(w, mask_type: str, which: str):
    """Type-A causal mask: zero the vert kernel's last row / the horiz
    kernel's last column (reference make_causal, util_model.py:365-367)."""
    if mask_type != "A":
        return w
    if which == "vert":
        return w.at[:, :, -1, :].set(0.0)
    return w.at[:, :, :, -1].set(0.0)


def _layer_apply(lp, x_v, x_h, h_embed, k: int, mask_type: str):
    # class conditioning: [N, 2*dim] broadcast over space
    cond = h_embed[:, :, None, None]

    wv = _masked(lp["vert"]["w"], mask_type, "vert")
    h_vert = conv2d(x_v, wv, lp["vert"]["b"], stride=1, padding=(k // 2, k // 2))
    h_vert = h_vert[:, :, : x_v.shape[2], :]  # crop extra rows (reference :375)
    out_v = _gate(h_vert + cond)

    wh = _masked(lp["horiz"]["w"], mask_type, "horiz")
    h_horiz = conv2d(x_h, wh, lp["horiz"]["b"], stride=1, padding=(0, k // 2))
    h_horiz = h_horiz[:, :, :, : x_h.shape[3]]  # crop extra cols (:379)
    v2h = conv2d(h_vert, lp["v2h"]["w"], lp["v2h"]["b"])
    out = _gate(v2h + h_horiz + cond)
    res = conv2d(out, lp["h_res"]["w"], lp["h_res"]["b"])
    out_h = res + x_h if mask_type == "B" else res  # residual only for B (:383-386)
    return out_v, out_h


def pixelcnn_apply(params, d: PixelCNNDef, idx: jax.Array, label: jax.Array):
    """idx [N, H, W] int codebook indices, label [N] → logits [N, K, H, W]."""
    x = jnp.take(params["embedding"], idx, axis=0)  # [N, H, W, dim]
    x = jnp.moveaxis(x, -1, 1)  # [N, dim, H, W]
    x_v = x_h = x
    for i, lp in enumerate(params["layers"]):
        k = 7 if i == 0 else 3
        mask_type = "A" if i == 0 else "B"
        h_embed = jnp.take(lp["class_embed"], label, axis=0)  # [N, 2*dim]
        x_v, x_h = _layer_apply(lp, x_v, x_h, h_embed, k, mask_type)
    out = jax.nn.relu(conv2d(x_h, params["out1"]["w"], params["out1"]["b"]))
    return conv2d(out, params["out2"]["w"], params["out2"]["b"])


def pixelcnn_loss(params, d: PixelCNNDef, idx, label):
    """Autoregressive cross-entropy over the latent grid."""
    import optax

    logits = pixelcnn_apply(params, d, idx, label)  # [N, K, H, W]
    logits = jnp.moveaxis(logits, 1, -1).reshape(-1, d.input_dim)
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, idx.reshape(-1))
    )


@functools.partial(jax.jit, static_argnames=("d",))
def _pixelcnn_fwd(params, d: PixelCNNDef, idx, label):
    # module-level with params as arguments: one executable per shape across
    # every pixelcnn_generate call (a per-call jit closure re-traced the
    # full gated stack on each invocation)
    return pixelcnn_apply(params, d, idx, label)


def pixelcnn_generate(params, d: PixelCNNDef, key, label: jax.Array,
                      shape=(8, 8)) -> jax.Array:
    """Raster-order sampling (reference generate, util_model.py:434-448)."""
    n = label.shape[0]
    x = jnp.zeros((n, *shape), jnp.int32)
    for i in range(shape[0]):
        for j in range(shape[1]):
            logits = _pixelcnn_fwd(params, d, x, label)  # [N, K, H, W]
            key, sub = jax.random.split(key)
            samp = jax.random.categorical(sub, logits[:, :, i, j], axis=-1)
            x = x.at[:, i, j].set(samp.astype(jnp.int32))
    return x
