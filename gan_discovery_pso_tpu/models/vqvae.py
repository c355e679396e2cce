"""VQ-VAE with a PSO-initialized codebook and a frozen-DCGAN decoder.

Re-designs the reference VQ-VAE family
(reference src/inverter/utils_vq_vae/util_model.py:125-322 and the custom
autograd pair in src/hands_on/vq_vae/utils/util_function.py:4-66) as pure
JAX:

- nearest-codebook lookup is one fused distance matmul + argmin;
- the straight-through estimator is `z_e + stop_gradient(z_q - z_e)`;
- the codebook gradient (torch's `index_add_` backward,
  util_function.py:46-63) falls out of differentiating a plain
  `codebook[indices]` gather — JAX's gather VJP *is* segment-sum.

Variants mirror the reference factory (util_model.py:23-31):
- `vqvae`        conv stack + 2 BN res-blocks each side (util_model.py:179-222)
- `vqvae_mnist`  3-conv encoder / 3-convT decoder (util_model.py:224-264)
- `vqvae_dcgan`  encoder = BN'd discriminator shape, decoder = DCGAN G shape
                 (util_model.py:268-322); the decoder is typically overwritten
                 with frozen pretrained G params (reference
                 src/training/vq_vae.py:189-195 → `load_frozen_decoder`).

Codebook init: uniform(-1/K, 1/K) or the positions of the final PSO swarm
(`pso_weights`, util_model.py:49-54) — see `codebook_from_pso`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.models import layers as L
from gan_discovery_pso_tpu.models.dcgan import (
    GeneratorDef,
    generator_apply,
    generator_init,
)
from gan_discovery_pso_tpu.ops import (
    batch_norm_eval,
    batch_norm_train,
    conv2d,
    conv_transpose2d,
)


# -- vector quantization ------------------------------------------------------


def vq_indices(z_e_nhwc: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest codebook entry per spatial position.

    z_e_nhwc [..., D], codebook [K, D] → indices [...]. Distances via the
    expanded form (one MXU matmul), matching torch.addmm in
    util_function.py:12-19."""
    flat = z_e_nhwc.reshape(-1, codebook.shape[1])
    d = (
        jnp.sum(flat * flat, axis=1, keepdims=True)
        - 2.0 * jnp.matmul(flat, codebook.T, precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(codebook * codebook, axis=1)[None, :]
    )
    idx = jnp.argmin(d, axis=1)
    return idx.reshape(z_e_nhwc.shape[:-1])


def vq_straight_through(z_e: jax.Array, codebook: jax.Array):
    """(z_q_st, z_q_bar) for NCHW z_e.

    z_q_st feeds the decoder: identity gradient to the encoder
    (straight-through). z_q_bar is the codebook-gradient path used by the
    vq loss: a differentiable gather whose VJP scatter-adds into the
    codebook — exactly torch's index_add_ backward
    (util_function.py:53-62)."""
    z_e_nhwc = jnp.moveaxis(z_e, 1, -1)
    idx = vq_indices(z_e_nhwc, jax.lax.stop_gradient(codebook))
    codes = jnp.take(jax.lax.stop_gradient(codebook), idx, axis=0)  # [N,H,W,D]
    z_q_st_nhwc = z_e_nhwc + jax.lax.stop_gradient(codes - z_e_nhwc)
    z_q_bar_nhwc = jnp.take(codebook, idx, axis=0)  # grads flow to codebook
    z_q_st = jnp.moveaxis(z_q_st_nhwc, -1, 1)
    z_q_bar = jnp.moveaxis(z_q_bar_nhwc, -1, 1)
    return z_q_st, z_q_bar, idx


def codebook_init(key, num_embedding: int, embedded_dim: int) -> jax.Array:
    """uniform(-1/K, 1/K) (reference util_model.py:132)."""
    k = num_embedding
    return jax.random.uniform(key, (k, embedded_dim), jnp.float32, -1.0 / k, 1.0 / k)


def codebook_from_pso(particle_positions) -> jax.Array:
    """Initialize the codebook from final PSO particle positions [K, D]
    (reference pso_weights, util_model.py:49-54; wiring in
    src/training/vq_vae.py:30-57)."""
    return jnp.asarray(particle_positions, jnp.float32)


# -- vqvae_dcgan: the variant the pipeline actually trains --------------------


class VQVAEGanDef(NamedTuple):
    channels_img: int = 1
    embedded_dim: int = 100
    num_embedding: int = 256
    features_g: int = 64
    features_d: int = 64


def vqvae_gan_init(key, d: VQVAEGanDef, data_pso=None):
    """Returns (params, state). Encoder is the discriminator shape but WITH
    BatchNorm in the middle block (util_model.py:273-299); decoder is the
    generator shape; init xavier_uniform on convs w/ zero bias
    (weights_init, util_model.py:39-46)."""
    ke1, ke2, ke3, kcb, kdec = jax.random.split(key, 5)
    f = d.features_d
    enc = {
        "conv1": L.conv_params(ke1, d.channels_img, f, 4, init="glorot_uniform"),
        "conv2": L.conv_params(ke2, f, f * 2, 4, init="glorot_uniform"),
        "bn2": L.bn_params(f * 2),
        "conv3": L.conv_params(ke3, f * 2, d.embedded_dim, 7, init="glorot_uniform"),
    }
    enc["conv1"]["b"] = jnp.zeros_like(enc["conv1"]["b"])
    enc["conv2"]["b"] = jnp.zeros_like(enc["conv2"]["b"])
    enc["conv3"]["b"] = jnp.zeros_like(enc["conv3"]["b"])
    enc_state = {"bn2": L.bn_state(f * 2)}

    codebook = (
        codebook_from_pso(data_pso)
        if data_pso is not None
        else codebook_init(kcb, d.num_embedding, d.embedded_dim)
    )

    dec_params, dec_state = generator_init(
        kdec, GeneratorDef(d.embedded_dim, d.channels_img, d.features_g), dcgan_init=False
    )
    # xavier_uniform + zero bias on the decoder convs too (weights_init).
    for name in ("convt1", "convt2", "convt3"):
        cin, cout, kh, kw = dec_params[name]["w"].shape
        kdec, sub = jax.random.split(kdec)
        dec_params[name]["w"] = L.xavier_uniform(
            sub, (cin, cout, kh, kw), fan_in=cout * kh * kw, fan_out=cin * kh * kw
        )
        dec_params[name]["b"] = jnp.zeros_like(dec_params[name]["b"])

    params = {"encoder": enc, "codebook": codebook, "decoder": dec_params}
    state = {"encoder": enc_state, "decoder": dec_state}
    return params, state


def load_frozen_decoder(params, state, gen_params, gen_state):
    """Overwrite the decoder with pretrained DCGAN-G weights (reference
    src/training/vq_vae.py:189-195). Freezing is enforced by the train step
    (stop_gradient / optax.set_to_zero on the decoder subtree)."""
    new_params = dict(params)
    new_params["decoder"] = gen_params
    new_state = dict(state)
    new_state["decoder"] = gen_state
    return new_params, new_state


def _vqvae_gan_encode(enc, enc_state, x, train):
    h = conv2d(x, enc["conv1"]["w"], enc["conv1"]["b"], stride=2, padding=1)
    h = jax.nn.leaky_relu(h, 0.2)
    h = conv2d(h, enc["conv2"]["w"], enc["conv2"]["b"], stride=2, padding=1)
    if train:
        h, s2 = batch_norm_train(h, enc["bn2"]["scale"], enc["bn2"]["bias"], enc_state["bn2"])
    else:
        h, s2 = batch_norm_eval(h, enc["bn2"]["scale"], enc["bn2"]["bias"], enc_state["bn2"]), enc_state["bn2"]
    h = jax.nn.leaky_relu(h, 0.2)
    z_e = conv2d(h, enc["conv3"]["w"], enc["conv3"]["b"], stride=2, padding=0)
    return z_e, {"bn2": s2}


def vqvae_gan_apply(params, state, x, d: VQVAEGanDef, train: bool = False,
                    frozen_decoder: bool = True):
    """x → (x_tilde, z_e, z_q_bar, indices, new_state). Mirrors the reference
    forward contract (x̃, z_e_x, z_q_x) (util_model.py:318-322).

    frozen_decoder=True keeps the pretrained-G decoder's BN in eval mode so
    its running stats never drift — the reference calls decoder.eval() when
    train_inverter is set (util_training.py:14-16). With a from-scratch
    decoder (frozen_decoder=False) the reference trains decoder BN like any
    other layer, so the decoder follows `train` here."""
    z_e, enc_state = _vqvae_gan_encode(params["encoder"], state["encoder"], x, train)
    z_q_st, z_q_bar, idx = vq_straight_through(z_e, params["codebook"])
    x_tilde, dec_state = generator_apply(
        params["decoder"],
        state["decoder"],
        z_q_st,
        train=(train and not frozen_decoder),
    )
    return x_tilde, z_e, z_q_bar, idx, {"encoder": enc_state, "decoder": dec_state}


def vqvae_gan_encode_indices(params, state, x, d: VQVAEGanDef):
    """Image → codebook indices (reference `encode`, util_model.py:308-311)."""
    z_e, _ = _vqvae_gan_encode(params["encoder"], state["encoder"], x, train=False)
    return vq_indices(jnp.moveaxis(z_e, 1, -1), params["codebook"])


def vqvae_gan_decode_indices(params, state, idx, d: VQVAEGanDef):
    """Codebook indices → image (reference `decode`, util_model.py:313-316)."""
    z_q = jnp.take(params["codebook"], idx, axis=0)  # [N,H,W,D]
    z_q = jnp.moveaxis(z_q, -1, 1)
    img, _ = generator_apply(params["decoder"], state["decoder"], z_q, train=False)
    return img


# ---------------------------------------------------------------------------
# vqvae / vqvae_mnist: the other two reference variants (util_model.py:23-31)
# ---------------------------------------------------------------------------


class VQVAEDef(NamedTuple):
    """`vqvae` variant (util_model.py:179-222): conv stack + two BN res-blocks
    on each side of the codebook, latent grid 7x7 for 28x28 inputs."""

    channels_img: int = 1
    embedded_dim: int = 64
    num_embedding: int = 512


def _zero_conv_biases(tree):
    """The reference's weights_init fills EVERY Conv* bias with 0 after
    xavier_uniform weights (util_model.py:39-46, self.apply at :221/:263) —
    recursively zero the conv 'b' leaves (BN params use 'bias'/'scale' keys
    and are untouched)."""
    def z(d):
        if isinstance(d, dict):
            return {k: (jnp.zeros_like(v) if k == "b" else z(v))
                    for k, v in d.items()}
        if isinstance(d, list):
            return [z(v) for v in d]
        return d

    return z(tree)


def _resblock_bn_init(key, dim):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": L.conv_params(k1, dim, dim, 3, init="glorot_uniform"),
        "bn1": L.bn_params(dim),
        "conv2": L.conv_params(k2, dim, dim, 1, init="glorot_uniform"),
        "bn2": L.bn_params(dim),
    }


def _resblock_bn_state(dim):
    return {"bn1": L.bn_state(dim), "bn2": L.bn_state(dim)}


def _resblock_bn_apply(p, st, x, train):
    """ReLU→Conv3→BN→ReLU→Conv1→BN residual (ResBlockBatchNorm,
    util_model.py:151-164)."""
    h = jax.nn.relu(x)
    h = conv2d(h, p["conv1"]["w"], p["conv1"]["b"], stride=1, padding=1)
    if train:
        h, s1 = batch_norm_train(h, p["bn1"]["scale"], p["bn1"]["bias"], st["bn1"])
    else:
        h, s1 = batch_norm_eval(h, p["bn1"]["scale"], p["bn1"]["bias"], st["bn1"]), st["bn1"]
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv2"]["w"], p["conv2"]["b"], stride=1, padding=0)
    if train:
        h, s2 = batch_norm_train(h, p["bn2"]["scale"], p["bn2"]["bias"], st["bn2"])
    else:
        h, s2 = batch_norm_eval(h, p["bn2"]["scale"], p["bn2"]["bias"], st["bn2"]), st["bn2"]
    return x + h, {"bn1": s1, "bn2": s2}


def vqvae_init(key, d: VQVAEDef, data_pso=None):
    ks = iter(jax.random.split(key, 16))
    dim = d.embedded_dim
    params = {
        "enc_conv1": L.conv_params(next(ks), d.channels_img, dim, 4, init="glorot_uniform"),
        "enc_bn1": L.bn_params(dim),
        "enc_conv2": L.conv_params(next(ks), dim, dim, 4, init="glorot_uniform"),
        "enc_res1": _resblock_bn_init(next(ks), dim),
        "enc_res2": _resblock_bn_init(next(ks), dim),
        "codebook": codebook_from_pso(data_pso) if data_pso is not None
        else codebook_init(next(ks), d.num_embedding, dim),
        "dec_res1": _resblock_bn_init(next(ks), dim),
        "dec_res2": _resblock_bn_init(next(ks), dim),
        "dec_convt1": L.conv_transpose_params(next(ks), dim, dim, 4, init="glorot_uniform"),
        "dec_bn1": L.bn_params(dim),
        "dec_convt2": L.conv_transpose_params(next(ks), dim, d.channels_img, 4, init="glorot_uniform"),
    }
    state = {
        "enc_bn1": L.bn_state(dim),
        "enc_res1": _resblock_bn_state(dim),
        "enc_res2": _resblock_bn_state(dim),
        "dec_res1": _resblock_bn_state(dim),
        "dec_res2": _resblock_bn_state(dim),
        "dec_bn1": L.bn_state(dim),
    }
    return _zero_conv_biases(params), state


def vqvae_apply(params, state, x, d: VQVAEDef, train: bool = False):
    """`vqvae` forward (util_model.py:218-222): encoder Conv4s2 + BN + ReLU,
    Conv4s2, 2 res-blocks → VQ → 2 res-blocks, ReLU, ConvT4s2 + BN + ReLU,
    ConvT4s2 + Tanh."""
    ns = {}
    h = conv2d(x, params["enc_conv1"]["w"], params["enc_conv1"]["b"], stride=2, padding=1)
    if train:
        h, ns["enc_bn1"] = batch_norm_train(h, params["enc_bn1"]["scale"], params["enc_bn1"]["bias"], state["enc_bn1"])
    else:
        h, ns["enc_bn1"] = batch_norm_eval(h, params["enc_bn1"]["scale"], params["enc_bn1"]["bias"], state["enc_bn1"]), state["enc_bn1"]
    h = jax.nn.relu(h)
    h = conv2d(h, params["enc_conv2"]["w"], params["enc_conv2"]["b"], stride=2, padding=1)
    h, ns["enc_res1"] = _resblock_bn_apply(params["enc_res1"], state["enc_res1"], h, train)
    z_e, ns["enc_res2"] = _resblock_bn_apply(params["enc_res2"], state["enc_res2"], h, train)

    z_q_st, z_q_bar, idx = vq_straight_through(z_e, params["codebook"])

    h, ns["dec_res1"] = _resblock_bn_apply(params["dec_res1"], state["dec_res1"], z_q_st, train)
    h, ns["dec_res2"] = _resblock_bn_apply(params["dec_res2"], state["dec_res2"], h, train)
    h = jax.nn.relu(h)
    h = conv_transpose2d(h, params["dec_convt1"]["w"], params["dec_convt1"]["b"], stride=2, padding=1)
    if train:
        h, ns["dec_bn1"] = batch_norm_train(h, params["dec_bn1"]["scale"], params["dec_bn1"]["bias"], state["dec_bn1"])
    else:
        h, ns["dec_bn1"] = batch_norm_eval(h, params["dec_bn1"]["scale"], params["dec_bn1"]["bias"], state["dec_bn1"]), state["dec_bn1"]
    h = jax.nn.relu(h)
    h = conv_transpose2d(h, params["dec_convt2"]["w"], params["dec_convt2"]["b"], stride=2, padding=1)
    return jnp.tanh(h), z_e, z_q_bar, idx, ns


class VQVAEMnistDef(NamedTuple):
    """`vqvae_mnist` variant (util_model.py:224-264): 3-conv encoder to a
    1x1 latent, mirrored 3-convT decoder."""

    channels_img: int = 1
    embedded_dim: int = 64
    num_embedding: int = 512
    num_hiddens: int = 64


def vqvae_mnist_init(key, d: VQVAEMnistDef, data_pso=None):
    ks = iter(jax.random.split(key, 8))
    nh = d.num_hiddens
    params = {
        "enc_conv1": L.conv_params(next(ks), d.channels_img, nh // 2, 4, init="glorot_uniform"),
        "enc_conv2": L.conv_params(next(ks), nh // 2, nh, 4, init="glorot_uniform"),
        "enc_conv3": L.conv_params(next(ks), nh, d.embedded_dim, 7, init="glorot_uniform"),
        "codebook": codebook_from_pso(data_pso) if data_pso is not None
        else codebook_init(next(ks), d.num_embedding, d.embedded_dim),
        "dec_convt1": L.conv_transpose_params(next(ks), d.embedded_dim, nh, 7, init="glorot_uniform"),
        "dec_convt2": L.conv_transpose_params(next(ks), nh, nh // 2, 4, init="glorot_uniform"),
        "dec_convt3": L.conv_transpose_params(next(ks), nh // 2, d.channels_img, 4, init="glorot_uniform"),
    }
    return _zero_conv_biases(params), {}


def vqvae_mnist_apply(params, state, x, d: VQVAEMnistDef, train: bool = False):
    h = jax.nn.relu(conv2d(x, params["enc_conv1"]["w"], params["enc_conv1"]["b"], stride=2, padding=1))
    h = jax.nn.relu(conv2d(h, params["enc_conv2"]["w"], params["enc_conv2"]["b"], stride=2, padding=1))
    z_e = conv2d(h, params["enc_conv3"]["w"], params["enc_conv3"]["b"], stride=2, padding=0)
    z_q_st, z_q_bar, idx = vq_straight_through(z_e, params["codebook"])
    h = jax.nn.relu(conv_transpose2d(z_q_st, params["dec_convt1"]["w"], params["dec_convt1"]["b"], stride=2, padding=0))
    h = jax.nn.relu(conv_transpose2d(h, params["dec_convt2"]["w"], params["dec_convt2"]["b"], stride=2, padding=1))
    h = conv_transpose2d(h, params["dec_convt3"]["w"], params["dec_convt3"]["b"], stride=2, padding=1)
    return jnp.tanh(h), z_e, z_q_bar, idx, state


def get_vqvae(name: str):
    """Variant factory (reference get_model, util_model.py:23-31):
    returns (Def class, init, apply)."""
    if name == "vqvae":
        return VQVAEDef, vqvae_init, vqvae_apply
    if name == "vqvae_mnist":
        return VQVAEMnistDef, vqvae_mnist_init, vqvae_mnist_apply
    if name == "vqvae_dcgan":
        return VQVAEGanDef, vqvae_gan_init, vqvae_gan_apply
    raise ValueError(name)


def vq_loss_terms(x, x_tilde, z_e, z_q_bar, beta: float = 0.25):
    """(recons, vq, commit) — loss = recons + vq + β·commit
    (reference src/inverter/utils_vq_vae/util_training.py:26-34)."""
    loss_recons = jnp.mean((x_tilde - x) ** 2)
    loss_vq = jnp.mean((z_q_bar - jax.lax.stop_gradient(z_e)) ** 2)
    loss_commit = jnp.mean((z_e - jax.lax.stop_gradient(z_q_bar)) ** 2)
    return loss_recons, loss_vq, beta * loss_commit
