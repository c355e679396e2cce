"""fp32 forward parity of the model zoo against torch twins.

Each twin is assembled here from standard torch layers to mirror the
documented architectures; weights are injected from our params so outputs
must match to fp32 tolerance. (Twins are test oracles, not framework code.)
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.models import (
    CAEDef,
    DiscriminatorDef,
    EncoderDef,
    GeneratorDef,
    ResNetDef,
    VQVAEGanDef,
    cae_decoder_apply,
    cae_decoder_init,
    cae_encoder_apply,
    cae_encoder_init,
    count_params,
    discriminator_apply,
    discriminator_init,
    encoder_apply,
    encoder_init,
    generator_apply,
    generator_init,
    resnet_apply,
    resnet_features,
    resnet_init,
    vq_loss_terms,
    vq_straight_through,
    vqvae_gan_apply,
    vqvae_gan_init,
)

RTOL, ATOL = 2e-4, 2e-4


def t(x):
    return torch.tensor(np.asarray(x))


def _set_bn_identity_stats(bn):
    with torch.no_grad():
        bn.running_mean.zero_()
        bn.running_var.fill_(1.0)


# -- Generator ---------------------------------------------------------------


def torch_generator(params, z_dim=10, channels=1, f=64):
    g = tnn.Sequential(
        tnn.ConvTranspose2d(z_dim, f * 2, 7, 1, 0),
        tnn.BatchNorm2d(f * 2),
        tnn.ReLU(),
        tnn.ConvTranspose2d(f * 2, f, 4, 2, 1),
        tnn.BatchNorm2d(f),
        tnn.ReLU(),
        tnn.ConvTranspose2d(f, channels, 4, 2, 1),
        tnn.Tanh(),
    )
    with torch.no_grad():
        g[0].weight.copy_(t(params["convt1"]["w"]))
        g[0].bias.copy_(t(params["convt1"]["b"]))
        g[1].weight.copy_(t(params["bn1"]["scale"]))
        g[1].bias.copy_(t(params["bn1"]["bias"]))
        g[3].weight.copy_(t(params["convt2"]["w"]))
        g[3].bias.copy_(t(params["convt2"]["b"]))
        g[4].weight.copy_(t(params["bn2"]["scale"]))
        g[4].bias.copy_(t(params["bn2"]["bias"]))
        g[6].weight.copy_(t(params["convt3"]["w"]))
        g[6].bias.copy_(t(params["convt3"]["b"]))
    _set_bn_identity_stats(g[1])
    _set_bn_identity_stats(g[4])
    return g


def test_generator_parity_and_shape():
    key = jax.random.key(0)
    d = GeneratorDef(z_dim=10)
    params, state = generator_init(key, d)
    z = np.random.RandomState(0).randn(8, 10, 1, 1).astype(np.float32)

    img, _ = generator_apply(params, state, jnp.array(z), train=False)
    assert img.shape == (8, 1, 28, 28)  # sanity_check contract (util_dcgan.py:60-75)

    g = torch_generator(params, z_dim=10)
    g.eval()
    want = g(t(z)).detach().numpy()
    np.testing.assert_allclose(np.asarray(img), want, rtol=RTOL, atol=ATOL)


def test_generator_train_mode_parity():
    key = jax.random.key(1)
    d = GeneratorDef(z_dim=10)
    params, state = generator_init(key, d)
    z = np.random.RandomState(1).randn(8, 10, 1, 1).astype(np.float32)

    img, new_state = generator_apply(params, state, jnp.array(z), train=True)
    g = torch_generator(params, z_dim=10)
    g.train()
    want = g(t(z)).detach().numpy()
    np.testing.assert_allclose(np.asarray(img), want, rtol=5e-4, atol=5e-4)
    # running stats updated identically
    np.testing.assert_allclose(
        np.asarray(new_state["bn1"].mean), g[1].running_mean.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state["bn1"].var), g[1].running_var.detach().numpy(), rtol=1e-4, atol=1e-5
    )


# -- Discriminator / Encoder ---------------------------------------------------


def test_discriminator_parity_and_shape():
    key = jax.random.key(2)
    params, state = discriminator_init(key, DiscriminatorDef())
    x = np.random.RandomState(2).randn(8, 1, 28, 28).astype(np.float32)
    y, _ = discriminator_apply(params, state, jnp.array(x))
    assert y.shape == (8, 1, 1, 1)

    f = 64
    disc = tnn.Sequential(
        tnn.Conv2d(1, f, 4, 2, 1),
        tnn.LeakyReLU(0.2),
        tnn.Conv2d(f, f * 2, 4, 2, 1),
        tnn.LeakyReLU(0.2),
        tnn.Conv2d(f * 2, 1, 7, 2, 0),
        tnn.Sigmoid(),
    )
    with torch.no_grad():
        for i, name in zip((0, 2, 4), ("conv1", "conv2", "conv3")):
            disc[i].weight.copy_(t(params[name]["w"]))
            disc[i].bias.copy_(t(params[name]["b"]))
    want = disc(t(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), want, rtol=RTOL, atol=ATOL)


def test_encoder_shape_contract():
    key = jax.random.key(3)
    params, _ = encoder_init(key, EncoderDef(enc_dim=10))
    x = jnp.zeros((8, 1, 28, 28))
    z, _ = encoder_apply(params, {}, x)
    assert z.shape == (8, 10, 1, 1)  # util_inverter.py sanity_check contract


# -- CAE ------------------------------------------------------------------------


def test_cae_roundtrip_parity():
    key = jax.random.key(4)
    d = CAEDef(latent_dim=10)
    ep, es = cae_encoder_init(key, d)
    dp, ds = cae_decoder_init(jax.random.key(5), d)
    x = np.random.RandomState(3).rand(4, 1, 28, 28).astype(np.float32)

    z, _ = cae_encoder_apply(ep, es, jnp.array(x), train=False)
    assert z.shape == (4, 10)
    xr, _ = cae_decoder_apply(dp, ds, z, train=False)
    assert xr.shape == (4, 1, 28, 28)

    # torch twins
    enc = tnn.Sequential(
        tnn.Conv2d(1, 8, 3, 2, 1), tnn.ReLU(),
        tnn.Conv2d(8, 16, 3, 2, 1), tnn.BatchNorm2d(16), tnn.ReLU(),
        tnn.Conv2d(16, 32, 3, 2, 0), tnn.ReLU(),
        tnn.Flatten(1),
        tnn.Linear(288, 128), tnn.ReLU(), tnn.Linear(128, 10),
    )
    with torch.no_grad():
        enc[0].weight.copy_(t(ep["conv1"]["w"])); enc[0].bias.copy_(t(ep["conv1"]["b"]))
        enc[2].weight.copy_(t(ep["conv2"]["w"])); enc[2].bias.copy_(t(ep["conv2"]["b"]))
        enc[3].weight.copy_(t(ep["bn2"]["scale"])); enc[3].bias.copy_(t(ep["bn2"]["bias"]))
        enc[5].weight.copy_(t(ep["conv3"]["w"])); enc[5].bias.copy_(t(ep["conv3"]["b"]))
        enc[8].weight.copy_(t(ep["fc1"]["w"])); enc[8].bias.copy_(t(ep["fc1"]["b"]))
        enc[10].weight.copy_(t(ep["fc2"]["w"])); enc[10].bias.copy_(t(ep["fc2"]["b"]))
    _set_bn_identity_stats(enc[3])
    enc.eval()
    np.testing.assert_allclose(np.asarray(z), enc(t(x)).detach().numpy(), rtol=RTOL, atol=ATOL)

    dec = tnn.Sequential(
        tnn.Linear(10, 128), tnn.ReLU(), tnn.Linear(128, 288), tnn.ReLU(),
        tnn.Unflatten(1, (32, 3, 3)),
        tnn.ConvTranspose2d(32, 16, 3, 2, output_padding=0), tnn.BatchNorm2d(16), tnn.ReLU(),
        tnn.ConvTranspose2d(16, 8, 3, 2, 1, output_padding=1), tnn.BatchNorm2d(8), tnn.ReLU(),
        tnn.ConvTranspose2d(8, 1, 3, 2, 1, output_padding=1),
    )
    with torch.no_grad():
        dec[0].weight.copy_(t(dp["fc1"]["w"])); dec[0].bias.copy_(t(dp["fc1"]["b"]))
        dec[2].weight.copy_(t(dp["fc2"]["w"])); dec[2].bias.copy_(t(dp["fc2"]["b"]))
        dec[5].weight.copy_(t(dp["convt1"]["w"])); dec[5].bias.copy_(t(dp["convt1"]["b"]))
        dec[6].weight.copy_(t(dp["bn1"]["scale"])); dec[6].bias.copy_(t(dp["bn1"]["bias"]))
        dec[8].weight.copy_(t(dp["convt2"]["w"])); dec[8].bias.copy_(t(dp["convt2"]["b"]))
        dec[9].weight.copy_(t(dp["bn2"]["scale"])); dec[9].bias.copy_(t(dp["bn2"]["bias"]))
        dec[11].weight.copy_(t(dp["convt3"]["w"])); dec[11].bias.copy_(t(dp["convt3"]["b"]))
    _set_bn_identity_stats(dec[6]); _set_bn_identity_stats(dec[9])
    dec.eval()
    want = torch.sigmoid(dec(t(np.asarray(z)))).detach().numpy()
    np.testing.assert_allclose(np.asarray(xr), want, rtol=RTOL, atol=ATOL)


# -- ResNet50 -------------------------------------------------------------------


class _TorchBottleneck(tnn.Module):
    def __init__(self, cin, width, downsample, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 1, 1, 0, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, 1, 0, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idt = x
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        if self.downsample is not None:
            idt = self.downsample(idt)
        return self.relu(h + idt)


class _TorchResNet(tnn.Module):
    def __init__(self, layers=(3, 4, 6, 3), cin=1, n_class=8):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.in_ch = 64
        self.layer1 = self._make(layers[0], 64, 1)
        self.layer2 = self._make(layers[1], 128, 2)
        self.layer3 = self._make(layers[2], 256, 2)
        self.layer4 = self._make(layers[3], 512, 2)
        self.pool = tnn.AdaptiveMaxPool2d((1, 1))
        self.fc = tnn.Linear(512 * 4, n_class)

    def _make(self, n, width, stride):
        blocks = []
        for bi in range(n):
            s = stride if bi == 0 else 1
            ds = None
            if bi == 0 and (s != 1 or self.in_ch != width * 4):
                ds = tnn.Sequential(
                    tnn.Conv2d(self.in_ch, width * 4, 1, s, bias=False),
                    tnn.BatchNorm2d(width * 4),
                )
            blocks.append(_TorchBottleneck(self.in_ch, width, ds, s))
            self.in_ch = width * 4
        return tnn.Sequential(*blocks)

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
        h = self.pool(h).reshape(h.shape[0], -1)
        return self.fc(h)


def _inject_resnet(m: _TorchResNet, params):
    def copy_bn(bn, p):
        bn.weight.data.copy_(t(p["scale"]))
        bn.bias.data.copy_(t(p["bias"]))
        _set_bn_identity_stats(bn)

    with torch.no_grad():
        m.conv1.weight.copy_(t(params["conv1"]["w"]))
        copy_bn(m.bn1, params["bn1"])
        for li in (1, 2, 3, 4):
            tl = getattr(m, f"layer{li}")
            for bp, tb in zip(params[f"layer{li}"], tl):
                tb.conv1.weight.copy_(t(bp["conv1"]["w"])); copy_bn(tb.bn1, bp["bn1"])
                tb.conv2.weight.copy_(t(bp["conv2"]["w"])); copy_bn(tb.bn2, bp["bn2"])
                tb.conv3.weight.copy_(t(bp["conv3"]["w"])); copy_bn(tb.bn3, bp["bn3"])
                if tb.downsample is not None:
                    tb.downsample[0].weight.copy_(t(bp["ds_conv"]["w"]))
                    copy_bn(tb.downsample[1], bp["ds_bn"])
        m.fc.weight.copy_(t(params["fc"]["w"]))
        m.fc.bias.copy_(t(params["fc"]["b"]))


def test_resnet50_parity_param_count_and_features():
    d = ResNetDef("ResNet50", image_channels=1, n_class=8, iid_classes=(0, 2, 3, 4, 6, 7, 8, 9))
    params, state = resnet_init(jax.random.key(6), d)
    twin = _TorchResNet((3, 4, 6, 3), 1, 8)

    n_torch = sum(p.numel() for p in twin.parameters())
    assert count_params(params) == n_torch

    _inject_resnet(twin, params)
    twin.eval()
    x = np.random.RandomState(4).randn(4, 1, 28, 28).astype(np.float32)
    logits, _ = resnet_apply(params, state, jnp.array(x), d, train=False)
    want = twin(t(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-3, atol=1e-3)

    feat = resnet_features(params, state, jnp.array(x), d)
    assert feat.shape == (4, 2048)

    # class_to_idx contract (util_cnn.py:90-91)
    assert d.class_to_idx() == {0: 0, 2: 1, 3: 2, 4: 3, 6: 4, 7: 5, 8: 6, 9: 7}


# -- VQ straight-through ---------------------------------------------------------


def test_vq_straight_through_gradients():
    """Encoder grad is identity; codebook grad is index_add of upstream grads
    (torch's VectorQuantizationStraightThrough backward,
    hands_on/vq_vae/utils/util_function.py:46-63)."""
    key = jax.random.key(7)
    z_e = jax.random.normal(key, (2, 4, 3, 3))  # N, D, H, W
    codebook = jax.random.normal(jax.random.key(8), (6, 4))

    def loss_fn(z_e, codebook):
        z_q_st, z_q_bar, idx = vq_straight_through(z_e, codebook)
        # decoder path sees z_q_st; vq path sees z_q_bar
        return jnp.sum(z_q_st * 3.0) + jnp.sum(z_q_bar * 2.0), idx

    (val, idx), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(z_e, codebook)
    g_ze, g_cb = grads
    # straight-through: d(sum 3*z_q_st)/dz_e == 3 everywhere
    np.testing.assert_allclose(np.asarray(g_ze), 3.0 * np.ones_like(g_ze), rtol=1e-6)
    # codebook grad: 2.0 accumulated per assignment (index_add semantics)
    counts = np.bincount(np.asarray(idx).ravel(), minlength=6).astype(np.float32)
    want_cb = 2.0 * counts[:, None] * np.ones((6, 4), np.float32)
    np.testing.assert_allclose(np.asarray(g_cb), want_cb, rtol=1e-6)


def test_vqvae_gan_forward_shapes_and_loss():
    d = VQVAEGanDef(embedded_dim=100, num_embedding=256)
    data_pso = np.random.RandomState(5).randn(256, 100).astype(np.float32)
    params, state = vqvae_gan_init(jax.random.key(9), d, data_pso=data_pso)
    np.testing.assert_array_equal(np.asarray(params["codebook"]), data_pso)

    x = jnp.zeros((4, 1, 28, 28))
    x_tilde, z_e, z_q_bar, idx, _ = vqvae_gan_apply(params, state, x, d, train=False)
    assert x_tilde.shape == (4, 1, 28, 28)
    assert z_e.shape == (4, 100, 1, 1)
    assert z_q_bar.shape == (4, 100, 1, 1)
    assert idx.shape == (4, 1, 1)
    lr, lvq, lc = vq_loss_terms(x, x_tilde, z_e, z_q_bar, beta=0.25)
    assert np.isfinite(float(lr + lvq + lc))


def test_vqvae_variant_factory_shapes():
    """All three reference VQ-VAE variants (util_model.py:23-31) forward with
    their documented latent grids."""
    from gan_discovery_pso_tpu.models import get_vqvae

    expect = {"vqvae": (7, 7), "vqvae_mnist": (1, 1), "vqvae_dcgan": (1, 1)}
    for name, grid in expect.items():
        Def, init, apply = get_vqvae(name)
        d = Def()
        params, state = init(jax.random.key(20), d)
        x = jnp.zeros((2, 1, 28, 28))
        x_tilde, z_e, z_q_bar, idx, _ = apply(params, state, x, d, train=False)
        assert x_tilde.shape == (2, 1, 28, 28), name
        assert idx.shape == (2, *grid), name
        # reconstruction in [-1, 1] (tanh head)
        assert float(jnp.abs(x_tilde).max()) <= 1.0


def test_alexnet_training_path():
    """train_cnn drives AlexNet through the pluggable apply/init hooks
    (reference get_cnn factory, util_cnn.py:24-38)."""
    from gan_discovery_pso_tpu.core.config import AdamConfig
    from gan_discovery_pso_tpu.models import AlexNetDef, alexnet_apply, alexnet_init
    from gan_discovery_pso_tpu.train import train_cnn

    d = AlexNetDef(image_channels=1, n_class=2, img_size=64)
    x = jnp.asarray(np.random.RandomState(30).rand(16, 1, 64, 64), jnp.float32)
    y = jnp.asarray(np.random.RandomState(31).randint(0, 10, 16), jnp.int32)

    def batches(_e):
        yield x, y

    state, hist, _ = train_cnn(
        jax.random.key(21), d, AdamConfig(lr=1e-3), batches, batches,
        num_epochs=2, label=3,
        apply_fn=alexnet_apply,
        init_fn=lambda k, dd, init: alexnet_init(k, dd, init=init),
    )
    assert len(hist["train_loss"]) == 2
    assert all(np.isfinite(v) for v in hist["train_loss"])
