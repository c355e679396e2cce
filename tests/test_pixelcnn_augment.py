"""PixelCNN causality + augmentation behavior tests."""

import numpy as np

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.data.augment import AugmentConfig, augment_batch, augment_image
from gan_discovery_pso_tpu.models.pixelcnn import (
    PixelCNNDef,
    pixelcnn_apply,
    pixelcnn_generate,
    pixelcnn_init,
    pixelcnn_loss,
)


def test_pixelcnn_shapes_and_loss():
    d = PixelCNNDef(input_dim=16, dim=8, n_layers=3, n_classes=4)
    params = pixelcnn_init(jax.random.key(0), d)
    idx = jax.random.randint(jax.random.key(1), (2, 4, 4), 0, 16)
    label = jnp.array([0, 2])
    logits = pixelcnn_apply(params, d, idx, label)
    assert logits.shape == (2, 16, 4, 4)
    loss = pixelcnn_loss(params, d, idx, label)
    assert np.isfinite(float(loss))
    # gradient flows to every layer
    g = jax.grad(lambda p: pixelcnn_loss(p, d, idx, label))(params)
    assert float(jnp.abs(g["embedding"]).sum()) > 0


def test_pixelcnn_causality():
    """logits at (i,j) must be independent of inputs at raster positions
    >= (i,j) — the masked-conv contract."""
    d = PixelCNNDef(input_dim=8, dim=8, n_layers=2, n_classes=2)
    params = pixelcnn_init(jax.random.key(2), d)
    label = jnp.array([0])
    idx = jax.random.randint(jax.random.key(3), (1, 5, 5), 0, 8)
    base = np.asarray(pixelcnn_apply(params, d, idx, label))

    # change the input AT (2,2) and everything after in raster order;
    # logits at (2,2) and all earlier positions must be unchanged.
    idx2 = np.asarray(idx).copy()
    idx2[0, 2, 2:] = (idx2[0, 2, 2:] + 1) % 8
    idx2[0, 3:, :] = (idx2[0, 3:, :] + 3) % 8
    out2 = np.asarray(pixelcnn_apply(params, d, jnp.asarray(idx2), label))

    for i in range(5):
        for j in range(5):
            if (i, j) <= (2, 2) if i == 2 else i < 2:
                pass
    # positions strictly before (2,2) in raster order + (2,2) itself
    np.testing.assert_allclose(out2[0, :, :2, :], base[0, :, :2, :], atol=1e-5)
    np.testing.assert_allclose(out2[0, :, 2, :3], base[0, :, 2, :3], atol=1e-5)
    # and at least one later position DOES change (the net is not degenerate)
    assert np.abs(out2[0, :, 3, 3] - base[0, :, 3, 3]).max() > 1e-6


def test_pixelcnn_generate():
    d = PixelCNNDef(input_dim=8, dim=8, n_layers=2, n_classes=2)
    params = pixelcnn_init(jax.random.key(4), d)
    out = pixelcnn_generate(params, d, jax.random.key(5), jnp.array([0, 1]), shape=(3, 3))
    assert out.shape == (2, 3, 3)
    assert int(out.min()) >= 0 and int(out.max()) < 8


def test_augment_identity_when_prob_zero():
    cfg = AugmentConfig(prob=0.0)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16), jnp.float32)
    out = augment_image(jax.random.key(0), img, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_augment_batch_randomizes_and_preserves_range():
    cfg = AugmentConfig(prob=1.0, zoom=True, elastic=True)
    imgs = jnp.asarray(np.random.RandomState(1).rand(4, 1, 24, 24), jnp.float32)
    out = augment_batch(jax.random.key(1), imgs, cfg)
    assert out.shape == imgs.shape
    assert float(out.min()) >= -1e-5 and float(out.max()) <= 1.0 + 1e-5
    # each image got a different transform
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
    # deterministic in the key
    out2 = augment_batch(jax.random.key(1), imgs, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_augment_pure_hflip():
    """With only the flip branch firing, output is the exact mirror."""
    cfg = AugmentConfig(prob=1.0)
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4))
    # find a key where only hflip+vflip fire is fiddly; instead test the
    # affine grid directly through a zero-angle, zero-shift config by
    # forcing branch uniforms via monkeypatched key search
    from gan_discovery_pso_tpu.data.augment import _affine_grid, _bilinear_sample

    ys, xs = _affine_grid(4, 4, 0.0, 1.0, 0.0, 0.0, jnp.asarray(True), jnp.asarray(False))
    out = _bilinear_sample(img[0], ys, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[0])[:, ::-1], atol=1e-5)
