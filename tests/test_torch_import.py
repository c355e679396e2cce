"""Golden tests for the torch-checkpoint importer: build reference-shaped
torch modules, save their state dicts, convert, and assert fp32 forward
parity between torch and the imported JAX params."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.compat.torch_import import (
    convert_torch_checkpoint,
    import_resnet,
    load_torch_state_dict,
)
from gan_discovery_pso_tpu.models import (
    CAEDef,
    GeneratorDef,
    ResNetDef,
    cae_encoder_apply,
    generator_apply,
    resnet_apply,
)
from gan_discovery_pso_tpu.models.encoder import encoder_apply

RTOL, ATOL = 3e-4, 3e-4


def _ref_generator(z_dim=10, f=16, c=1):
    block = lambda ci, co, k, s, p: tnn.Sequential(
        tnn.ConvTranspose2d(ci, co, k, s, p), tnn.BatchNorm2d(co), tnn.ReLU()
    )
    m = tnn.Module()
    m.gen = tnn.Sequential(
        block(z_dim, f * 2, 7, 1, 0),
        block(f * 2, f, 4, 2, 1),
        tnn.ConvTranspose2d(f, c, 4, 2, 1),
        tnn.Tanh(),
    )
    m.forward = lambda x: m.gen(x)
    return m


def test_import_generator_tar_roundtrip(tmp_path):
    torch.manual_seed(0)
    g = _ref_generator()
    # give BN non-trivial running stats
    g.train()
    with torch.no_grad():
        for _ in range(3):
            g.gen(torch.randn(16, 10, 1, 1))
    g.eval()
    # the reference's .tar layout (util_dcgan.py:227-231)
    torch.save({"epoch": 7, "model_state_dict": g.state_dict(), "loss": 0.1},
               tmp_path / "best_g.tar")

    params, state = convert_torch_checkpoint(
        tmp_path / "best_g.tar", "generator", dst=tmp_path / "best_g.msgpack"
    )
    assert (tmp_path / "best_g.msgpack").exists()

    z = np.random.RandomState(1).randn(4, 10, 1, 1).astype(np.float32)
    want = g.gen(torch.tensor(z)).detach().numpy()
    got, _ = generator_apply(params, state, jnp.asarray(z), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_import_encoder_pt_roundtrip(tmp_path):
    torch.manual_seed(1)
    f, z_dim = 16, 10
    m = tnn.Module()
    m.enc = tnn.Sequential(
        tnn.Conv2d(1, f, 4, 2, 1), tnn.LeakyReLU(0.2),
        tnn.Sequential(tnn.Conv2d(f, f * 2, 4, 2, 1), tnn.LeakyReLU(0.2)),
        tnn.Conv2d(f * 2, z_dim, 7, 2, 0),
    )
    torch.save(m.state_dict(), tmp_path / "encoder.pt")
    params, _ = convert_torch_checkpoint(tmp_path / "encoder.pt", "encoder")
    x = np.random.RandomState(2).randn(4, 1, 28, 28).astype(np.float32)
    want = m.enc(torch.tensor(x)).detach().numpy()
    got, _ = encoder_apply(params, {}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_import_cae_encoder_roundtrip(tmp_path):
    torch.manual_seed(2)
    m = tnn.Module()
    m.encoder_cnn = tnn.Sequential(
        tnn.Conv2d(1, 8, 3, 2, 1), tnn.ReLU(),
        tnn.Conv2d(8, 16, 3, 2, 1), tnn.BatchNorm2d(16), tnn.ReLU(),
        tnn.Conv2d(16, 32, 3, 2, 0), tnn.ReLU(),
    )
    m.encoder_linear = tnn.Sequential(
        tnn.Linear(288, 128), tnn.ReLU(), tnn.Linear(128, 10)
    )
    torch.save(m.state_dict(), tmp_path / "encoder.pt")
    params, state = convert_torch_checkpoint(tmp_path / "encoder.pt", "cae_encoder")
    x = np.random.RandomState(3).rand(4, 1, 28, 28).astype(np.float32)
    m.eval()
    h = m.encoder_cnn(torch.tensor(x)).flatten(1)
    want = m.encoder_linear(h).detach().numpy()
    got, _ = cae_encoder_apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_import_resnet50_roundtrip(tmp_path):
    # reuse the torch twin from the model parity tests (reference layout)
    from tests.test_models_parity import _TorchResNet

    torch.manual_seed(3)
    twin = _TorchResNet((3, 4, 6, 3), 1, 8)
    # the twin uses downsample.* naming; rename to the reference's
    # identity_downsample.* for the importer
    sd = {k.replace("downsample.", "identity_downsample."): v
          for k, v in twin.state_dict().items()}
    torch.save(sd, tmp_path / "model.pt")

    params, state = convert_torch_checkpoint(tmp_path / "model.pt", "resnet50")
    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    x = np.random.RandomState(4).randn(2, 1, 28, 28).astype(np.float32)
    twin.eval()
    want = twin(torch.tensor(x)).detach().numpy()
    got, _ = resnet_apply(params, state, jnp.asarray(x), rdef, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_import_errors_are_actionable(tmp_path):
    torch.manual_seed(4)
    torch.save({"some.weight": torch.zeros(1)}, tmp_path / "bogus.pt")
    import pytest

    with pytest.raises(ValueError, match="unknown model"):
        convert_torch_checkpoint(tmp_path / "bogus.pt", "nope")
    with pytest.raises(KeyError, match="missing expected key"):
        convert_torch_checkpoint(tmp_path / "bogus.pt", "generator")
