"""Round-trip tests for the reverse migration leg (compat/torch_export):
framework pytrees → reference-loadable torch state dicts.

Two directions are exercised:
- torch → import → export → torch: the exported dict must strict-load into
  the reference-shaped module and reproduce the original values exactly
  (the layouts are already torch layouts, so export is pure re-keying).
- native framework checkpoint file → export_torch_checkpoint → torch
  module forward parity vs the JAX apply (the migration story's return
  leg: train here, deploy in the reference PyTorch stack).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.compat.torch_export import (
    export_cae_decoder,
    export_cae_encoder,
    export_discriminator,
    export_encoder,
    export_generator,
    export_resnet,
    export_torch_checkpoint,
)
from gan_discovery_pso_tpu.compat.torch_import import (
    import_cae_decoder,
    import_cae_encoder,
    import_discriminator,
    import_encoder,
    import_generator,
    import_resnet,
)

RTOL, ATOL = 3e-4, 3e-4


def _assert_sd_equal(got: dict, want: dict):
    """Exported dict reproduces the original state dict exactly (values are
    copied verbatim; only num_batches_tracked — a counter the reference
    never consults in eval — is allowed to differ)."""
    assert set(got) == set(want.keys())
    for k, v in want.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(np.asarray(got[k]), v.detach().numpy(), err_msg=k)


def test_export_generator_roundtrip_exact(tmp_path):
    from tests.test_torch_import import _ref_generator

    torch.manual_seed(0)
    g = _ref_generator()
    g.train()
    with torch.no_grad():
        for _ in range(2):
            g.gen(torch.randn(8, 10, 1, 1))
    g.eval()
    sd = g.state_dict()

    params, state = import_generator(sd)
    out = export_generator(params, state)
    _assert_sd_equal(out, sd)

    # strict load back into a fresh reference-shaped module
    g2 = _ref_generator()
    g2.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in out.items()}, strict=True
    )
    g2.eval()
    z = torch.randn(4, 10, 1, 1)
    with torch.no_grad():
        np.testing.assert_allclose(
            g2.gen(z).numpy(), g.gen(z).numpy(), rtol=RTOL, atol=ATOL
        )


def test_export_discriminator_and_encoder_roundtrip():
    torch.manual_seed(1)
    f = 16
    disc = tnn.Module()
    disc.disc = tnn.Sequential(
        tnn.Conv2d(1, f, 4, 2, 1), tnn.LeakyReLU(0.2),
        tnn.Sequential(tnn.Conv2d(f, f * 2, 4, 2, 1), tnn.LeakyReLU(0.2)),
        tnn.Conv2d(f * 2, 1, 7, 2, 0), tnn.Sigmoid(),
    )
    sd = disc.state_dict()
    _assert_sd_equal(export_discriminator(*import_discriminator(sd)), sd)

    enc = tnn.Module()
    enc.enc = tnn.Sequential(
        tnn.Conv2d(1, f, 4, 2, 1), tnn.LeakyReLU(0.2),
        tnn.Sequential(tnn.Conv2d(f, f * 2, 4, 2, 1), tnn.LeakyReLU(0.2)),
        tnn.Conv2d(f * 2, 10, 7, 2, 0),
    )
    sd = enc.state_dict()
    _assert_sd_equal(export_encoder(*import_encoder(sd)), sd)


def test_export_cae_roundtrip():
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
    sd = m.state_dict()
    _assert_sd_equal(export_cae_encoder(*import_cae_encoder(sd)), sd)

    d = tnn.Module()
    d.decoder_linear = tnn.Sequential(
        tnn.Linear(10, 128), tnn.ReLU(), tnn.Linear(128, 288)
    )
    d.decoder_conv = tnn.Sequential(
        tnn.ConvTranspose2d(32, 16, 3, 2, 0), tnn.BatchNorm2d(16), tnn.ReLU(),
        tnn.ConvTranspose2d(16, 8, 3, 2, 1, output_padding=1),
        tnn.BatchNorm2d(8), tnn.ReLU(),
        tnn.ConvTranspose2d(8, 1, 3, 2, 1, output_padding=1),
    )
    sd = d.state_dict()
    _assert_sd_equal(export_cae_decoder(*import_cae_decoder(sd)), sd)


def test_export_resnet_roundtrip():
    from tests.test_models_parity import _TorchResNet

    torch.manual_seed(3)
    twin = _TorchResNet((3, 4, 6, 3), 1, 8)
    sd_ref = {k.replace("downsample.", "identity_downsample."): v
              for k, v in twin.state_dict().items()}
    out = export_resnet(*import_resnet(sd_ref, (3, 4, 6, 3)))
    _assert_sd_equal(out, sd_ref)

    # strict load back into the torch twin (its own naming)
    twin2 = _TorchResNet((3, 4, 6, 3), 1, 8)
    twin2.load_state_dict(
        {k.replace("identity_downsample.", "downsample."):
         torch.as_tensor(np.asarray(v)) for k, v in out.items()},
        strict=True,
    )
    twin.eval(), twin2.eval()
    x = torch.randn(2, 1, 28, 28)
    with torch.no_grad():
        np.testing.assert_array_equal(twin2(x).numpy(), twin(x).numpy())


def test_export_native_gan_checkpoint_to_tar(tmp_path):
    """The return leg end-to-end: a framework GAN checkpoint file exports to
    a reference `.tar` whose state dict strict-loads into the reference
    Generator and matches the JAX forward."""
    from tests.test_torch_import import _ref_generator

    from gan_discovery_pso_tpu.core.checkpoint import save_pytree
    from gan_discovery_pso_tpu.models import GeneratorDef, generator_apply
    from gan_discovery_pso_tpu.models.dcgan import generator_init

    gdef = GeneratorDef(z_dim=10, channels_img=1, features_g=16)
    params, state = generator_init(jax.random.key(0), gdef)
    # the dcgan stage's checkpoint container shape (pipelines/stages.py)
    save_pytree(
        tmp_path / "best_g.msgpack",
        {"epoch": 5,
         "state": {"gen_params": params, "gen_state": state},
         "loss": 0.25},
    )

    dst = export_torch_checkpoint(
        tmp_path / "best_g.msgpack", "generator", tmp_path / "best_g.tar"
    )
    blob = torch.load(dst, weights_only=False)
    assert blob["epoch"] == 5 and abs(blob["loss"] - 0.25) < 1e-9

    g = _ref_generator(z_dim=10, f=16)
    g.load_state_dict(blob["model_state_dict"], strict=True)
    g.eval()

    z = np.random.RandomState(0).randn(4, 10, 1, 1).astype(np.float32)
    want, _ = generator_apply(params, state, jnp.asarray(z), train=False)
    with torch.no_grad():
        got = g.gen(torch.tensor(z)).numpy()
    np.testing.assert_allclose(got, np.asarray(want), rtol=RTOL, atol=ATOL)


def test_export_native_cnn_statedict_to_pt(tmp_path):
    """model_{label}.msgpack ({params, state}) → bare .pt, reloadable by the
    importer with exact value equality (file round trip through both legs)."""
    from gan_discovery_pso_tpu.core.checkpoint import save_pytree
    from gan_discovery_pso_tpu.models import ResNetDef
    from gan_discovery_pso_tpu.models.resnet import resnet_init

    rdef = ResNetDef("ResNet50", 1, 2, (0, 1))
    params, state = resnet_init(jax.random.key(1), rdef)
    save_pytree(tmp_path / "model_0.msgpack", {"params": params, "state": state})

    dst = export_torch_checkpoint(
        tmp_path / "model_0.msgpack", "resnet50", tmp_path / "model_0.pt"
    )
    sd = torch.load(dst, weights_only=False)
    params2, state2 = import_resnet(sd, (3, 4, 6, 3))
    for (a, b) in ((params, params2), (state, state2)):
        ja = jax.tree.leaves(a)
        jb = jax.tree.leaves(jax.tree.map(np.asarray, b))
        assert len(ja) == len(jb)
        for x, y in zip(ja, jb):
            np.testing.assert_array_equal(np.asarray(x), y)


def test_export_errors_are_actionable(tmp_path):
    with pytest.raises(ValueError, match="unknown model"):
        export_torch_checkpoint(({}, {}), "nope", tmp_path / "x.pt")
    with pytest.raises(KeyError, match="missing expected entry"):
        export_torch_checkpoint(({}, {}), "generator", tmp_path / "x.pt")
    # GAN container only yields generator/discriminator halves
    from gan_discovery_pso_tpu.core.checkpoint import save_pytree

    save_pytree(tmp_path / "g.msgpack",
                {"epoch": 0, "state": {"gen_params": {}, "gen_state": {},
                                       "disc_params": {}}, "loss": 0.0})
    with pytest.raises(ValueError, match="GAN checkpoint"):
        export_torch_checkpoint(tmp_path / "g.msgpack", "encoder", tmp_path / "x.pt")
