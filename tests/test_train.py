"""Training-layer tests: R1 grad-of-grad golden vs torch, trainer smoke +
semantics (frozen decoder, binary label mapping, loss descent)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.core.config import AdamConfig
from gan_discovery_pso_tpu.models import (
    DiscriminatorDef,
    EncoderDef,
    GeneratorDef,
    ResNetDef,
    VQVAEGanDef,
    discriminator_init,
    encoder_init,
    generator_init,
    resnet_init,
)
from gan_discovery_pso_tpu.train import (
    cae_init,
    invert,
    invert_bn,
    make_cae_steps,
    make_pix_fea_rec_adv_step,
    make_pix_rec_step,
    make_vqvae_steps,
    r1_penalty,
    train_cnn,
    vqvae_init,
)
from gan_discovery_pso_tpu.models.cae import CAEDef
from gan_discovery_pso_tpu.train.cae import encode_dataset, save_encoded_samples_csv

ADAM = AdamConfig(lr=1e-3, beta1=0.5, beta2=0.99)


def t(x):
    return torch.tensor(np.asarray(x))


def _torch_disc(params, f=16):
    disc = tnn.Sequential(
        tnn.Conv2d(1, f, 4, 2, 1), tnn.LeakyReLU(0.2),
        tnn.Conv2d(f, f * 2, 4, 2, 1), tnn.LeakyReLU(0.2),
        tnn.Conv2d(f * 2, 1, 7, 2, 0), tnn.Sigmoid(),
    )
    with torch.no_grad():
        for i, name in zip((0, 2, 4), ("conv1", "conv2", "conv3")):
            disc[i].weight.copy_(t(params[name]["w"]))
            disc[i].bias.copy_(t(params[name]["b"]))
    return disc


def test_r1_penalty_matches_torch_grad_of_grad():
    """R1 value AND its gradient w.r.t. D params must match torch
    (create_graph=True second-order path, reference util_inverter.py:304-320)."""
    params, _ = discriminator_init(jax.random.key(0), DiscriminatorDef(features_d=16))
    real = np.random.RandomState(0).randn(4, 1, 28, 28).astype(np.float32)

    r1_jax = float(r1_penalty(params, jnp.array(real)))

    disc = _torch_disc(params)
    x = torch.tensor(real, requires_grad=True)
    pred = disc(x).reshape(-1)
    grad_x = torch.autograd.grad(pred.sum(), x, create_graph=True)[0]
    r1_torch = grad_x.pow(2).view(4, -1).sum(1).mean()
    np.testing.assert_allclose(r1_jax, float(r1_torch), rtol=1e-4, atol=1e-6)

    # second order: d r1 / d conv1.weight
    jgrads = jax.grad(lambda p: r1_penalty(p, jnp.array(real)))(params)
    disc.zero_grad()
    r1_torch.backward()
    np.testing.assert_allclose(
        np.asarray(jgrads["conv1"]["w"]),
        disc[0].weight.grad.numpy(),
        rtol=1e-3, atol=1e-5,
    )


def test_pix_rec_training_descends():
    gdef = GeneratorDef(z_dim=8, features_g=8)
    gp, gs = generator_init(jax.random.key(1), gdef, dcgan_init=False)
    ep, _ = encoder_init(jax.random.key(2), EncoderDef(enc_dim=8, features_e=8))
    from gan_discovery_pso_tpu.train.inverter import PixRecState
    from gan_discovery_pso_tpu.train.common import make_optimizer

    tx = make_optimizer(ADAM)
    state = PixRecState(ep, tx.init(ep), jnp.asarray(0, jnp.int32))
    train_step, eval_step = make_pix_rec_step(gp, gs, ADAM)
    real = jnp.asarray(np.random.RandomState(3).rand(16, 1, 28, 28) * 2 - 1, jnp.float32)
    first = float(eval_step(state, real))
    for _ in range(30):
        state, loss = train_step(state, real)
    last = float(eval_step(state, real))
    assert np.isfinite(last) and last < first


def test_pix_fea_rec_adv_step_runs_and_reports():
    gdef = GeneratorDef(z_dim=8, features_g=8)
    gp, gs = generator_init(jax.random.key(4), gdef, dcgan_init=False)
    ep, _ = encoder_init(jax.random.key(5), EncoderDef(enc_dim=8, features_e=8))
    dp, _ = discriminator_init(jax.random.key(6), DiscriminatorDef(features_d=8))
    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    rp, rs = resnet_init(jax.random.key(7), rdef, init="glorot_normal")

    from gan_discovery_pso_tpu.train.inverter import PixFeaRecAdvState
    from gan_discovery_pso_tpu.train.common import make_optimizer

    tx = make_optimizer(ADAM)
    state = PixFeaRecAdvState(ep, dp, tx.init(ep), tx.init(dp), jnp.asarray(0, jnp.int32))
    train_step, eval_step = make_pix_fea_rec_adv_step(gp, gs, rp, rs, rdef, ADAM, ADAM)

    real = jnp.asarray(np.random.RandomState(8).rand(4, 1, 28, 28) * 2 - 1, jnp.float32)
    state, m = train_step(state, real, jax.random.key(8))
    for k in ("loss_disc", "loss_disc_r1penalty", "loss_enc", "loss_enc_rec_pix",
              "loss_enc_rec_fea", "loss_enc_adv"):
        assert np.isfinite(float(m[k])), k
    em = eval_step(state, real, jax.random.key(9))
    assert np.isfinite(float(em["loss_enc"]))


def test_pix_fea_rec_adv_stateful_matches_plain_for_stateless_encoder():
    """make_pix_fea_rec_adv_step_stateful with the plain (state-free) encoder
    must reproduce make_pix_fea_rec_adv_step exactly: same metrics, same
    updated encoder params — the stateful path only ADDS state threading."""
    gdef = GeneratorDef(z_dim=8, features_g=8)
    gp, gs = generator_init(jax.random.key(4), gdef, dcgan_init=False)
    ep, _ = encoder_init(jax.random.key(5), EncoderDef(enc_dim=8, features_e=8))
    dp, _ = discriminator_init(jax.random.key(6), DiscriminatorDef(features_d=8))
    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    rp, rs = resnet_init(jax.random.key(7), rdef, init="glorot_normal")

    from gan_discovery_pso_tpu.models.encoder import encoder_apply
    from gan_discovery_pso_tpu.train.common import make_optimizer
    from gan_discovery_pso_tpu.train.inverter import (
        PixFeaRecAdvState,
        PixFeaRecAdvStatefulState,
        make_pix_fea_rec_adv_step_stateful,
    )

    tx = make_optimizer(ADAM)
    plain = PixFeaRecAdvState(ep, dp, tx.init(ep), tx.init(dp),
                              jnp.asarray(0, jnp.int32))
    stateful = PixFeaRecAdvStatefulState(ep, {}, dp, tx.init(ep), tx.init(dp),
                                         jnp.asarray(0, jnp.int32))
    step_p, eval_p = make_pix_fea_rec_adv_step(gp, gs, rp, rs, rdef, ADAM, ADAM)
    step_s, eval_s = make_pix_fea_rec_adv_step_stateful(
        gp, gs, rp, rs, rdef, ADAM, ADAM,
        lambda p, st, x, train: encoder_apply(p, st, x, train=train))

    real = jnp.asarray(np.random.RandomState(8).rand(4, 1, 28, 28) * 2 - 1,
                       jnp.float32)
    key = jax.random.key(8)
    for _ in range(3):
        plain, mp = step_p(plain, real, key)
        stateful, ms = step_s(stateful, real, key)
    for k in mp:
        np.testing.assert_allclose(float(mp[k]), float(ms[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    for a, b in zip(jax.tree.leaves(plain.enc_params),
                    jax.tree.leaves(stateful.enc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    emp = eval_p(plain, real, jax.random.key(9))
    ems = eval_s(stateful, real, jax.random.key(9))
    np.testing.assert_allclose(float(emp["loss_enc"]), float(ems["loss_enc"]),
                               rtol=1e-5)


def test_pix_fea_rec_adv_attgan_bn_state_and_torch_parity():
    """The AttGAN encoder through the adversarial step (reference dispatch is
    encoder-agnostic, util_inverter.py:31-87 + Encoder_AttGAN :142-162):
    BN running stats update exactly ONCE per step from the pre-step
    params/state, and the train-mode forward + its parameter gradient match
    a torch twin (Conv2d bias=False → BatchNorm2d → ReLU stack)."""
    from gan_discovery_pso_tpu.models import (
        EncoderAttGANDef,
        encoder_attgan_apply,
        encoder_attgan_init,
    )
    from gan_discovery_pso_tpu.train.common import make_optimizer
    from gan_discovery_pso_tpu.train.inverter import (
        PixFeaRecAdvStatefulState,
        make_pix_fea_rec_adv_step_stateful,
    )

    adef = EncoderAttGANDef(enc_dim=8, channels_img=1, features_e=8)
    aep, aes = encoder_attgan_init(jax.random.key(30), adef)
    real = jnp.asarray(np.random.RandomState(31).rand(4, 1, 28, 28) * 2 - 1,
                       jnp.float32)

    # --- torch twin: train-mode forward, running stats, and grad parity
    blocks = []
    n_in = 1
    for i in range(4):
        n_out = min(8 * 2**i, 8)
        conv = tnn.Conv2d(n_in, n_out, 4, 2, 1, bias=False)
        bn = tnn.BatchNorm2d(n_out)
        with torch.no_grad():
            conv.weight.copy_(t(aep[f"conv{i}"]["w"]))
            bn.weight.copy_(t(aep[f"bn{i}"]["scale"]))
            bn.bias.copy_(t(aep[f"bn{i}"]["bias"]))
        blocks += [conv, bn, tnn.ReLU()]
        n_in = n_out
    twin = tnn.Sequential(*blocks).train()

    z_jax, new_state = encoder_attgan_apply(aep, aes, real, train=True)
    z_torch = twin(t(real))
    np.testing.assert_allclose(np.asarray(z_jax), z_torch.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    # running stats after one train-mode forward
    for i, bn in enumerate(blocks[1::3]):
        np.testing.assert_allclose(np.asarray(new_state[f"bn{i}"].mean),
                                   bn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_state[f"bn{i}"].var),
                                   bn.running_var.numpy(), rtol=1e-4, atol=1e-6)
    # gradient through train-mode BN
    jg = jax.grad(
        lambda p: jnp.mean(encoder_attgan_apply(p, aes, real, train=True)[0] ** 2)
    )(aep)
    z_torch.pow(2).mean().backward()
    np.testing.assert_allclose(np.asarray(jg["conv0"]["w"]),
                               blocks[0].weight.grad.numpy(),
                               rtol=1e-3, atol=1e-5)

    # --- full adversarial step: runs, finite, BN state advances once
    gdef = GeneratorDef(z_dim=8, features_g=8)
    gp, gs = generator_init(jax.random.key(32), gdef, dcgan_init=False)
    dp, _ = discriminator_init(jax.random.key(33), DiscriminatorDef(features_d=8))
    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    rp, rs = resnet_init(jax.random.key(34), rdef, init="glorot_normal")
    tx = make_optimizer(ADAM)
    enc_apply_fn = lambda p, st, x, train: encoder_attgan_apply(p, st, x, train=train)
    state = PixFeaRecAdvStatefulState(aep, aes, dp, tx.init(aep), tx.init(dp),
                                      jnp.asarray(0, jnp.int32))
    train_step, eval_step = make_pix_fea_rec_adv_step_stateful(
        gp, gs, rp, rs, rdef, ADAM, ADAM, enc_apply_fn)
    new, m = train_step(state, real, jax.random.key(35))
    for k in ("loss_disc", "loss_disc_r1penalty", "loss_enc",
              "loss_enc_rec_pix", "loss_enc_rec_fea", "loss_enc_adv"):
        assert np.isfinite(float(m[k])), k
    # the new BN state == ONE train-mode forward from the pre-step state
    _, expect_state = enc_apply_fn(state.enc_params, state.enc_state, real, True)
    for a, b in zip(jax.tree.leaves(new.enc_state), jax.tree.leaves(expect_state)):
        # jitted step vs eager recompute: identical math, fusion-level noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)
    em = eval_step(new, real, jax.random.key(36))
    assert np.isfinite(float(em["loss_enc"]))


def test_invert_descends_and_batches():
    gdef = GeneratorDef(z_dim=8, features_g=8)
    gp, gs = generator_init(jax.random.key(10), gdef, dcgan_init=False)
    ep, _ = encoder_init(jax.random.key(11), EncoderDef(enc_dim=8, features_e=8))
    x = jnp.asarray(np.random.RandomState(9).rand(3, 1, 28, 28) * 2 - 1, jnp.float32)
    z, hist = invert(x, gp, gs, ep, iterations=40)
    assert z.shape == (3, 8, 1, 1)
    assert hist["loss"][-1] < hist["loss"][0]


def test_invert_bn_mixes_class_statistics():
    gdef = GeneratorDef(z_dim=8, features_g=8)
    gp, gs = generator_init(jax.random.key(12), gdef, dcgan_init=False)
    ep, _ = encoder_init(jax.random.key(13), EncoderDef(enc_dim=8, features_e=8))
    x = jnp.asarray(np.random.RandomState(10).rand(2, 1, 28, 28) * 2 - 1, jnp.float32)
    particles = jnp.asarray(np.random.RandomState(11).randn(4, 32, 8), jnp.float32)
    z, w, hist = invert_bn(x, gp, gs, ep, particles, iterations=20)
    assert z.shape == (2, 8, 1, 1)
    assert w.shape == (2, 4)  # per-image weight vectors (reference runs B=1)
    assert np.all(np.isfinite(hist["loss"]))


def test_invert_batched_equals_per_image():
    """The optimized loss SUMS per-image means, so a batched invert must
    reproduce the one-image-at-a-time reference pattern up to conv
    batch-vectorization rounding (Adam is elementwise; a batch-MEAN loss
    would instead scale grads by 1/B and diverge materially)."""
    gdef = GeneratorDef(z_dim=8, features_g=8)
    gp, gs = generator_init(jax.random.key(20), gdef, dcgan_init=False)
    ep, _ = encoder_init(jax.random.key(21), EncoderDef(enc_dim=8, features_e=8))
    x = jnp.asarray(np.random.RandomState(22).rand(3, 1, 28, 28) * 2 - 1, jnp.float32)

    z_batched, _ = invert(x, gp, gs, ep, iterations=25)
    for i in range(3):
        z_single, _ = invert(x[i : i + 1], gp, gs, ep, iterations=25)
        np.testing.assert_allclose(
            np.asarray(z_batched[i]), np.asarray(z_single[0]),
            rtol=0, atol=1e-5)


def test_invert_bn_batched_equals_per_image():
    """Per-image weight vectors + summed per-image losses: each image's
    (z_i, w_i) trajectory is independent of its batch-mates, matching the
    reference's single-image runs (util_inverter_statistics.py:516)."""
    gdef = GeneratorDef(z_dim=8, features_g=8)
    gp, gs = generator_init(jax.random.key(23), gdef, dcgan_init=False)
    ep, _ = encoder_init(jax.random.key(24), EncoderDef(enc_dim=8, features_e=8))
    x = jnp.asarray(np.random.RandomState(25).rand(2, 1, 28, 28) * 2 - 1, jnp.float32)
    particles = jnp.asarray(np.random.RandomState(26).randn(4, 32, 8), jnp.float32)

    key = jax.random.key(27)
    zb, wb, _ = invert_bn(x, gp, gs, ep, particles, iterations=15, key=key)
    # swap a batch-mate: image 0's trajectory must not change when image 1
    # is replaced (w0 rows are drawn per-slot from the same key, so slot 0's
    # init is identical in both runs; only coupling could differ the result)
    x_other = jnp.concatenate(
        [x[:1], -x[1:]], axis=0)  # same image 0, different image 1
    zd, wd, _ = invert_bn(x_other, gp, gs, ep, particles, iterations=15, key=key)
    np.testing.assert_allclose(np.asarray(zd[0]), np.asarray(zb[0]), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wd[0]), np.asarray(wb[0]), rtol=0, atol=1e-6)
    # and the swapped-in image 1 produced a different result than original
    assert not np.allclose(np.asarray(zd[1]), np.asarray(zb[1]))


def test_vqvae_frozen_decoder_stays_frozen():
    d = VQVAEGanDef(channels_img=1, embedded_dim=16, num_embedding=32,
                    features_g=8, features_d=8)
    gp, gs = generator_init(jax.random.key(14), GeneratorDef(16, 1, 8))
    state, _ = vqvae_init(jax.random.key(15), d, ADAM, frozen_gen=(gp, gs))
    dec0 = jax.tree.map(lambda a: np.asarray(a).copy(), state.params["decoder"])
    cb0 = np.asarray(state.params["codebook"]).copy()

    train_step, eval_step = make_vqvae_steps(d, ADAM, frozen_decoder=True)
    x = jnp.asarray(np.random.RandomState(12).rand(8, 1, 28, 28) * 2 - 1, jnp.float32)
    for _ in range(3):
        state, m = train_step(state, x)
        assert np.isfinite(float(m["loss"]))
    # decoder unchanged, codebook + encoder moved
    for a, b in zip(jax.tree.leaves(dec0), jax.tree.leaves(state.params["decoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(cb0, np.asarray(state.params["codebook"]))


def test_train_vqvae_empty_val_ood_falls_back_to_val_iid():
    """With no OoD val batches, every epoch's val_ood is NaN; best-model
    selection must fall back (val_iid, then train) instead of silently
    returning the epoch-0 random init (same guard as run_inverter)."""
    from gan_discovery_pso_tpu.train.vqvae import train_vqvae

    d = VQVAEGanDef(channels_img=1, embedded_dim=16, num_embedding=32,
                    features_g=8, features_d=8)
    gp, gs = generator_init(jax.random.key(14), GeneratorDef(16, 1, 8))
    state, _ = vqvae_init(jax.random.key(15), d, ADAM, frozen_gen=(gp, gs))
    enc0 = [np.asarray(a).copy() for a in jax.tree.leaves(state.params["encoder"])]

    x = jnp.asarray(np.random.RandomState(12).rand(8, 1, 28, 28) * 2 - 1, jnp.float32)
    out, history, best_epoch = train_vqvae(
        state, d, ADAM,
        train_batches=lambda _e: [(x, None)],
        val_iid_batches=lambda _e: [(x, None)],
        val_ood_batches=lambda _e: [],
        num_epochs=3,
    )
    assert all(np.isnan(v) for v in history["val_ood_loss"])
    assert all(np.isfinite(v) for v in history["val_iid_loss"])  # fallback series
    assert best_epoch >= 0
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(enc0, jax.tree.leaves(out.params["encoder"]))
    )
    assert moved, "best params are still the epoch-0 init"


def test_train_cnn_binary_and_early_stopping():
    rdef = ResNetDef("ResNet50", 1, 2, (0, 1))
    x = jnp.asarray(np.random.RandomState(13).rand(32, 1, 28, 28), jnp.float32)
    y = jnp.asarray(np.random.RandomState(14).randint(0, 10, 32), jnp.int32)

    def batches(_epoch):
        yield x[:16], y[:16]
        yield x[16:], y[16:]

    state, history, best_epoch = train_cnn(
        jax.random.key(16), rdef, ADAM, batches, batches,
        num_epochs=2, early_stopping=20, label=3,
    )
    assert len(history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])
    assert set(history) >= {"train_f1", "val_prec", "val_rec", "val_acc"}


def test_cae_training_and_embedding_csv(tmp_path):
    d = CAEDef(latent_dim=6)
    state, _ = cae_init(jax.random.key(17), d, ADAM)
    train_step, eval_step = make_cae_steps(d, ADAM, task="denoising")
    x = jnp.asarray(np.random.RandomState(15).rand(32, 1, 28, 28), jnp.float32)
    first = float(eval_step(state, x, jax.random.key(18)))
    for i in range(20):
        state, loss = train_step(state, x, jax.random.key(100 + i))
    last = float(eval_step(state, x, jax.random.key(19)))
    assert last < first

    emb = encode_dataset(state, x, chunk=16)
    assert emb.shape == (32, 6)
    df = save_encoded_samples_csv(tmp_path / "encoded_samples_train.csv", emb,
                                  np.zeros(32, np.int32))
    assert (tmp_path / "encoded_samples_train.csv").exists()
    assert list(df.columns) == [f"var_{i}" for i in range(6)] + ["label"]


def test_train_cnn_multipatient_requires_class_map():
    """Empty iid_classes in multipatient mode must fail loudly: jnp.take's
    out-of-bounds fill would otherwise NaN-poison every metric silently."""
    import pytest

    from gan_discovery_pso_tpu.models import AlexNetDef, alexnet_apply, alexnet_init
    from gan_discovery_pso_tpu.train.cnn import train_cnn

    mdef = AlexNetDef(image_channels=1, n_class=2)  # iid_classes=() default
    with pytest.raises(ValueError, match="iid_classes"):
        train_cnn(
            jax.random.key(0), mdef, ADAM,
            train_batches=lambda _e: [], val_batches=lambda _e: [],
            num_epochs=1, apply_fn=alexnet_apply, init_fn=alexnet_init,
        )


def test_gan_train_step_bf16_compute_path():
    """make_gan_train_step(compute_dtype=bf16): master params / optimizer
    state / BN running stats stay fp32, and a short loss trajectory tracks
    the fp32 step closely (this is the quality gate bench.py applies at
    production shapes — here asserted structurally at toy width)."""
    from gan_discovery_pso_tpu.train.dcgan import gan_init, make_gan_train_step

    gdef = GeneratorDef(z_dim=8, features_g=16)
    ddef = DiscriminatorDef(features_d=16)
    state0, _ = gan_init(jax.random.key(2), gdef, ddef, ADAM)
    step32 = jax.jit(make_gan_train_step(gdef, ADAM))
    step16 = jax.jit(make_gan_train_step(gdef, ADAM, compute_dtype=jnp.bfloat16))

    rng = np.random.RandomState(0)
    s32, s16 = state0, state0
    traj32, traj16 = [], []
    for i in range(3):
        real = jnp.asarray(rng.rand(16, 1, 28, 28) * 2 - 1, jnp.float32)
        k = jax.random.key(100 + i)
        s32, m32 = step32(s32, real, k)
        s16, m16 = step16(s16, real, k)
        traj32.append((float(m32["loss_gen"]), float(m32["loss_disc"])))
        traj16.append((float(m16["loss_gen"]), float(m16["loss_disc"])))

    for leaf in jax.tree.leaves((s16.gen_params, s16.disc_params, s16.opt_g,
                                 s16.opt_d, s16.gen_state)):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
    t32, t16 = np.asarray(traj32), np.asarray(traj16)
    assert np.isfinite(t16).all()
    np.testing.assert_allclose(t16, t32, rtol=0.15, atol=0.05)


def test_gan_train_scan_step_matches_sequential_steps():
    """make_gan_train_scan_step: K scanned steps compute the same math as K
    sequential make_gan_train_step calls keyed fold_in(key, i) — the fusion
    (bench.py's dispatch-bound train-path fix) only removes program
    dispatches. Tolerances are ulp-scale: XLA fuses the scan body
    differently than the standalone step program, so float reassociation
    shifts the last bits while the arithmetic is identical."""
    from gan_discovery_pso_tpu.train.dcgan import (
        gan_init,
        make_gan_train_scan_step,
        make_gan_train_step,
    )

    gdef = GeneratorDef(z_dim=8, features_g=16)
    ddef = DiscriminatorDef(features_d=16)
    state0, _ = gan_init(jax.random.key(3), gdef, ddef, ADAM)
    step = jax.jit(make_gan_train_step(gdef, ADAM))
    scan = jax.jit(make_gan_train_scan_step(gdef, ADAM))

    rng = np.random.RandomState(1)
    reals = jnp.asarray(rng.rand(3, 8, 1, 28, 28) * 2 - 1, jnp.float32)
    key = jax.random.key(42)

    # K=1: one scanned step vs one sequential step. The LOSSES (computed
    # before any update) are ulp-tight; the PARAMS already amplify ulp-level
    # gradient differences through Adam's g/(sqrt(v)+eps) normalization
    # (sign-like near-zero gradients), so they get an lr-scaled tolerance.
    s1_seq, m1 = step(state0, reals[0], jax.random.fold_in(key, 0))
    s1_scan, m1s = scan(state0, reals[:1], key)
    for name in ("loss_gen", "loss_disc"):
        np.testing.assert_allclose(float(m1[name]),
                                   float(np.asarray(m1s[name])[0]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves((s1_seq.gen_params, s1_seq.disc_params)),
                    jax.tree.leaves((s1_scan.gen_params, s1_scan.disc_params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=2e-4)

    # K=3: Adam normalization (grad/(sqrt(v)+eps) with tiny early v)
    # amplifies the per-step ulp differences across steps, so the multi-step
    # trajectory agrees loosely, not bitwise
    s_seq, metrics_seq = state0, []
    for i in range(3):
        s_seq, m = step(s_seq, reals[i], jax.random.fold_in(key, i))
        metrics_seq.append(m)
    s_scan, m_scan = scan(state0, reals, key)
    for a, b in zip(jax.tree.leaves((s_seq.gen_params, s_seq.disc_params)),
                    jax.tree.leaves((s_scan.gen_params, s_scan.disc_params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=1e-3)
    for name in ("loss_gen", "loss_disc"):
        np.testing.assert_allclose(
            np.asarray([m[name] for m in metrics_seq]),
            np.asarray(m_scan[name]), rtol=1e-2, atol=5e-3)

    # the bf16 variant stays fp32 in every carried leaf, like the single step
    scan16 = jax.jit(make_gan_train_scan_step(gdef, ADAM,
                                              compute_dtype=jnp.bfloat16))
    s16, m16 = scan16(state0, reals, key)
    for leaf in jax.tree.leaves((s16.gen_params, s16.disc_params,
                                 s16.opt_g, s16.opt_d, s16.gen_state)):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
    assert np.isfinite(np.asarray(m16["loss_gen"])).all()
