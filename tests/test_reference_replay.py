"""SURVEY §7 hard part 2: full-trajectory golden replay against the
reference swarm running on REAL imported models.

Builds reference-layout torch G + ResNet50, imports them through
compat/torch_import (the `convert-torch` CLI path), then drives

  (a) the reference-semantics swarm (NumpySwarm, tests/test_pso.py) whose
      fitness is the torch batch-1 pipeline of src/pso/util_discovery.py
      (G forward → per-image [0,1] rescale → softmax → class column →
      1 − min(p+thr, 1) + eps), and
  (b) this framework's fused pso_iteration + make_discovery_fitness,

with IDENTICAL init positions/velocities and r1/r2 streams, asserting the
full fp32 trajectory matches (reference src/pso/util_pso.py:43-49,174-189,
src/utils/util_general.py:224-237 seeding contract)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.compat.torch_import import convert_torch_checkpoint
from gan_discovery_pso_tpu.core.config import PsoConfig
from gan_discovery_pso_tpu.pso import (
    make_discovery_fitness,
    make_inverter_fitness,
    pso_iteration,
    swarm_init,
    swarm_init_from_positions,
)
from gan_discovery_pso_tpu.models import ResNetDef
from tests.test_models_parity import _TorchResNet
from tests.test_pso import NumpySwarm
from tests.test_torch_import import _ref_generator

Z_DIM = 10
N_PARTICLES = 8
N_ITERS = 5
CLASS_IDX = 2


def _import_models(tmp_path):
    torch.manual_seed(7)
    g = _ref_generator(z_dim=Z_DIM, f=16)
    g.train()
    with torch.no_grad():
        for _ in range(3):
            g.gen(torch.randn(16, Z_DIM, 1, 1))
    g.eval()
    torch.save({"epoch": 0, "model_state_dict": g.state_dict(), "loss": 0.0},
               tmp_path / "best_g.tar")
    gp, gs = convert_torch_checkpoint(tmp_path / "best_g.tar", "generator")

    twin = _TorchResNet((3, 4, 6, 3), 1, 8)
    twin.eval()
    sd = {k.replace("downsample.", "identity_downsample."): v
          for k, v in twin.state_dict().items()}
    torch.save(sd, tmp_path / "model.pt")
    rp, rs = convert_torch_checkpoint(tmp_path / "model.pt", "resnet50")
    return g, (gp, gs), twin, (rp, rs)


def _torch_fitness(g, cnn):
    """The reference per-particle pipeline at batch 1
    (util_discovery.py:33-82)."""

    def fit(pos):
        with torch.no_grad():
            z = torch.from_numpy(np.asarray(pos, np.float32)).view(1, Z_DIM, 1, 1)
            img = g.gen(z)
            img01 = (img - img.min()) / (img.max() - img.min())
            p = torch.softmax(cnn(img01), dim=1)[0, CLASS_IDX]
            return float(1.0 - torch.minimum(p + 0.0, torch.ones(())) + 0.1)

    return fit


def test_reference_trajectory_replay_with_imported_models(tmp_path):
    g, (gp, gs), twin, (rp, rs) = _import_models(tmp_path)
    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    fitness = make_discovery_fitness(gp, gs, rp, rs, rdef, class_idx=CLASS_IDX)
    fit_jit = jax.jit(fitness)
    hp = PsoConfig(n_iterations=N_ITERS, n_particles=N_PARTICLES, dim_space=Z_DIM)

    state = swarm_init(jax.random.key(0), N_PARTICLES, Z_DIM, hp.w_inertia)
    ref = NumpySwarm(np.asarray(state.positions), np.asarray(state.velocities), hp)
    fit_ref = _torch_fitness(g, twin)

    # fitness parity at the starting positions (the hard numerical gate)
    vals0 = np.asarray(fit_jit(state.positions))
    ref0 = np.array([fit_ref(p) for p in np.asarray(state.positions)], np.float32)
    np.testing.assert_allclose(vals0, ref0, rtol=5e-3, atol=2e-3)

    rng = np.random.RandomState(11)
    for it in range(1, N_ITERS + 1):
        r1 = rng.rand(N_PARTICLES).astype(np.float32)
        r2 = rng.rand(N_PARTICLES).astype(np.float32)
        vals = fit_jit(state.positions)
        state = pso_iteration(state, vals, jnp.array(r1), jnp.array(r2), hp)
        ref.step(fit_ref, r1, r2)

        np.testing.assert_allclose(
            np.asarray(state.positions), ref.pos, rtol=5e-3, atol=5e-3,
            err_msg=f"positions diverged at iteration {it}",
        )
        np.testing.assert_allclose(
            np.asarray(state.velocities), ref.vel, rtol=5e-3, atol=5e-3,
            err_msg=f"velocities diverged at iteration {it}",
        )
        np.testing.assert_allclose(
            float(state.g_best_val), ref.g_best_val[-1], rtol=5e-3, atol=2e-3,
            err_msg=f"g_best diverged at iteration {it}",
        )
        assert int(state.g_improvements) == len(ref.g_best_val)


def test_inverter_fitness_and_trajectory_replay(tmp_path):
    """The hybrid PSO-inversion loop (reference pso_inverter.py +
    util_discovery.fitness_pso_inverter:84-101) replayed against imported
    models: binary assessor column 1, optimize_in_training objective,
    w_rec·MSE against the RAW G output, and the double-eps quirk —
    encoder-seeded positions, per-particle source slices."""
    torch.manual_seed(9)
    g = _ref_generator(z_dim=Z_DIM, f=16)
    g.eval()
    torch.save({"epoch": 0, "model_state_dict": g.state_dict(), "loss": 0.0},
               tmp_path / "best_g.tar")
    gp, gs = convert_torch_checkpoint(tmp_path / "best_g.tar", "generator")

    twin = _TorchResNet((3, 4, 6, 3), 1, 2)  # re-headed binary assessor
    twin.eval()
    sd = {k.replace("downsample.", "identity_downsample."): v
          for k, v in twin.state_dict().items()}
    torch.save(sd, tmp_path / "model_1.pt")
    rp, rs = convert_torch_checkpoint(tmp_path / "model_1.pt", "resnet50")
    rdef = ResNetDef("ResNet50", 1, 2, (0, 1))

    rng = np.random.RandomState(21)
    sources = rng.uniform(-1, 1, (N_PARTICLES, 1, 28, 28)).astype(np.float32)
    fitness = make_inverter_fitness(
        gp, gs, rp, rs, rdef, jnp.asarray(sources), class_idx=1,
        control="optimize_in_training",
    )
    fit_jit = jax.jit(fitness)
    hp = PsoConfig(n_iterations=4, n_particles=N_PARTICLES, dim_space=Z_DIM)

    pos0 = rng.randn(N_PARTICLES, Z_DIM).astype(np.float32)
    state = swarm_init_from_positions(jax.random.key(1), jnp.asarray(pos0),
                                      hp.w_inertia)
    ref = NumpySwarm(np.asarray(state.positions), np.asarray(state.velocities), hp)

    def fitness_torch(pos, n):
        with torch.no_grad():
            z = torch.from_numpy(np.asarray(pos, np.float32)).view(1, Z_DIM, 1, 1)
            img_rec = g.gen(z)
            img01 = (img_rec - img_rec.min()) / (img_rec.max() - img_rec.min())
            p = torch.softmax(twin(img01), dim=1)[0, 1]  # binary -> column 1
            f_ass = 1.0 * float(torch.minimum(p + 0.0, torch.ones(())) + 0.1)
            f_rec = 1.0 * float(torch.mean(
                (torch.from_numpy(sources[n]) - img_rec[0]) ** 2))
            return f_ass + f_rec + 0.1  # eps added TWICE (:86,101)

    def make_indexed_fit():
        c = {"n": 0}

        def fit(pos):
            n = c["n"]
            c["n"] += 1
            return fitness_torch(pos, n)

        return fit

    # fitness parity at the seeded positions
    vals0 = np.asarray(fit_jit(state.positions))
    ref0 = np.array([fitness_torch(p, n) for n, p in enumerate(pos0)], np.float32)
    np.testing.assert_allclose(vals0, ref0, rtol=5e-3, atol=2e-3)

    rng_r = np.random.RandomState(22)
    for it in range(1, 5):
        r1 = rng_r.rand(N_PARTICLES).astype(np.float32)
        r2 = rng_r.rand(N_PARTICLES).astype(np.float32)
        vals = fit_jit(state.positions)
        state = pso_iteration(state, vals, jnp.array(r1), jnp.array(r2), hp)
        ref.step(make_indexed_fit(), r1, r2)
        np.testing.assert_allclose(
            np.asarray(state.positions), ref.pos, rtol=5e-3, atol=5e-3,
            err_msg=f"inverter positions diverged at iteration {it}",
        )
        np.testing.assert_allclose(
            float(state.g_best_val), ref.g_best_val[-1], rtol=5e-3, atol=2e-3,
        )
