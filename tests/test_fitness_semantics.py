"""Fitness objective semantics (reference src/pso/util_discovery.py:52-101):
threshold clamp, eps placement (incl. the inverter's double eps), in/out
switch, per-particle reconstruction term, binary-vs-multiclass column."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.models import (
    GeneratorDef,
    ResNetDef,
    generator_init,
    resnet_init,
)
from gan_discovery_pso_tpu.models.dcgan import generator_forward
from gan_discovery_pso_tpu.pso import (
    OPTIMIZE_IN,
    OPTIMIZE_OUT,
    assessor_posterior,
    fitness_from_posterior,
    make_discovery_fitness,
    make_discovery_fitness_dynamic,
    make_inverter_fitness,
)


def test_fitness_from_posterior_objectives():
    p = jnp.array([0.0, 0.5, 0.95, 1.0])
    # optimize_in: min(p + thr, 1) + eps
    got_in = np.asarray(fitness_from_posterior(p, OPTIMIZE_IN, threshold=0.1, eps=0.1))
    np.testing.assert_allclose(got_in, [0.2, 0.7, 1.1, 1.1], rtol=1e-6)
    # optimize_out: 1 - min(p + thr, 1) + eps
    got_out = np.asarray(fitness_from_posterior(p, OPTIMIZE_OUT, threshold=0.1, eps=0.1))
    np.testing.assert_allclose(got_out, [1.0, 0.5, 0.1, 0.1], rtol=1e-6)
    with pytest.raises(ValueError):
        fitness_from_posterior(p, "bogus")


def test_assessor_posterior_column_selection():
    # multiclass: class_to_idx column; binary: column 1
    logits_mc = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
    p_mc = assessor_posterior(logits_mc, 3)
    want = np.asarray(jax.nn.softmax(logits_mc, axis=1))[:, 3]
    np.testing.assert_allclose(np.asarray(p_mc), want, rtol=1e-6)

    logits_bin = jnp.asarray(np.random.RandomState(1).randn(4, 2), jnp.float32)
    p_bin = assessor_posterior(logits_bin, 0)  # class_idx ignored for binary
    want = np.asarray(jax.nn.softmax(logits_bin, axis=1))[:, 1]
    np.testing.assert_allclose(np.asarray(p_bin), want, rtol=1e-6)


@pytest.fixture(scope="module")
def small_models():
    gp, gs = generator_init(jax.random.key(0), GeneratorDef(z_dim=8, features_g=8))
    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    rp, rs = resnet_init(jax.random.key(1), rdef, init="glorot_normal")
    return gp, gs, rp, rs, rdef


def test_discovery_fitness_range_and_dynamic_equivalence(small_models):
    gp, gs, rp, rs, rdef = small_models
    pos = jnp.asarray(np.random.RandomState(2).randn(8, 8), jnp.float32)

    fit = make_discovery_fitness(gp, gs, rp, rs, rdef, class_idx=2)
    vals = np.asarray(fit(pos))
    # optimize_out w/ eps=0.1: fitness ∈ [0.1, 1.1]
    assert vals.min() >= 0.1 - 1e-6 and vals.max() <= 1.1 + 1e-6

    fit_dyn = make_discovery_fitness_dynamic(gp, gs, rp, rs, rdef)
    vals_dyn = np.asarray(fit_dyn(pos, jnp.asarray(2)))
    np.testing.assert_allclose(vals, vals_dyn, rtol=1e-6)


def test_inverter_fitness_double_eps_and_rec_term(small_models):
    gp, gs, rp, rs, rdef = small_models
    pos = jnp.asarray(np.random.RandomState(3).randn(4, 8), jnp.float32)
    src = jnp.asarray(np.random.RandomState(4).rand(4, 1, 28, 28) * 2 - 1, jnp.float32)

    base = make_discovery_fitness(gp, gs, rp, rs, rdef, class_idx=2, control=OPTIMIZE_IN)
    fit = make_inverter_fitness(gp, gs, rp, rs, rdef, src, class_idx=2,
                                control=OPTIMIZE_IN, w_ass=1.0, w_rec=1.0)

    # manual: base(+eps already) + per-particle MSE(src, raw G out) + eps
    z = pos.reshape(4, 8, 1, 1)
    img = generator_forward(gp, gs, z)
    rec = np.mean((np.asarray(src) - np.asarray(img)) ** 2, axis=(1, 2, 3))
    want = np.asarray(base(pos)) + rec + 0.1
    np.testing.assert_allclose(np.asarray(fit(pos)), want, rtol=1e-5)


def test_bf16_fitness_close_to_fp32(small_models):
    gp, gs, rp, rs, rdef = small_models
    pos = jnp.asarray(np.random.RandomState(5).randn(16, 8), jnp.float32)
    f32 = np.asarray(make_discovery_fitness(gp, gs, rp, rs, rdef, class_idx=2)(pos))
    from gan_discovery_pso_tpu.ops.precision import fast_math

    with fast_math():
        f16 = np.asarray(
            jax.jit(make_discovery_fitness(gp, gs, rp, rs, rdef, class_idx=2,
                                           dtype=jnp.bfloat16))(pos)
        )
    # bf16 forwards shift posteriors slightly; the objective must stay close
    np.testing.assert_allclose(f16, f32, atol=0.05)


def test_discovery_fitness_with_alexnet_assessor():
    """The reference's get_cnn factory (util_cnn.py:24-38) can hand any
    entry an AlexNet assessor; the fitness body must dispatch on the def
    type, not assume ResNet."""
    from gan_discovery_pso_tpu.core.config import PsoConfig
    from gan_discovery_pso_tpu.models import AlexNetDef, alexnet_init
    from gan_discovery_pso_tpu.pso import apply_discovery_fitness, optimize

    key = jax.random.key(7)
    kg, ka, kp = jax.random.split(key, 3)
    gdef = GeneratorDef(z_dim=6, features_g=8)
    gp, gs = generator_init(kg, gdef)
    adef = AlexNetDef(image_channels=1, n_class=8, img_size=28, padding=1,
                      iid_classes=(0, 2, 3, 4, 6, 7, 8, 9))
    ap, as_ = alexnet_init(ka, adef)

    pos = jax.random.normal(kp, (5, 6), jnp.float32)
    vals = apply_discovery_fitness(pos, gp, gs, ap, as_, adef, class_idx=2)
    assert vals.shape == (5,)
    assert np.isfinite(np.asarray(vals)).all()
    # OPTIMIZE_OUT objective range: 1 - min(p+thr,1) + eps in (eps, 1+eps]
    assert (np.asarray(vals) > 0.1 - 1e-6).all()
    assert (np.asarray(vals) <= 1.1 + 1e-6).all()

    # and the fused optimize runs end-to-end on it
    hp = PsoConfig(n_iterations=3, n_particles=5, dim_space=6)
    final, hist, init = jax.jit(
        lambda k: optimize(
            k,
            lambda p: apply_discovery_fitness(p, gp, gs, ap, as_, adef, 2),
            hp,
        )
    )(key)
    assert np.isfinite(float(final.g_best_val))
