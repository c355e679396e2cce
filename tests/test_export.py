"""AOT serving-artifact export (compat/export.py, `export-model` CLI).

The artifact must be self-contained: loading it back and calling it must
reproduce the live jitted forward bit-for-bit without touching the model
code path again."""

import numpy as np

import jax
import jax.numpy as jnp

from gan_discovery_pso_tpu.compat.export import (
    export_discovery_fitness,
    export_generator,
    load_exported,
)
from gan_discovery_pso_tpu.models import (
    GeneratorDef,
    ResNetDef,
    generator_init,
    resnet_init,
)
from gan_discovery_pso_tpu.models.dcgan import generator_forward
from gan_discovery_pso_tpu.pso import apply_discovery_fitness


def test_generator_export_roundtrip(tmp_path):
    key = jax.random.key(3)
    gp, gs = generator_init(key, GeneratorDef(z_dim=8, features_g=8))
    p = export_generator(gp, gs, z_dim=8, batch=4, path=tmp_path / "g.shlo")
    assert p.exists() and p.stat().st_size > 0

    g = load_exported(p)
    z = jax.random.normal(jax.random.key(5), (4, 8, 1, 1), jnp.float32)
    got = np.asarray(g.call(z))
    want = np.asarray(generator_forward(gp, gs, z))
    np.testing.assert_array_equal(got, want)


def test_fitness_export_roundtrip(tmp_path):
    kg, kr, kp = jax.random.split(jax.random.key(9), 3)
    gp, gs = generator_init(kg, GeneratorDef(z_dim=8, features_g=8))
    rdef = ResNetDef("ResNet50", 1, 8, (0, 2, 3, 4, 6, 7, 8, 9))
    rp, rs = resnet_init(kr, rdef, init="glorot_normal")

    p = export_discovery_fitness(
        gp, gs, rp, rs, rdef, class_idx=2, dim_space=8, batch=4,
        path=tmp_path / "fit.shlo",
    )
    fit = load_exported(p)
    pos = jax.random.normal(kp, (4, 8), jnp.float32)
    got = np.asarray(fit.call(pos))
    want = np.asarray(apply_discovery_fitness(
        pos, gp, gs, rp, rs, rdef, jnp.asarray(2, jnp.int32)))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (4,)


def test_cross_platform_export_from_cpu(tmp_path):
    """platforms=('tpu','cpu') lowers for BOTH backends from a CPU-only
    process (no TPU needed at export time) and still runs on CPU."""
    key = jax.random.key(11)
    gp, gs = generator_init(key, GeneratorDef(z_dim=8, features_g=8))
    p = export_generator(gp, gs, z_dim=8, batch=4, path=tmp_path / "g.shlo",
                         platforms=("tpu", "cpu"))
    g = load_exported(p)
    assert tuple(g.platforms) == ("tpu", "cpu")
    z = jax.random.normal(jax.random.key(2), (4, 8, 1, 1), jnp.float32)
    # multi-platform lowering goes through platform-dispatch stablehlo and
    # may fold constants differently — close, not bitwise-equal like the
    # single-platform artifact
    np.testing.assert_allclose(
        np.asarray(g.call(z)), np.asarray(generator_forward(gp, gs, z)),
        rtol=1e-5, atol=1e-6)
