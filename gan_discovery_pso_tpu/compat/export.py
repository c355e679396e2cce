"""AOT model export for serving: self-contained StableHLO artifacts.

The reference deploys nothing — its "serving" is loading a pickled
checkpoint into a fresh PyTorch process (reference src/utils/util_dcgan.py:
29-34). The TPU-native deployment unit is different: `jax.export` lowers a
jitted function (weights baked in as constants) to a versioned, serialized
StableHLO artifact that any JAX process can load and run WITHOUT this
package, its model code, or the original checkpoint files — the natural
hand-off format for a serving fleet.

Artifacts:
- generator: z [N, z_dim, 1, 1] f32 -> images [N, C, 28, 28] (tanh range)
- fitness:   positions [N, d] f32 -> fitness values [N] (the full
  G -> rescale -> assessor -> objective chain of pso/fitness.py)

`platforms=` controls cross-platform lowering: export on a CPU dev box
with platforms=("tpu", "cpu") and the artifact runs on both. Default is
the exporting process's backend only.

Round-trip:

    export_generator(gp, gs, z_dim=100, batch=32, path="g.shlo")
    g = load_exported("g.shlo")
    imgs = g.call(z)             # any process, any matching platform
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_callable(fn, example_specs, path: str | Path, platforms=None) -> Path:
    """Serialize jit(fn) lowered at `example_specs` (ShapeDtypeStructs) to
    `path`. Weights referenced via closure are baked into the artifact."""
    exp = jax_export.export(jax.jit(fn), platforms=platforms)(*example_specs)
    path = Path(path)
    path.write_bytes(exp.serialize())
    return path


def load_exported(path: str | Path):
    """Deserialize an exported artifact; run it with `.call(*args)`."""
    return jax_export.deserialize(Path(path).read_bytes())


def export_generator(
    gen_params, gen_state, z_dim: int, batch: int, path: str | Path,
    platforms=None,
) -> Path:
    """Self-contained generator sampler artifact (weights baked in)."""
    from gan_discovery_pso_tpu.models.dcgan import generator_forward

    spec = jax.ShapeDtypeStruct((batch, z_dim, 1, 1), jnp.float32)
    return export_callable(
        lambda z: generator_forward(gen_params, gen_state, z),
        (spec,), path, platforms=platforms,
    )


def export_discovery_fitness(
    gen_params, gen_state, cnn_params, cnn_state, cnn_def,
    class_idx: int, dim_space: int, batch: int, path: str | Path,
    control: str = "optimize_out_training", threshold: float = 0.0,
    eps: float = 0.1, platforms=None,
) -> Path:
    """The full fitness chain (G forward -> per-sample rescale -> assessor
    posterior -> objective) as one artifact — a serving endpoint can score
    latent vectors without any model code."""
    from gan_discovery_pso_tpu.pso.fitness import apply_discovery_fitness

    spec = jax.ShapeDtypeStruct((batch, dim_space), jnp.float32)
    return export_callable(
        lambda pos: apply_discovery_fitness(
            pos, gen_params, gen_state, cnn_params, cnn_state, cnn_def,
            jnp.asarray(class_idx, jnp.int32), control=control,
            threshold=threshold, eps=eps,
        ),
        (spec,), path, platforms=platforms,
    )
