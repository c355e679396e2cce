"""gan_discovery_pso_tpu — TPU-native GAN latent-space discovery via PSO.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ltronchin/Gan-discovery-PSO (reference layout: src/pso, src/training,
src/inverter, src/evaluation, src/utils). Nothing here is a port: the
reference's object-per-particle swarm, batch-1 fitness loop, and host-side
update math (reference src/pso/util_pso.py:24-193) collapse into tensorized,
jitted device programs; models are functional flax modules; parallelism is
a jax.sharding Mesh over the swarm/batch axes instead of the reference's
single-device loops.

Subpackages
-----------
core        config tree, PRNG plumbing, run dirs, checkpointing, logging
ops         torch-semantics conv/norm/pool primitives, rescale, sqrtm, knn
ops.pallas  hand-written TPU kernels for the PSO hot path
models      DCGAN G/D, encoder inverter, CAE, ResNet/AlexNet assessors, VQ-VAE
pso         tensorized swarm state + fused optimize loop + fitness library
train       jitted train steps + epoch drivers for every pipeline stage
evaluation  FID / IS / KNN-battery / denoise-recon metrics, on device
data        MNIST + CLARO CT pipelines as device-resident arrays
analysis    PCA/UMAP/clustering/Voronoi latent analyses (host-side)
parallel    device mesh setup + sharded-swarm / data-parallel helpers
cli         one entry point with a subcommand per reference stage
"""

__version__ = "0.1.0"

# An explicit JAX_PLATFORMS=cpu env var does NOT pin CPU on hosts with a
# TPU plugin installed (the plugin's registration outranks the plain env
# override, and the process then contends for the TPU — hanging forever if
# the device link is down). Honor the user's explicit intent with a config
# update before any backend initializes; the config path is authoritative
# where the env var is not. Lives in the top-level __init__ so EVERY import
# path through the package gets it first.
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - config may be frozen post-init
        pass
del _os
