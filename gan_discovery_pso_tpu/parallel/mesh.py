"""Device mesh setup — the framework's distributed backbone.

The reference has NO distributed execution (single cuda:0 worker,
reference src/training/pso_discovery.py:152; parallelism = sequential bash
sweeps, src/bash/start.sh:13-36). The TPU-native design (SURVEY.md §5.8)
scales along two axes:

- "swarm": particles of one swarm sharded across chips; the global-best
  reduction each iteration is the only collective (a few KB, rides ICI);
- "data": eval/train batch data parallelism with replicated params.

Multi-swarm (per-class / per-patient, never communicating) maps to either
independent processes or a leading vmapped axis sharded over "swarm".
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "swarm") -> Mesh:
    """1-D mesh over the first n visible devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(shape: tuple[int, int], axis_names=("data", "swarm")) -> Mesh:
    devs = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, axis_names)


def shard_leading(mesh: Mesh, axis_name: str) -> NamedSharding:
    """Shard dim 0 over `axis_name`, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def distributed_initialize_if_needed() -> None:
    """Multi-host entry hook: call before building meshes on a multi-host
    pod slice. No-op in single-process settings (this dev/test image)."""
    if jax.process_count() > 1:  # pragma: no cover - multi-host only
        return  # already initialized by the launcher
